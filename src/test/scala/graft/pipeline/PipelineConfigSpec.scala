package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Parses the REAL reference pipeline.yaml files (read-only fixtures). */
class PipelineConfigSpec extends AnyFunSuite {

  private val refDir = "/root/reference/examples"

  test("parses ethereum_blocks pipeline.yaml") {
    val c = PipelineConfig.load(s"$refDir/ethereum_blocks/pipeline.yaml")
    assert(c.maxBatchSize == 100)
    assert(c.tipPollIntervalMs == 60000)
    assert(c.setupFiles == Seq("create_remote_table.sql"))
    assert(c.fetchWorkers == 2)
    assert(c.hasSequencer)
    assert(c.steps.length == 3)
    assert(c.steps.last == PipelineConfig.Stage(
      Seq("write_to_sink.sql", "delete_buffer.sql"), 1))
    assert(c.settings("max_execution_time") == "300")
    val rc = c.toRunnerConfig
    assert(rc.maxBatchSize == 100 && rc.workers == 2)
  }

  test("parses the derived decoded_logs yaml (1000-block batches, 1h poll)") {
    val c = PipelineConfig.load(s"$refDir/ethereum_decoded_logs/pipeline.yaml")
    assert(c.maxBatchSize == 1000)
    assert(c.tipPollIntervalMs == 3600000)
    assert(c.setupFiles.length == 3)
    assert(c.fetchWorkers == 4)
  }

  test("all eight example configs parse") {
    val dirs = new java.io.File(refDir).listFiles().filter(_.isDirectory)
    assert(dirs.length >= 8)
    dirs.foreach { d =>
      val y = new java.io.File(d, "pipeline.yaml")
      if (y.exists()) {
        val c = PipelineConfig.load(y.getPath)
        assert(c.maxBatchSize > 0, d.getName)
        assert(c.steps.nonEmpty, d.getName)
      }
    }
  }

  test("defaults when sections are missing") {
    val c = PipelineConfig.parse("Steps:\n  - Stage:\n      Files: [a.sql]\n")
    assert(c.maxBatchSize == 100)
    assert(c.tipPollIntervalMs == 10000)
    assert(c.fetchWorkers == 1)
    assert(!c.hasSequencer)
  }

  test("duration grammar") {
    assert(PipelineConfig.parseDuration("60s") == 60000)
    assert(PipelineConfig.parseDuration("10m") == 600000)
    assert(PipelineConfig.parseDuration("1h") == 3600000)
    assert(PipelineConfig.parseDuration("250ms") == 250)
  }
  test("AGN_ env vars override batcher/tip config (reference cnf provider)") {
    val c = PipelineConfig.parse("Batcher:\n  MaxBatchSize: 100\n")
    val o = c.withEnvOverrides(Map(
      "AGN_BATCHER_MAXBATCHSIZE" -> "250",
      "AGN_TIPTRACKER_POLLINTERVAL" -> "30s"))
    assert(o.maxBatchSize == 250)
    assert(o.tipPollIntervalMs == 30000)
    // no env -> untouched
    assert(c.withEnvOverrides(Map.empty) == c)
  }

}
