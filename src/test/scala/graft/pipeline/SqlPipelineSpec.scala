package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Config-driven pipeline: yaml + Spark-SQL templates run end-to-end
  * with no compiled pipeline code — the reference's `pipeline <url>` UX
  * (cmd/pipeline/pipeline.go:43-159). */
class SqlPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("sql-pipeline-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val exampleDir = {
    val local = new java.io.File("examples/ethereum_blocks_spark")
    if (local.isDirectory) local.getPath else "/root/repo/examples/ethereum_blocks_spark"
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sqlpipe-$name")
      .resolve("sink").toString

  test("ethereum_blocks example runs end-to-end from config") {
    graft.functions.EvmFunctions.registerAll(spark)
    graft.functions.HexExpressions.registerAll(spark)
    val sinkPath = tmp("blocks")
    val vars = Map(
      "RPC_ENDPOINT" -> "fake://chain?tip=20",
      "SINK_PATH" -> sinkPath)
    val res = SqlPipeline.run(spark, exampleDir, vars,
      c => c.copy(maxBatchSize = 7, workers = 2))
    assert(res.items == 21)

    val got = SinkTable(sinkPath, Seq("number"), Some("timestamp")).read(spark)
    assert(got.count() == 21)

    // column-level parity with the hand-built Scala pipeline: the
    // config-driven SQL path and the DataFrame path must agree exactly
    val expected = EthereumPipelines.blocksTransform(spark,
      PipelineRunner.Batch(0, 0, 20), "fake://chain?tip=20")
    val cols = expected.columns.map(col).toSeq
    assert(got.select(cols: _*).exceptAll(expected).isEmpty)
    assert(expected.exceptAll(got.select(cols: _*)).isEmpty)

    // resume: a second run finds max(number)+1 > tip and does nothing
    val res2 = SqlPipeline.run(spark, exampleDir, vars)
    assert(res2.items == 0)
  }

  test("derived pipeline (decoded logs) runs from config over a source sink") {
    graft.functions.EvmFunctions.registerAll(spark)
    graft.functions.HexExpressions.registerAll(spark)
    // upstream logs sink via the compiled pipeline
    val logsPath = tmp("dl-logs")
    PipelineRunner.run(spark,
      EthereumPipelines.logs("fake://chain?tip=20", logsPath),
      PipelineRunner.Config(maxBatchSize = 21))
    val dir = {
      val local = new java.io.File("examples/ethereum_decoded_logs_spark")
      if (local.isDirectory) local.getPath
      else "/root/repo/examples/ethereum_decoded_logs_spark"
    }
    val sinkPath = tmp("dl-decoded")
    val res = SqlPipeline.run(spark, dir, Map(
      "SOURCE_PATH" -> logsPath,
      "SINK_PATH" -> sinkPath,
      "EVENT_SIGS" -> "'event Transfer(address indexed,address indexed,uint256)'"))
    assert(res.items == 21)
    val decoded = SinkTable(sinkPath,
      Seq("address", "signature", "block_number", "log_index")).read(spark)
    // one Transfer log per fake tx, all decode against the candidate sig
    val expected = (0L to 20L).map(_ % 3).sum
    assert(decoded.count() == expected)
    assert(decoded.filter(col("signature") =!=
      "Transfer(address,address,uint256)").count() == 0)
    assert(decoded.filter(get_json_object(col("inputs"), "$.arg2").isNull)
      .count() == 0)
  }

  test("sink spec falls back to SINK_* vars when yaml has no Sink section") {
    val spec = SqlPipeline.sinkSpec("Batcher:\n  MaxBatchSize: 5\n",
      Map("SINK_PATH" -> "/tmp/x", "SINK_KEYS" -> "a, b", "SINK_VERSION" -> "ts"))
    assert(spec.path == "/tmp/x")
    assert(spec.keys == Seq("a", "b"))
    assert(spec.version.contains("ts"))
  }
}
