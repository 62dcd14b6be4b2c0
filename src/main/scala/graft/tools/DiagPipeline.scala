package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.pipeline.{DerivedPipelines, EthereumPipelines, PipelineRunner, SqlPipeline}
import graft.pipeline.PipelineRunner.{Batch, Config, Definition}

/** Round-17 e-lane split measurement (guide §1: measure first).
  *
  * The e6x config pipelines are the suite's slowest lane (r17
  * concurrent median 3.13 s vs st 2.22 after the overlap work), and
  * the round-18 candidates note says the next win is knowing WHERE a
  * per-batch pipeline's seconds go: plan/render machinery, the
  * transform's materialization, the ordered sink commit, or the
  * resume/tip probes. This tool runs the exact component pipelines of
  * a chosen e-query with (a) a timing decorator around every
  * Definition call and (b) a job listener summing Spark job wall, and
  * prints a per-phase table — so the optimization (if any) targets
  * the measured cost, not the obvious knob.
  *
  * Usage: DiagPipeline [e62|e67|e69] [iters]
  */
object DiagPipeline {

  /** Sums per-call wall seconds of each Definition entry point. */
  final class TimedDefinition(inner: Definition) extends Definition {
    val sums = new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()
    private def rec[T](k: String)(body: => T): T = {
      val t0 = System.nanoTime()
      try body
      finally {
        val dt = (System.nanoTime() - t0) / 1e9
        sums.merge(k, (1L, dt),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    }
    def resume(spark: SparkSession): Option[Long] = rec("resume")(inner.resume(spark))
    def tip(spark: SparkSession): Long = rec("tip")(inner.tip(spark))
    def transform(spark: SparkSession, batch: Batch) =
      rec("transform_plan")(inner.transform(spark, batch))
    def commit(spark: SparkSession, batch: Batch,
        df: org.apache.spark.sql.DataFrame): Unit =
      rec("commit")(inner.commit(spark, batch, df))
    override def transformConf: Map[String, String] = inner.transformConf
    def report(tag: String): Unit = {
      sums.forEach((k, v) =>
        println(f"[diag]   $tag%-10s $k%-15s n=${v._1}%3d  ${v._2}%7.3f s"))
    }
  }

  /** Counts jobs + sums job wall over a window. */
  final class JobClock extends SparkListener {
    val n = new java.util.concurrent.atomic.AtomicLong
    val ms = new java.util.concurrent.atomic.AtomicLong
    private val starts =
      new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      starts.put(j.jobId, j.time)
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val s = starts.remove(Integer.valueOf(j.jobId))
      if (s ne null) { n.incrementAndGet(); ms.addAndGet(j.time - s.longValue) }
    }
    def snapAndReset(tag: String): Unit = {
      println(f"[diag]   $tag%-10s jobs=${n.getAndSet(0)}%4d  job-wall ${ms.getAndSet(0) / 1e3}%7.3f s")
    }
  }

  private def exampleDir(name: String): String = {
    val local = new java.io.File(s"examples/$name")
    if (local.isDirectory) local.getPath else s"/root/repo/examples/$name"
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-diag-$prefix")
      .resolve("sink").toString

  /** SqlPipeline.run with the timing decorator spliced in (same child
    * session + setup-file semantics as SqlPipeline.run). */
  private def runSqlTimed(spark: SparkSession, dir: String,
      vars: Map[String, String], tag: String): Unit = {
    val session = spark.newSession()
    graft.functions.EvmFunctions.registerAll(session)
    graft.functions.HexExpressions.registerAll(session)
    val (yamlText, templates) = SqlPipeline.loadPipeline(dir)
    val config = graft.pipeline.PipelineConfig.parse(yamlText).withEnvOverrides()
    config.sparkConf.foreach { case (k, v) => session.conf.set(k, v) }
    config.setupFiles.foreach { f =>
      templates.get(f).foreach(t =>
        session.sql(graft.pipeline.Templates.render(t, vars)))
    }
    val defn = new TimedDefinition(SqlPipeline.definition(dir, vars))
    PipelineRunner.runWithRetry(session, defn, config.toRunnerConfig)
    defn.report(tag)
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("e69")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.EvmFunctions.registerAll(spark)
    graft.functions.HexExpressions.registerAll(spark)
    val clock = new JobClock
    spark.sparkContext.addSparkListener(clock)

    def phase[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diag] phase $tag%-12s wall ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      clock.snapAndReset(tag)
      r
    }

    (1 to iters).foreach { it =>
      println(s"[diag] ==== $which iter $it ====")
      val t0 = System.nanoTime()
      which match {
        case "e62" =>
          val logsPath = tmp("dl-src")
          phase("ingest") {
            val d = new TimedDefinition(
              EthereumPipelines.logs("fake://chain?tip=20", logsPath))
            PipelineRunner.run(spark, d, Config(maxBatchSize = 21))
            d.report("ingest")
          }
          val path = tmp("drv")
          phase("derived") {
            runSqlTimed(spark, exampleDir("ethereum_decoded_logs_spark"),
              Map("SOURCE_PATH" -> logsPath, "SINK_PATH" -> path,
                "EVENT_SIGS" ->
                  "'event Transfer(address indexed,address indexed,uint256)'"),
              "derived")
          }
        case "e67" =>
          val logsPath = tmp("bal-src")
          phase("ingest") {
            val d = new TimedDefinition(
              EthereumPipelines.logs("fake://chain?tip=20", logsPath))
            PipelineRunner.run(spark, d, Config(maxBatchSize = 21))
            d.report("ingest")
          }
          val path = tmp("bal-out")
          phase("balances") {
            runSqlTimed(spark,
              exampleDir("ethereum_token_erc20_balances_spark"),
              Map("SOURCE_PATH" -> logsPath, "SINK_PATH" -> path,
                "RPC_ENDPOINT" -> "fake://chain?tip=20"), "balances")
          }
        case _ => // e69
          val multi = "fake://chain?tip=20&blocktime=14400"
          val logsPath = tmp("dexp-logs")
          phase("ingest") {
            val d = new TimedDefinition(EthereumPipelines.logs(multi, logsPath))
            PipelineRunner.run(spark, d, Config(maxBatchSize = 21))
            d.report("ingest")
          }
          val decodedPath = tmp("dexp-dec")
          phase("decode") {
            val d = new TimedDefinition(DerivedPipelines.decodedLogs(
              logsPath, decodedPath, DerivedPipelines.AbiDictionary.builtin))
            PipelineRunner.run(spark, d, Config(maxBatchSize = 21))
            d.report("decode")
          }
          val targetPath = tmp("dexp-out")
          phase("export") {
            runSqlTimed(spark,
              exampleDir("decoded_logs_to_daily_parquet_file_spark"),
              Map("SOURCE_PATH" -> decodedPath, "TARGET_PATH" -> targetPath),
              "export")
          }
          phase("readback") {
            spark.read.parquet(targetPath)
              .write.format("noop").mode("overwrite").save()
          }
      }
      println(f"[diag] ==== $which iter $it total ${(System.nanoTime() - t0) / 1e9}%7.3f s ====")
    }
    spark.stop()
  }
}
