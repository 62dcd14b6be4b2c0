package graft.pipeline

import scala.jdk.CollectionConverters._

/** Parsed pipeline.yaml — the reference's PipelineConfig tree
  * (internal/pipeline/pipeline.go:18-24; yaml shape per
  * examples/ethereum_blocks/pipeline.yaml). Engine.Local settings that
  * are ClickHouse-specific become Spark conf pairs where they have an
  * analog; Bundles are ignored (our UDFs are registered Scala code).
  */
final case class PipelineConfig(
    maxBatchSize: Long,
    tipPollIntervalMs: Long,
    setupFiles: Seq[String],
    steps: Seq[PipelineConfig.Step],
    settings: Map[String, String],
    sparkConf: Map[String, String]) {

  /** Workers of the first Stage step — the fetch-stage concurrency knob
    * the runtime maps onto its batch-overlap pool. */
  def fetchWorkers: Int =
    steps.collectFirst { case s: PipelineConfig.Stage => s.workers }.getOrElse(1)

  def hasSequencer: Boolean =
    steps.exists(_.isInstanceOf[PipelineConfig.Sequencer.type])

  def toRunnerConfig: PipelineRunner.Config =
    PipelineRunner.Config(
      maxBatchSize = maxBatchSize,
      workers = fetchWorkers,
      tipPollIntervalMs = tipPollIntervalMs)

  /** Env-var config overrides, the reference's cnf AGN_ provider
    * (cmd/pipeline/pipeline.go:63-69 `env.NewEnvProvider("AGN")`): a
    * deploy tunes batching without editing the yaml. Names follow the
    * reference struct paths — AGN_BATCHER_MAXBATCHSIZE
    * (internal/pipeline/batcher.go:12), AGN_TIPTRACKER_POLLINTERVAL
    * (internal/pipeline/tip_tracker.go:16, duration syntax). */
  def withEnvOverrides(env: Map[String, String] = sys.env): PipelineConfig =
    copy(
      maxBatchSize = env.get("AGN_BATCHER_MAXBATCHSIZE")
        .map(_.trim.toLong).getOrElse(maxBatchSize),
      tipPollIntervalMs = env.get("AGN_TIPTRACKER_POLLINTERVAL")
        .map(PipelineConfig.parseDuration).getOrElse(tipPollIntervalMs))
}

object PipelineConfig {
  sealed trait Step
  /** `settings` = the reference's per-stage ClickhouseSettings
    * (internal/pipeline/stage.go:66,88-90: applied to every query the
    * stage runs, not to the whole pipeline). Spark-analog keys are
    * mapped; raw spark.* keys pass through. */
  final case class Stage(files: Seq[String], workers: Int,
      settings: Map[String, String] = Map.empty) extends Step {
    def sparkConf: Map[String, String] =
      settings.filter(_._1.startsWith("spark.")) ++ toSparkConf(settings)
  }
  case object Sequencer extends Step

  private val DefaultMaxBatchSize = 100L // internal/pipeline/batcher.go:18
  private val DefaultPollMs = 10000L // internal/pipeline/tip_tracker.go:26
  private val DefaultWorkers = 1 // internal/pipeline/step.go:19-21

  /** "60s" / "10m" / "1h" / bare millis → millis. */
  def parseDuration(s: String): Long = {
    val t = s.trim
    if (t.endsWith("ms")) t.dropRight(2).trim.toLong
    else if (t.endsWith("s")) t.dropRight(1).trim.toLong * 1000
    else if (t.endsWith("m")) t.dropRight(1).trim.toLong * 60000
    else if (t.endsWith("h")) t.dropRight(1).trim.toLong * 3600000
    else t.toLong
  }

  /** ClickHouse settings with a direct Spark conf analog. Spark has no
    * per-query wall-clock kill switch, so `max_execution_time` stays in
    * `settings` for callers to enforce (e.g. a watchdog cancelling the
    * job group — PipelineRunner tags every batch with one). */
  private[pipeline] def toSparkConf(settings: Map[String, String]): Map[String, String] =
    settings.flatMap {
      case ("output_format_parquet_compression_method", v) =>
        Some("spark.sql.parquet.compression.codec" -> v)
      case _ => None
    }

  def parse(yamlText: String): PipelineConfig = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](yamlText)
    val doc = Option(root).map(_.asScala.toMap).getOrElse(Map.empty[String, Any])

    def section(m: Map[String, Any], key: String): Map[String, Any] =
      m.get(key) match {
        case Some(sub: java.util.Map[_, _]) =>
          sub.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
        case _ => Map.empty
      }

    val batcher = section(doc, "Batcher")
    val tip = section(doc, "TipTracker")
    val init = section(doc, "Init")
    val engineSettings = section(section(section(doc, "Engine"), "Local"), "Settings")
      .map { case (k, v) => k -> String.valueOf(v) }

    val setup = init.get("Setup") match {
      case Some(xs: java.util.List[_]) => xs.asScala.map(_.toString).toSeq
      case _ => Nil
    }

    val steps: Seq[Step] = doc.get("Steps") match {
      case Some(xs: java.util.List[_]) =>
        xs.asScala.toSeq.collect { case step: java.util.Map[_, _] =>
          val m = step.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
          if (m.contains("Sequencer")) Sequencer
          else {
            val stage = m.get("Stage") match {
              case Some(sm: java.util.Map[_, _]) =>
                sm.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
              case _ => Map.empty[String, Any]
            }
            val files = stage.get("Files") match {
              case Some(fs: java.util.List[_]) => fs.asScala.map(_.toString).toSeq
              case _ => Nil
            }
            val workers = m.get("Workers").map(w => w.toString.toInt)
              .getOrElse(DefaultWorkers)
            val stageSettings =
              (stage.get("ClickhouseSettings") orElse stage.get("Settings")) match {
                case Some(sm: java.util.Map[_, _]) =>
                  sm.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
                case _ => Map.empty[String, String]
              }
            Stage(files, workers, stageSettings)
          }
        }
      case _ => Nil
    }

    PipelineConfig(
      maxBatchSize = batcher.get("MaxBatchSize").map(_.toString.toLong)
        .getOrElse(DefaultMaxBatchSize),
      tipPollIntervalMs = tip.get("PollInterval").map(v => parseDuration(v.toString))
        .getOrElse(DefaultPollMs),
      setupFiles = setup,
      steps = steps,
      settings = engineSettings,
      sparkConf = toSparkConf(engineSettings))
  }

  def load(path: String): PipelineConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
