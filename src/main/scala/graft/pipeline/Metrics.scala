package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._

/** Execution metrics — the Spark analog of the reference's per-query
  * QueryMetadata {Rows, Bytes, Elapsed} accumulated from progress
  * callbacks (internal/engine/engine.go:15-22,
  * internal/engine/impl/local/conn_pool.go:183-196) and the Finalizer's
  * items/sec log (internal/pipeline/finalizer.go:53-61).
  *
  * A QueryExecutionListener sees every completed action; output rows and
  * scan bytes come from the physical plan's SQL metrics.
  */
object Metrics {

  final case class QueryMetadata(
      action: String,
      outputRows: Long,
      scanBytes: Long,
      elapsedMs: Long)

  final class Listener extends QueryExecutionListener {
    val completed = new ConcurrentLinkedQueue[QueryMetadata]()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      // AQE wraps the real plan in adaptive/stage nodes with no metrics
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case q: QueryStageExec => unwrap(q.plan)
        case other => other
      }
      def firstRows(p: SparkPlan): Long = {
        val u = unwrap(p)
        u.metrics.get("numOutputRows").map(_.value).getOrElse(
          u.children.headOption.map(firstRows).getOrElse(-1L))
      }
      def leaves(p: SparkPlan): Seq[SparkPlan] = {
        val u = unwrap(p)
        if (u.children.isEmpty) Seq(u) else u.children.flatMap(leaves)
      }
      val plan = unwrap(qe.executedPlan)
      val scanBytes = leaves(plan)
        .flatMap(_.metrics.get("filesSize").map(_.value)).sum
      completed.add(QueryMetadata(funcName, firstRows(plan), scanBytes,
        durationNs / 1000000))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      completed.add(QueryMetadata(s"$funcName[failed]", -1, -1, -1))
  }

  private val listeners =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Listener]()

  /** Install (idempotently) and return the session's listener. */
  def register(spark: SparkSession): Listener =
    listeners.computeIfAbsent(spark, s => {
      val l = new Listener
      s.listenerManager.register(l)
      l
    })

  def snapshot(spark: SparkSession): Seq[QueryMetadata] =
    Option(listeners.get(spark)).map(_.completed.asScala.toSeq).getOrElse(Nil)

  /** Finalizer-style throughput summary. */
  def throughput(result: PipelineRunner.Result): String =
    f"${result.batches} batches, ${result.items} items in " +
      f"${result.elapsedSec}%.1fs = ${result.itemsPerSec}%.1f items/s"
}
