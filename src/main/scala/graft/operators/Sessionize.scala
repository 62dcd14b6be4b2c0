package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stateful sessionization over an event stream: group events by key,
  * split into sessions at inactivity gaps. The per-key state walk is the
  * same logic a streaming `flatMapGroupsWithState` keeps in its state
  * store; in batch it runs as one sorted pass per key after a single
  * shuffle on the key.
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  case class Session(user_id: Long, session_seq: Long, n_events: Long,
      start_s: Long, end_s: Long, total_value: Double)

  /** Batch sessionization: shuffle once on user_id, sort each group by
    * (ts, event_id), emit one row per session. Deterministic tie-break by
    * event_id. gapSeconds is the inactivity timeout. */
  def sessions(events: DataFrame, gapSeconds: Long)
      (implicit s: SparkSession): Dataset[Session] = {
    import s.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toIndexedSeq.sortBy(e => (e.tsMicros, e.event_id))
        val out = Seq.newBuilder[Session]
        var seq = 0L
        var n = 0L
        var startUs = 0L
        var lastUs = 0L
        var totalCents = 0L // exact 2-decimal accumulation → order-free
        def flush(): Unit = if (n > 0) {
          out += Session(uid, seq, n, startUs / 1000000, lastUs / 1000000,
            totalCents / 100.0)
        }
        sorted.foreach { e =>
          if (n == 0 || e.tsMicros - lastUs > gapSeconds * 1000000) {
            flush()
            if (n > 0) seq += 1
            n = 0; startUs = e.tsMicros; totalCents = 0L
          }
          n += 1
          lastUs = e.tsMicros
          totalCents += math.round(e.value * 100)
        }
        flush()
        out.result().iterator
      }
  }
}
