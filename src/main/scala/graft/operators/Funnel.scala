package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** windowFunnel-style funnel analysis (the ClickHouse analytics
  * operator a user of the reference's backing engine reaches for):
  * per user, the deepest funnel prefix k such that a strictly
  * time-increasing chain of events typed step1 < step2 < ... < stepk
  * EXISTS with the level-k event within `windowMicros` of the chain's
  * FIRST event.
  *
  * Exists-chain semantics, deliberately: it is order-free and
  * tie-break-free (either such a chain exists or it does not), so a
  * SQL oracle can replay it with plain EXISTS joins, where
  * ClickHouse's greedy cursor semantics depend on scan order for
  * equal timestamps.
  *
  * Shape at scale: one shuffle on the user key, then a single sorted
  * pass per user (the `Sessionize` shape) running an O(n·k) dominance
  * DP — for each level the latest chain-start time seen so far; a
  * later start always dominates (more window slack), so one Long per
  * level is complete state. Equal-timestamp events update against the
  * pre-group snapshot, which enforces the strict-ordering rule without
  * any tie-break. Never a self-join: the oracle's EXISTS-join form is
  * exponential in the step count, the kernel is linear. */
object Funnel {

  case class FunnelLevel(user_id: Long, funnel_level: Int)

  /** ClickHouse-style retention: per user, flag i is true iff the
    * ANCHOR condition (head) matched some event AND condition i matched
    * some event — no time ordering, by that function's contract (the
    * time-ordered form is `windowFunnel`). One map-side-combinable
    * aggregation; output columns r1..rN. */
  def retention(events: DataFrame, userCol: String, typeCol: String,
      conds: Seq[String]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(col(typeCol) === c, 1).otherwise(0)).as(s"_m$i")
    }
    events.groupBy(col(userCol).as("user_id"))
      .agg(flags.head, flags.tail: _*)
      .select(col("user_id") +: conds.indices.map { i =>
        (if (i == 0) col("_m0") === 1
         else col("_m0") === 1 && col(s"_m$i") === 1).as(s"r${i + 1}")
      }: _*)
  }

  case class SeqState(user_id: Long, seq_matched: Boolean, seq_count: Int)

  /** sequenceMatch + sequenceCount (the ClickHouse behavioral pair next
    * to windowFunnel/retention; pattern shape '(?1).*(?2).*(?3)'): per
    * user, whether a strictly time-increasing chain typed
    * steps(0)..steps(k-1) exists, and how many such chains a single
    * forward cursor packs — CH sequenceCount's sequential
    * non-overlapping contract; greedy earliest-advance is maximal for
    * subsequence patterns by the classic exchange argument, so the
    * result is scan-order-free.
    *
    * Tie groups: a chain takes at most one event per distinct timestamp
    * (strict-< rule), so the cursor advances at most one level per ts
    * group — the same snapshot rule as windowFunnel, which lets a SQL
    * oracle replay the cursor exactly by lazy-regex matching over a
    * string of per-timestamp step bitmask characters.
    *
    * Shape at scale: one shuffle on the user key + one sorted pass per
    * user; cursor state is two ints (level, count). */
  def sequenceMatchCount(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String])
      (implicit s: SparkSession): Dataset[SeqState] = {
    import s.implicits._
    require(steps.nonEmpty, "sequenceMatchCount needs at least one step")
    val k = steps.length
    events
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)), col(typeCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(_._2)
        var lvl = 0
        var cnt = 0
        var i = 0
        while (i < evs.length) {
          var g = i
          while (g < evs.length && evs(g)._2 == evs(i)._2) g += 1
          var hit = false
          var x = i
          while (x < g && !hit) {
            if (evs(x)._3 == steps(lvl)) hit = true
            x += 1
          }
          if (hit) {
            lvl += 1
            if (lvl == k) { cnt += 1; lvl = 0 }
          }
          i = g
        }
        SeqState(uid, cnt > 0, cnt)
      }
  }

  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowMicros: Long)
      (implicit s: SparkSession): Dataset[FunnelLevel] = {
    import s.implicits._
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val k = steps.length
    events
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)), col(typeCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(_._2)
        // best(j) = max start-ts over valid chains reaching level j
        val best = Array.fill[Long](k + 1)(Long.MinValue)
        var i = 0
        while (i < evs.length) {
          var g = i
          while (g < evs.length && evs(g)._2 == evs(i)._2) g += 1
          // snapshot: chains visible to this ts group were all built
          // from strictly earlier events — the strict-< chain rule
          val snap = best.clone()
          var x = i
          while (x < g) {
            val ts = evs(x)._2
            val tpe = evs(x)._3
            var lvl = k
            while (lvl >= 1) {
              if (tpe == steps(lvl - 1)) {
                if (lvl == 1) {
                  if (ts > best(1)) best(1) = ts
                } else if (snap(lvl - 1) != Long.MinValue &&
                    ts - snap(lvl - 1) <= windowMicros) {
                  if (snap(lvl - 1) > best(lvl)) best(lvl) = snap(lvl - 1)
                }
              }
              lvl -= 1
            }
            x += 1
          }
          i = g
        }
        var lvl = k
        while (lvl >= 1 && best(lvl) == Long.MinValue) lvl -= 1
        FunnelLevel(uid, lvl)
      }
  }
}
