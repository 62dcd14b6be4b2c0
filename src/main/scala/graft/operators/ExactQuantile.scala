package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (the `quantile_cont` contract) as a
  * two-pass histogram walk, replacing the built-in `percentile`
  * aggregate on the hot path.
  *
  * `percentile` buffers every (distinct value → count) of a group in
  * ONE aggregation buffer — a memory hazard on giant groups when the
  * value column is near-unique (l_extendedprice: the buffer IS the
  * group). Here the same exact result comes from shuffle-safe pieces:
  *
  *   1. histogram: groupBy (key, value) count — map-side combinable,
  *      shuffle carries at most |distinct values| rows;
  *   2. CDF: cumulative count over a per-key window ORDERED BY value —
  *      a spillable SORT, not a buffer, so a near-unique column sorts
  *      through disk instead of filling one task's heap;
  *   3. pick: the rows whose rank interval brackets p*(n-1), linearly
  *      interpolated in doubles as `lo*(1-frac) + hi*frac` — DuckDB's
  *      quantile_cont operation order, so results are bit-identical to
  *      the oracle. (Spark's builtin percentile computes
  *      `lo + (hi-lo)*frac`, which can differ in the final ulp — e.g.
  *      lo=93277.08, hi=93315.21, frac=0.10000000000013642 gives
  *      ...89300000001 additive vs ...893 lerp; the builtin agrees to
  *      1e-12 relative but not always bit-for-bit.)
  *
  * Stays exact at any scale; the cost model is a sort per key (Spark
  * windows spill) versus the built-in's O(distinct) driver-side-ish
  * buffer per group. */
object ExactQuantile {

  /** One quantile per `keyCol` group: `p`-quantile of `valCol`,
    * continuous interpolation. Output: keyCol, <outName>. NULL values
    * are ignored (the percentile contract); a group whose values are
    * ALL null still appears, with a null quantile. */
  def groupQuantile(df: DataFrame, keyCol: String, valCol: String,
      p: Double, outName: String): DataFrame = {
    val hist = df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol), col(valCol).cast("double").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
    // ranks covered by this value: [_hi - _c, _hi) in 0-based order
    val cdf = hist
      .withColumn("_hi", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col(keyCol))))
      .withColumn("_r", lit(p) * (col("_n") - 1).cast("double"))
      .withColumn("_lo_rank", floor(col("_r")).cast("long"))
      .withColumn("_hi_rank", ceil(col("_r")).cast("long"))
    // one pass picks BOTH bracketing values (at most 2 rows per key
    // survive the filter) — separate vLo/vHi branches would re-scan the
    // input and rebuild the histogram+window once per bound
    def covers(rank: Column) =
      col("_hi") - col("_c") <= rank && rank < col("_hi")
    val picked = cdf.filter(covers(col("_lo_rank")) || covers(col("_hi_rank")))
      .groupBy(col(keyCol))
      .agg(max(when(covers(col("_lo_rank")), col("_v"))).as("_vlo"),
        max(when(covers(col("_hi_rank")), col("_v"))).as("_vhi"),
        first(col("_r")).as("_r"))
      .select(col(keyCol), {
        val frac = col("_r") - floor(col("_r"))
        (col("_vlo") * (lit(1.0) - frac) + col("_vhi") * frac).as(outName)
      })
    // all-null groups have no histogram rows; left-join from the key
    // set so they surface with a null quantile, exactly as percentile
    // emits them (and so groupQuantiles' join cannot drop the group)
    df.select(col(keyCol)).distinct().join(picked, Seq(keyCol), "left")
  }

  /** Several (valCol, p) quantiles per key in one result row, joined on
    * the key — each quantile is its own two-pass pipeline (different
    * value columns sort independently anyway). */
  def groupQuantiles(df: DataFrame, keyCol: String,
      specs: Seq[(String, Double, String)]): DataFrame =
    specs.map { case (valCol, p, outName) =>
      groupQuantile(df, keyCol, valCol, p, outName)
    }.reduce(_.join(_, keyCol))
}
