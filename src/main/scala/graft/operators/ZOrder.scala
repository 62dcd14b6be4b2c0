package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-column pruning — the
  * `OPTIMIZE ZORDER BY` feature class: interleave the bits of each
  * column's equi-width bin id so that range-partitioning on ONE value
  * clusters rows along EVERY participating column, and parquet
  * row-group min/max stats prune scans on any of them. A single-column
  * sort gives perfect pruning on that column and none on the others;
  * Z-order trades a little of each for usable pruning on all (the spec
  * measures exactly that on per-partition ranges).
  *
  * The bin mapping is deliberately elementary — equi-width over the
  * observed [min,max], `floor((v-min)/(max-min) * (2^bits-1))` in
  * doubles — so an external engine replays the z-values bit-for-bit
  * (the oracle does). The min/max pass is one map-side-combined
  * aggregation collected as 2·|cols| doubles: bounded at any scale. */
object ZOrder {

  /** Append `_z`: the Morton interleave of `bits`-wide bin ids of each
    * column (column i contributes bit b to z-bit `b*n + i`). Columns
    * are cast to double; NULLs bin to 0 (sort first, prune-neutral). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.length * bits <= 62,
      s"${cols.length} cols x $bits bits must fit a long")
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"_mn_$c"),
      max(col(c).cast("double")).as(s"_mx_$c")))
    val allStats = df.agg(aggs.head, aggs.tail: _*).head()
    val n = cols.length
    val top = (1L << bits) - 1
    // bit positions are compile-time, so the interleave unrolls to a
    // flat integer expression (codegen'd, no interpreted HOF)
    val zExpr = cols.zipWithIndex.flatMap { case (c, i) =>
      val mn = allStats.getAs[Double](s"_mn_$c")
      val mx = allStats.getAs[Double](s"_mx_$c")
      val bin: Column =
        if (mx == mn) lit(0L)
        else least(lit(top), greatest(lit(0L),
          floor((col(c).cast("double") - lit(mn)) / (lit(mx) - lit(mn)) * lit(top.toDouble))
            .cast("long")))
      (0 until bits).map(b =>
        shiftleft(shiftrightunsigned(bin, b).bitwiseAND(lit(1L)), b * n + i))
    }.reduce(_ + _)
    df.withColumn("_z", zExpr)
  }

  /** Range-partition + sort by the z-value: the write-side layout step
    * (each output partition covers a contiguous z-range = a small
    * hyper-rectangle set in every participating column). */
  def zorder(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 16): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
}
