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
    // null values stay in the histogram as a (key, null) row with
    // _c = 0 (count of a null cast is 0): they contribute nothing to
    // the CDF but keep every group present, so all-null groups need no
    // separate key-set scan + join to surface (that second scan and its
    // distinct exchange were a quarter of the query at sf0.1)
    val hist = df
      .groupBy(col(keyCol), col(valCol).cast("double").as("_v"))
      .agg(count(col(valCol).cast("double")).as("_c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
    // same partition+order spec as `w`, whole-partition frame: Catalyst
    // plans both sums in ONE WindowExec (one exchange, one sort) — a
    // bare Window.partitionBy(key) for _n would add a second exchange
    // and sort of the same data for the same total
    val wTot = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ranks covered by this value: [_hi - _c, _hi) in 0-based order
    // (null _v rows sort first with _c = 0, so _hi is unaffected)
    val cdf = hist
      .withColumn("_hi", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wTot))
      .withColumn("_r", lit(p) * (col("_n") - 1).cast("double"))
      .withColumn("_lo_rank", floor(col("_r")).cast("long"))
      .withColumn("_hi_rank", ceil(col("_r")).cast("long"))
    // one pass picks BOTH bracketing values (at most 2 rows per key
    // survive the filter) — separate vLo/vHi branches would re-scan the
    // input and rebuild the histogram+window once per bound. _n = 0
    // keeps all-null groups alive; their when() arms never fire, so
    // they emit the null quantile percentile's contract requires.
    def covers(rank: Column) =
      col("_hi") - col("_c") <= rank && rank < col("_hi")
    cdf.filter(covers(col("_lo_rank")) || covers(col("_hi_rank")) || col("_n") === 0)
      .groupBy(col(keyCol))
      .agg(max(when(covers(col("_lo_rank")), col("_v"))).as("_vlo"),
        max(when(covers(col("_hi_rank")), col("_v"))).as("_vhi"),
        first(col("_r")).as("_r"))
      .select(col(keyCol), {
        val frac = col("_r") - floor(col("_r"))
        (col("_vlo") * (lit(1.0) - frac) + col("_vhi") * frac).as(outName)
      })
  }

  /** Several (valCol, p) quantiles per key in one result row — FUSED
    * into a single pipeline: one scan explodes each row into
    * (spec, value) pairs, the histogram keys on (spec, key, value), one
    * window pass computes every spec's CDF (specs sort independently
    * because spec is the leading partition key), and one final per-key
    * aggregation lays the specs out as columns. Three exchanges and one
    * scan TOTAL, versus two exchanges and a scan PER SPEC for the
    * naive join of independent pipelines (measured 2x on q35's
    * two-spec shape at sf0.1 — and the scan count is what matters at
    * 100 TB). */
  def groupQuantiles(df: DataFrame, keyCol: String,
      specs: Seq[(String, Double, String)]): DataFrame = {
    // (spec-index, value) rows: explode never drops a row (the struct
    // is non-null even when the value inside is null), so the null
    // bookkeeping of groupQuantile carries over per spec
    val specArr = array(specs.zipWithIndex.map { case ((vc, _, _), i) =>
      struct(lit(i).as("si"), col(vc).cast("double").as("v")) }: _*)
    val hist = df.select(col(keyCol), explode(specArr).as("sv"))
      .groupBy(col(keyCol), col("sv.si").as("_si"), col("sv.v").as("_v"))
      .agg(count(col("sv.v")).as("_c"))
    val w = Window.partitionBy(col("_si"), col(keyCol)).orderBy(col("_v"))
    val wTot = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pOfSpec = element_at(
      array(specs.map(s => lit(s._2)): _*), col("_si") + 1)
    val cdf = hist
      .withColumn("_hi", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wTot))
      .withColumn("_r", pOfSpec * (col("_n") - 1).cast("double"))
      .withColumn("_lo_rank", floor(col("_r")).cast("long"))
      .withColumn("_hi_rank", ceil(col("_r")).cast("long"))
    def covers(rank: Column) =
      col("_hi") - col("_c") <= rank && rank < col("_hi")
    val perSpec = specs.indices.flatMap { i =>
      def forSpec(c: Column) = when(col("_si") === i, c)
      Seq(max(forSpec(when(covers(col("_lo_rank")), col("_v")))).as(s"_vlo$i"),
        max(forSpec(when(covers(col("_hi_rank")), col("_v")))).as(s"_vhi$i"),
        max(forSpec(col("_r"))).as(s"_r$i"))
    }
    cdf.filter(covers(col("_lo_rank")) || covers(col("_hi_rank")) || col("_n") === 0)
      .groupBy(col(keyCol))
      .agg(perSpec.head, perSpec.tail: _*)
      .select(col(keyCol) +: specs.zipWithIndex.map { case ((_, _, outName), i) =>
        val frac = col(s"_r$i") - floor(col(s"_r$i"))
        (col(s"_vlo$i") * (lit(1.0) - frac) + col(s"_vhi$i") * frac).as(outName)
      }: _*)
  }

  /** Weighted exact quantile per key — the `quantileExactWeighted`
    * contract (ClickHouse): the smallest value whose cumulative weight
    * reaches p of the total weight, NO interpolation. Same shuffle-safe
    * shape as `groupQuantiles`: a (key, value) weight-sum histogram
    * (map-side combinable), one window pass for the weighted CDF and
    * the per-key total (shared partition+order spec → one exchange,
    * one sort), then a min over the qualifying values. NULL values and
    * non-positive weights are ignored. */
  def groupWeightedQuantile(df: DataFrame, keyCol: String, valCol: String,
      weightCol: String, p: Double, outName: String): DataFrame = {
    val hist = df
      .filter(col(valCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(keyCol), col(valCol).cast("double").as("_v"))
      .agg(sum(col(weightCol).cast("long")).as("_w"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
    val wTot = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("_cum", sum(col("_w")).over(w))
      .withColumn("_tot", sum(col("_w")).over(wTot))
      // first value whose cumulative weight reaches p of the total:
      // weights are integral, so compare against ceil(p * tot) in longs
      // (both engines fold p * tot with the same IEEE multiply)
      .filter(col("_cum") >= ceil(lit(p) * col("_tot")).cast("long"))
      .groupBy(col(keyCol))
      .agg(min(col("_v")).as(outName))
  }

  /** Order-preserving bit image of a double: monotone in the value's
    * sort order (negatives flipped, sign bit rotated), so a RANGE of
    * doubles maps to a range of unsigned longs and the top bits form an
    * equi-depth-ish histogram bin with no min/max pre-pass. NaN maps
    * after every finite value, matching SQL sort order. */
  private def orderedBits(v: Double): Long = {
    val b = java.lang.Double.doubleToRawLongBits(v)
    if (b < 0) ~b else b | Long.MinValue
  }

  /** Low-cardinality fast path for `groupQuantiles`: two bounded scans
    * instead of a per-group sort.
    *
    *   1. per-partition sparse histograms over the top 16 bits of
    *      `orderedBits` — a primitive-kernel fold, no hash aggregation
    *      over raw values and NO row shuffle (each partition ships at
    *      most |groups|·2^16 counts, independent of row count);
    *   2. the driver merges histograms (bounded by `maxHistEntries`),
    *      walks each group's CDF to find the bins holding ranks
    *      floor(p·(n-1)) / ceil(p·(n-1)), and checks those bins are
    *      under `maxBinRows`;
    *   3. a second scan collects ONLY rows in target bins (count known
    *      bounded before the collect fires), which the driver sorts to
    *      pick the bracketing values — `lo*(1-frac) + hi*frac`, the
    *      same DuckDB-identical lerp as `groupQuantiles`.
    *
    * No sort of the data ever happens: per-group skew is irrelevant,
    * and the shuffle-free passes engage every core even when the input
    * is one parquet row group (where the window path's first stage is
    * single-threaded; measured 2.4x on q35 at sf0.1). The trade is the
    * driver-side merged histogram: groups × 2^16 worst-case entries.
    * All three ceilings — histogram entries (enforced inside every
    * treeReduce merge, so no JVM ever exceeds it), per-target-bin rows,
    * and the TOTAL pass-2 candidate collect summed across groups —
    * HARD-FAIL with guidance to `groupQuantiles` (the any-cardinality
    * window path) rather than risk driver memory — same honesty
    * contract as `Similarity.cosineDupPairs.maxRows`. */
  def groupQuantilesBinned(df: DataFrame, keyCol: String,
      specs: Seq[(String, Double, String)],
      maxHistEntries: Int = 4000000, maxBinRows: Long = 4000000L,
      maxCandidateRows: Long = 8000000L): DataFrame = {
    val spark = df.sparkSession
    val nSpecs = specs.length
    val src = df.select(col(keyCol) +: specs.map(s => col(s._1).cast("double")): _*)
    def tooMany(where: String) = new IllegalStateException(
      s"groupQuantilesBinned: >$maxHistEntries (group,bin) entries $where - " +
        "group cardinality too high for the binned path; use groupQuantiles")
    // pass 1: sparse (key, spec, bin) counts per partition; bin -1L
    // counts nulls so all-null groups keep their key visible. Partial
    // maps merge through treeReduce with the ceiling enforced INSIDE
    // every merge, so no single JVM (driver included) ever holds more
    // than maxHistEntries entries — a plain collect() would be bounded
    // per partition but unbounded in aggregate.
    val partMaps = src.rdd.mapPartitions { it =>
      val m = collection.mutable.HashMap[(Any, Int, Long), Long]()
      it.foreach { r =>
        val k = r.get(0)
        var i = 0
        while (i < nSpecs) {
          val bin = if (r.isNullAt(i + 1)) -1L
            else orderedBits(r.getDouble(i + 1)) >>> 48
          val kk = (k, i, bin)
          m(kk) = m.getOrElse(kk, 0L) + 1
          if (m.size > maxHistEntries) throw tooMany("in one partition")
          i += 1
        }
      }
      Iterator(m)
    }
    val hist =
      if (partMaps.getNumPartitions == 0)
        collection.mutable.HashMap[(Any, Int, Long), Long]()
      else partMaps.treeReduce({ (m1, m2) =>
        val (big, small) = if (m1.size >= m2.size) (m1, m2) else (m2, m1)
        small.foreach { case (k, c) => big(k) = big.getOrElse(k, 0L) + c }
        if (big.size > maxHistEntries) throw tooMany("after merging")
        big
      })
    // driver CDF walk: target bins and the global rank each bin starts at
    case class Bracket(r: Double, loBin: Long, loOff: Long, hiBin: Long, hiOff: Long)
    val brackets = collection.mutable.HashMap[(Any, Int), Bracket]()
    val targetBins = collection.mutable.Set[(Any, Int, Long)]()
    val byGroup = hist.toSeq.groupBy { case ((k, si, _), _) => (k, si) }
    byGroup.foreach { case ((k, si), entries) =>
      val bins = entries.collect { case ((_, _, b), c) if b >= 0 => (b, c) }.sortBy(_._1)
      val n = bins.map(_._2).sum
      if (n > 0) {
        val r = specs(si)._2 * (n - 1).toDouble
        val lo = math.floor(r).toLong
        val hi = math.ceil(r).toLong
        var start = 0L
        var loBin = -1L; var loOff = 0L; var hiBin = -1L; var hiOff = 0L
        bins.foreach { case (b, c) =>
          if (start <= lo && lo < start + c) { loBin = b; loOff = lo - start }
          if (start <= hi && hi < start + c) { hiBin = b; hiOff = hi - start }
          start += c
        }
        require(hist((k, si, loBin)) <= maxBinRows && hist((k, si, hiBin)) <= maxBinRows,
          s"groupQuantilesBinned: a target bin exceeds $maxBinRows rows " +
            "(pathological value concentration); use groupQuantiles")
        targetBins += ((k, si, loBin)); targetBins += ((k, si, hiBin))
        brackets((k, si)) = Bracket(r, loBin, loOff, hiBin, hiOff)
      }
    }
    // pass 2: rows in target bins only. Each bin is under maxBinRows,
    // but the TOTAL collect is groups x specs x 2 bins — check the sum
    // (known exactly from the histogram) BEFORE any row ships
    val totalCandidates = targetBins.toSeq.map(hist(_)).sum
    require(totalCandidates <= maxCandidateRows,
      s"groupQuantilesBinned: target bins hold $totalCandidates rows in total " +
        s"(> $maxCandidateRows) - too many groups for the binned path; " +
        "use groupQuantiles")
    val bcT = spark.sparkContext.broadcast(targetBins.toSet)
    val cand = src.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val k = r.get(0)
        (0 until nSpecs).iterator.flatMap { i =>
          if (r.isNullAt(i + 1)) Iterator.empty
          else {
            val v = r.getDouble(i + 1)
            val kk = (k, i, orderedBits(v) >>> 48)
            if (bcT.value(kk)) Iterator((kk, v)) else Iterator.empty
          }
        }
      }
    }.collect()
    val byBin = cand.groupBy(_._1).map { case (kk, vs) => (kk, vs.map(_._2).sorted) }
    // assemble one row per key (insertion-ordered grouping is fine; the
    // caller orders the final frame)
    val keys = hist.keys.map(_._1).toSeq.distinct
    val rows = keys.map { k =>
      val qs = specs.indices.map { si =>
        brackets.get((k, si)) match {
          case None => null // all-null (or absent) group: null quantile
          case Some(b) =>
            val vlo = byBin((k, si, b.loBin))(b.loOff.toInt)
            val vhi = byBin((k, si, b.hiBin))(b.hiOff.toInt)
            val frac = b.r - math.floor(b.r)
            java.lang.Double.valueOf(vlo * (1 - frac) + vhi * frac)
        }
      }
      org.apache.spark.sql.Row.fromSeq(k +: qs)
    }
    val schema = org.apache.spark.sql.types.StructType(
      df.schema(keyCol).copy(name = keyCol) +:
        specs.map(s => org.apache.spark.sql.types.StructField(
          s._3, org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  /** Low-cardinality fast path for `groupWeightedQuantile` — the q35
    * binned machinery applied to the weighted selection. Same contract
    * bit-for-bit (smallest value whose cumulative weight reaches
    * ceil(p·total), weights summed in longs, NULL values / non-positive
    * weights dropped), but no per-key sort of the value histogram:
    *
    *   1. per-partition sparse (key, bin) → (weight sum, row count)
    *      over the top 16 bits of `orderedBits` — map-side combined,
    *      histogram-sized shuffle, every core engaged even on a
    *      single-row-group input;
    *   2. driver walks each key's bin CDF (integer weights, exact) to
    *      the bin where cumulative weight crosses the threshold;
    *   3. a second scan collects only (value, weight) rows in target
    *      bins (bounded before the collect fires), and the driver
    *      finishes the walk inside the bin.
    *
    * Ceilings hard-fail to `groupWeightedQuantile` (the any-cardinality
    * window path) — the q35 honesty contract. */
  def groupWeightedQuantileBinned(df: DataFrame, keyCol: String,
      valCol: String, weightCol: String, p: Double, outName: String,
      maxHistEntries: Int = 4000000, maxBinRows: Long = 4000000L,
      maxCandidateRows: Long = 8000000L): DataFrame = {
    val spark = df.sparkSession
    val src = df
      .filter(col(valCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol), col(valCol).cast("double").as("_v"),
        col(weightCol).cast("long").as("_w"))
    def tooMany(where: String) = new IllegalStateException(
      s"groupWeightedQuantileBinned: >$maxHistEntries (group,bin) entries $where - " +
        "group cardinality too high for the binned path; use groupWeightedQuantile")
    val partMaps = src.rdd.mapPartitions { it =>
      val m = collection.mutable.HashMap[(Any, Long), (Long, Long)]()
      it.foreach { r =>
        val kk = (r.get(0), orderedBits(r.getDouble(1)) >>> 48)
        val (w0, c0) = m.getOrElse(kk, (0L, 0L))
        m(kk) = (w0 + r.getLong(2), c0 + 1)
        if (m.size > maxHistEntries) throw tooMany("in one partition")
      }
      Iterator(m)
    }
    val hist =
      if (partMaps.getNumPartitions == 0)
        collection.mutable.HashMap[(Any, Long), (Long, Long)]()
      else partMaps.treeReduce({ (m1, m2) =>
        val (big, small) = if (m1.size >= m2.size) (m1, m2) else (m2, m1)
        small.foreach { case (k, (w, c)) =>
          val (w0, c0) = big.getOrElse(k, (0L, 0L))
          big(k) = (w0 + w, c0 + c)
        }
        if (big.size > maxHistEntries) throw tooMany("after merging")
        big
      })
    // driver CDF walk: per key, the bin where cumulative weight crosses
    // ceil(p * total) — all integer except the one pinned IEEE multiply
    val targetBins = collection.mutable.Set[(Any, Long)]()
    val walk = collection.mutable.HashMap[Any, (Long, Long)]() // key -> (threshold, cumBefore)
    hist.toSeq.groupBy(_._1._1).foreach { case (k, entries) =>
      val bins = entries.map { case ((_, b), (w, _)) => (b, w) }.sortBy(_._1)
      val tot = bins.map(_._2).sum
      val t = math.ceil(p * tot.toDouble).toLong
      var cum = 0L
      var tb = Long.MinValue
      var cumBefore = 0L
      bins.foreach { case (b, w) =>
        if (tb == Long.MinValue && cum + w >= t) { tb = b; cumBefore = cum }
        cum += w
      }
      assert(tb != Long.MinValue, "threshold not reached — broken CDF walk")
      require(hist((k, tb))._2 <= maxBinRows,
        s"groupWeightedQuantileBinned: target bin exceeds $maxBinRows rows " +
          "(pathological value concentration); use groupWeightedQuantile")
      targetBins += ((k, tb))
      walk(k) = (t, cumBefore)
    }
    val totalCandidates = targetBins.toSeq.map(hist(_)._2).sum
    require(totalCandidates <= maxCandidateRows,
      s"groupWeightedQuantileBinned: target bins hold $totalCandidates rows " +
        s"(> $maxCandidateRows) - too many groups for the binned path; " +
        "use groupWeightedQuantile")
    val bcT = spark.sparkContext.broadcast(targetBins.toSet)
    val cand = src.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val v = r.getDouble(1)
        val kk = (r.get(0), orderedBits(v) >>> 48)
        if (bcT.value(kk)) Iterator((r.get(0), v, r.getLong(2)))
        else Iterator.empty
      }
    }.collect()
    val byKey = cand.groupBy(_._1)
    val rows = walk.toSeq.map { case (k, (t, cumBefore)) =>
      val vals = byKey(k).groupBy(_._2).toSeq
        .map { case (v, arr) => (v, arr.map(_._3).sum) }.sortBy(_._1)
      var cum = cumBefore
      var ans: java.lang.Double = null
      vals.foreach { case (v, w) =>
        if (ans == null) { cum += w; if (cum >= t) ans = v }
      }
      org.apache.spark.sql.Row.fromSeq(Seq(k, ans))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol).copy(name = keyCol),
      org.apache.spark.sql.types.StructField(outName,
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }
}
