package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Second relational pack: the "free in Spark" operators SURVEY.md §2.C
  * notes the corpus never uses but a complete engine must offer —
  * rollup/cube/grouping sets, pivot, exact percentiles, regex functions,
  * set operators, lateral subqueries, sorted array set ops.
  */
object Relational2 extends QueryPack {

  /** One SQL text for q55 on BOTH engines (DuckDB 1.0 has no
    * width_bucket, so the equi-width bin is explicit floor arithmetic —
    * the q45 z-order precedent): global [min,max] from one broadcast
    * row, 10 bins, edge values clamped into the last bin. NULLIF guards
    * the degenerate lo==hi range: without it Spark's ANSI mode throws
    * DIVIDE_BY_ZERO where DuckDB silently NULLs; with it both engines
    * put every row in bin 0 (GREATEST drops the NULL). */
  private[queries] val histogramSql: String =
    """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
      h AS (SELECT event_type,
          CAST(LEAST(9, GREATEST(0,
            CAST(floor((value - lo) / NULLIF(hi - lo, 0) * 10.0) AS BIGINT)))
            AS INTEGER) AS bin
        FROM events, b)
      SELECT event_type, bin, COUNT(*) AS n
      FROM h GROUP BY event_type, bin ORDER BY event_type, bin"""

  /** One SQL text for q52 on BOTH engines: integer-cents moment sums
    * (exact), then pinned double formulas — Spark runs it verbatim, the
    * oracle map carries the identical string. */
  private[queries] val regressionSql: String =
    """WITH m AS (SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(user_id) AS BIGINT) AS su,
        CAST(SUM(user_id * user_id) AS BIGINT) AS suu,
        CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sc,
        CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)
               * CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS scc,
        CAST(SUM(CAST(round(value * 100, 0) AS BIGINT) * user_id) AS BIGINT) AS scu
      FROM events GROUP BY event_type),
      f AS (SELECT event_type, n,
        CAST(n AS DOUBLE) * CAST(scu AS DOUBLE)
          - CAST(su AS DOUBLE) * CAST(sc AS DOUBLE) AS num,
        CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
          - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS du,
        CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
          - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) AS dc,
        CAST(su AS DOUBLE) AS sud, CAST(sc AS DOUBLE) AS scd
      FROM m)
      SELECT event_type, n,
        round(num / NULLIF(sqrt(du) * sqrt(dc), 0), 6) AS corr_cu,
        round(num / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
          AS covar_pop_cu,
        round(num / NULLIF(du, 0), 6) AS slope_cu,
        round((scd - num / NULLIF(du, 0) * sud) / CAST(n AS DOUBLE), 6)
          AS intercept_cu
      FROM f ORDER BY event_type"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    "q32_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    "q33_grouping_sets" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""")
    }),

    "q34_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(dsum($"value"))
        .orderBy($"user_id")
    }),

    // exact interpolated quantiles via bounded bin-histogram selection
    // (ExactQuantile.groupQuantilesBinned): same bits as percentile/
    // quantile_cont, but no per-group sort and no giant aggregation
    // buffer — the returnflag GROUP BY is 3 groups, the binned path's
    // home turf (the any-cardinality window path is groupQuantiles)
    "q35_percentile" -> ((s, dir) => {
      import s.implicits._
      graft.operators.ExactQuantile.groupQuantilesBinned(
          t(s, dir, "lineitem"), "l_returnflag",
          Seq(("l_quantity", 0.5, "median_qty"),
            ("l_extendedprice", 0.9, "p90_price")))
        .repartition(1).sortWithinPartitions($"l_returnflag")
    }),

    // windowFunnel-style funnel depth (ClickHouse analytics family):
    // deepest view→click→purchase chain within 1 hour of the chain
    // start, exists-chain semantics (order-free, so the oracle replays
    // it with EXISTS joins while the kernel runs one sorted pass).
    "q44_funnel" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.operators.Funnel.windowFunnel(t(s, dir, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"), 3600L * 1000000)
        .toDF().orderBy(col("user_id"))
    }),

    // weighted exact quantile (the quantileExactWeighted contract):
    // smallest price whose cumulative QUANTITY weight reaches p of the
    // per-flag total — no interpolation. Binned two-pass (the q35
    // machinery, weight-summing bins): 3 keys × ~200k distinct prices
    // made the window path's per-key sort the bottleneck (1.6 s
    // isolated); the bin histogram engages every core and ships no
    // rows. Spec pins binned == window on random weighted data.
    "q47_weighted_quantile" -> ((s, dir) => {
      import s.implicits._
      graft.operators.ExactQuantile.groupWeightedQuantileBinned(
          t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
          "l_quantity", 0.5, "wmedian_price")
        .orderBy($"l_returnflag")
    }),

    // sequenceMatch + sequenceCount (the remaining CH behavioral pair):
    // strictly-ordered view→click→purchase chains, existence plus
    // greedy non-overlapping count; the oracle replays the cursor by
    // counting leftmost-LAZY regex matches over per-timestamp bitmask
    // characters (NOT list_reduce — broken in DuckDB 1.0, see the
    // oracle's comment).
    "q48_sequence_match" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.operators.Funnel.sequenceMatchCount(t(s, dir, "events"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .toDF().orderBy(col("user_id"))
    }),

    // ClickHouse-style retention flags (the windowFunnel sibling):
    // anchored AND of per-condition matches, no time ordering by that
    // function's contract.
    "q46_retention" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Funnel.retention(t(s, dir, "events"), "user_id",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy($"user_id")
    }),

    // Z-order (Morton) layout values over two part columns — the
    // multi-column-pruning clustering key (OPTIMIZE ZORDER family);
    // the layout benefit itself is spec-measured on per-partition
    // ranges, the oracle gates the z-value arithmetic bit-for-bit.
    "q45_zorder" -> ((s, dir) => {
      import s.implicits._
      graft.operators.ZOrder.withZValue(t(s, dir, "part"),
          Seq("p_retailprice", "p_size"))
        .select($"p_partkey", $"_z".as("zval"))
        .orderBy($"p_partkey")
    }),

    "q36_regexp" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          regexp_extract($"text", "([a-z]+a[a-z]*)", 1).as("first_a_word"),
          length(regexp_replace($"text", "[aeiou]", "")).as("consonant_len"))
        .orderBy($"doc_id")
    }),

    "q37_set_ops" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val big = o.filter($"o_totalprice" > 100000.0).select($"o_custkey")
      val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
      big.intersect(urgent)
        .unionByName(big.except(urgent).limit(0)) // keep INTERSECT ∪ EXCEPT shape
        .orderBy($"o_custkey")
    }),

    "q38_lateral" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderkey, o_totalprice, l.price_band
        FROM orders,
        LATERAL (SELECT CASE WHEN o_totalprice > 200000 THEN 'hi'
                             WHEN o_totalprice > 50000 THEN 'mid'
                             ELSE 'lo' END AS price_band)
        AS l
        ORDER BY o_orderkey""")
    }),

    // Salted skew join: results must be IDENTICAL to the plain join —
    // only the shuffle distribution changes (the salt spreads each hot
    // l_suppkey over 8 partitions).
    "q40_salted_join" -> ((s, dir) => {
      import s.implicits._
      import graft.queries.Util.dsum
      graft.operators.Skew.saltedJoin(
          t(s, dir, "lineitem").select($"l_suppkey", $"l_quantity", $"l_extendedprice"),
          t(s, dir, "supplier").select($"s_suppkey".as("l_suppkey"), $"s_name"),
          "l_suppkey", salt = 8)
        .groupBy($"l_suppkey", $"s_name")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
        .orderBy($"l_suppkey")
    }),

    "q39_array_set_ops" -> ((s, dir) => {
      import s.implicits._
      val words = array_distinct(split($"text", " "))
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      // joined to a scalar so the driver's pandas comparator can sort it
      t(s, dir, "documents")
        .select($"doc_id",
          array_join(array_sort(array_intersect(words, stop)), ",").as("stop_hits"),
          size(array_except(words, stop)).as("n_content_words"))
        .orderBy($"doc_id")
    }),

    // as-of join (composed: union + one keyed window — single shuffle):
    // each event picks up the latest per-type daily stats at or before
    // its timestamp. DuckDB's native ASOF JOIN is the oracle.
    "q41_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_id", $"event_type", $"ts")
      val stats = t(s, dir, "events")
        .groupBy($"event_type", date_trunc("DAY", $"ts").as("day_ts"))
        .agg(dsum($"value").as("day_total"))
        .select($"event_type", $"day_ts", $"day_ts".as("stat_ts"), $"day_total")
      graft.operators.AsOfJoin.asofJoin(ev, stats, Seq("event_type"),
          leftTime = "ts", rightTime = "day_ts",
          valueCols = Seq("stat_ts", "day_total"))
        .select($"event_id", $"event_type", $"stat_ts", $"day_total")
        .orderBy($"event_id")
    }),

    // range join (binned equi-join on an hour key + residual predicate —
    // never |points| x |intervals|): events inside each day's 06-18h
    // working window.
    "q42_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_id", $"ts")
      val intervals = ev.select(to_date($"ts").as("d")).distinct()
        .select(datediff($"d", lit("1970-01-01")).cast("long").as("interval_id"),
          ($"d".cast("timestamp") + expr("INTERVAL 6 HOURS")).as("start_ts"),
          ($"d".cast("timestamp") + expr("INTERVAL 18 HOURS")).as("end_ts"))
      graft.operators.AsOfJoin.rangeJoin(ev, "ts", intervals, "start_ts", "end_ts")
        .select($"event_id", $"interval_id")
        .orderBy($"event_id")
    }),

    // KMV distinct sketch — custom typed Aggregator (bounded k-string
    // state, mergeable partials); estimate is md5-derived and exact in
    // doubles, so the oracle replays it to the bit (q49 pins HLL's
    // layout the same way).
    // Distinct-first: KMV is insensitive to duplicates, so aggregating
    // the distinct (flag, partkey) pairs gives the identical sketch
    // while hashing each value once — and the exact-count comparison
    // column becomes a plain count(*) instead of a countDistinct
    // (whose expand/sort-agg would drag the object sketch with it).
    "q43_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      val kmv = graft.functions.KmvSketch.kmvDistinct(64)
      t(s, dir, "lineitem")
        .select($"l_returnflag", $"l_partkey").distinct()
        .groupBy($"l_returnflag")
        .agg(kmv($"l_partkey".cast("string")).as("kmv_est"),
          count(lit(1)).as("exact_distinct"))
        .repartition(1).sortWithinPartitions($"l_returnflag")
    }),

    // the remaining built-in window-function surface in one query:
    // offset (lag/lead), frame-edge (first/last), ranking (rank/
    // dense_rank/ntile) and distribution (percent_rank/cume_dist —
    // rounded, both engines compute (rank-1)/(n-1) style ratios in
    // doubles). Two named windows share one shuffle+sort each.
    "q51_window_family" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          lag(value, 1) OVER w AS prev_value,
          lead(value, 1) OVER w AS next_value,
          first_value(event_type) OVER w AS first_type,
          last_value(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
          rank() OVER v AS value_rank,
          dense_rank() OVER v AS value_dense_rank,
          ntile(4) OVER w AS quartile,
          round(percent_rank() OVER v, 6) AS value_pct_rank,
          round(cume_dist() OVER v, 6) AS value_cume_dist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               v AS (PARTITION BY user_id ORDER BY value, event_id)
        ORDER BY event_id""")
    }),

    // moving-window aggregates (the groupArrayMovingSum/Avg contract):
    // per-user running 5-row sum/avg in (ts, event_id) order. Frame
    // sums go through DECIMAL so sliding-accumulator vs recompute
    // implementations can't diverge on float order; one shuffle + one
    // sort, both window functions share the frame.
    "q50_moving_agg" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-4, 0)
      t(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", $"value")
        .select($"event_id",
          sum($"value".cast("decimal(18,2)")).over(win).cast("double").as("mov_sum5"),
          (sum($"value".cast("decimal(18,2)")).over(win).cast("double") /
            count(lit(1)).over(win)).as("mov_avg5"))
        .orderBy($"event_id")
    }),

    // time-axis gap filling (the ORDER BY ... WITH FILL contract):
    // hourly purchase counts densified over the observed [min, max]
    // range with zeros for the 47 empty hours — the generated axis
    // comes from ONE sequence() row exploded (tiny, broadcast side),
    // the real data stays on its own partitioning.
    "q54_with_fill" -> ((s, dir) => {
      import s.implicits._
      val hourly = t(s, dir, "events").filter($"event_type" === "purchase")
        .groupBy(date_trunc("HOUR", $"ts").as("hr"))
        .agg(count(lit(1)).as("n"))
      hourly.agg(min($"hr").as("lo"), max($"hr").as("hi"))
        .select(explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("hr"))
        .join(hourly, Seq("hr"), "left")
        .select($"hr", coalesce($"n", lit(0L)).as("n"))
        .orderBy($"hr")
    }),

    // equi-width histogram (the CH histogram-family contract with
    // fixed bins — the adaptive variant's bin placement is
    // implementation-defined and not engine-reproducible, so the
    // deterministic form is the one worth gating): one broadcast
    // min/max row, one map-side-combined (type, bin) count.
    "q55_histogram" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql(Relational2.histogramSql)
    }),

    // sketch ROLLUP (the OLAP-cube use of mergeable sketches): per-type
    // register blobs materialize once, then re-aggregate to the global
    // distinct-user estimate WITHOUT rescanning base data — register
    // union is elementwise max, so the rolled-up estimate is
    // bit-identical to sketching the global set directly, which is
    // exactly what the oracle computes.
    "q53_hll_rollup" -> ((s, dir) => {
      import s.implicits._
      val regs = graft.functions.HllSketch.hllRegisters
      val merge = graft.functions.HllSketch.hllMerge
      val perType = t(s, dir, "events")
        .select($"event_type", $"user_id").distinct()
        .groupBy($"event_type")
        .agg(regs($"user_id".cast("string")).as("regs"))
      perType.agg(merge($"regs").as("hll_est_total"))
        .crossJoin(t(s, dir, "events")
          .agg(countDistinct($"user_id").as("exact_distinct")))
    }),

    // correlation / covariance / linear-regression aggregates (the CH
    // corr/covarPop + ANSI regr_* family): value is exactly 2-decimal,
    // so integer-CENTS sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact longs
    // on both engines and every statistic is a pinned double formula
    // over them — no float-order dependence anywhere. The moment
    // PRODUCTS (n·Σxy etc.) are computed in doubles, deliberately:
    // BIGINT products wrap silently in Spark (ANSI off) but raise in
    // DuckDB at ~billions-of-rows moments, while the double path is
    // the same IEEE ops on both engines at every scale. corr is
    // scale-invariant, so cents units change nothing; slope/intercept
    // are in cents per user_id (documented).
    "q52_regression" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql(Relational2.regressionSql)
    }),

    // HyperLogLog distinct sketch (q43's sibling, 4 KB mergeable byte
    // registers instead of k strings): distinct users per event type.
    // Layout is pinned (md5 hash, top-12-bit bucket, 52-bit rho), so
    // the DuckDB oracle replays registers AND estimator bit-for-bit —
    // including the linear-counting small-range branch.
    "q49_hll_distinct" -> ((s, dir) => {
      import s.implicits._
      val hll = graft.functions.HllSketch.hllDistinct
      t(s, dir, "events")
        .select($"event_type", $"user_id").distinct()
        .groupBy($"event_type")
        .agg(hll($"user_id".cast("string")).as("hll_est"),
          count(lit(1)).as("exact_distinct"))
        .repartition(1).sortWithinPartitions($"event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q31_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q32_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q33_grouping_sets" ->
      """SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""",
    "q34_pivot" ->
      """SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase
        FROM events GROUP BY user_id ORDER BY user_id""",
    "q35_percentile" ->
      """SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_extendedprice, 0.9) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // exists-chain replay: intermediate events are automatically inside
    // the window (chain timestamps increase), so only the last event
    // carries the window predicate
    "q44_funnel" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        u AS (SELECT DISTINCT user_id FROM ev),
        l1 AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'),
        l2 AS (SELECT DISTINCT v.user_id FROM ev v JOIN ev c
          ON c.user_id = v.user_id AND c.event_type = 'click'
          AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
          WHERE v.event_type = 'view'),
        l3 AS (SELECT DISTINCT v.user_id FROM ev v
          JOIN ev c ON c.user_id = v.user_id AND c.event_type = 'click'
            AND c.ts > v.ts
          JOIN ev p ON p.user_id = v.user_id AND p.event_type = 'purchase'
            AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
          WHERE v.event_type = 'view')
        SELECT u.user_id,
          CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
               WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
               WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
               ELSE 0 END AS funnel_level
        FROM u ORDER BY u.user_id""",
    "q47_weighted_quantile" ->
      """WITH h AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
          GROUP BY l_returnflag, CAST(l_extendedprice AS DOUBLE)),
        c AS (SELECT *,
            SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS cum,
            SUM(w) OVER (PARTITION BY l_returnflag) AS tot
          FROM h)
        SELECT l_returnflag, MIN(v) AS wmedian_price
        FROM c WHERE cum >= CAST(ceil(0.5 * tot) AS BIGINT)
        GROUP BY l_returnflag ORDER BY l_returnflag""",
    // cursor replay: per distinct µs timestamp a 3-bit step mask encoded
    // as a character ('0'-'7'), then repeated leftmost-LAZY regex
    // matching over the per-user string — identical to the greedy
    // cursor (leftmost start = first possible chain start, lazy = first
    // qualifying group per level, non-overlapping scan = sequential
    // resume; greedy-earliest is minimal-end, so counts agree by the
    // exchange argument). NOT list_reduce: DuckDB 1.0's vectorized
    // list_reduce mis-folds ~1/150 grouped rows (verified against a
    // scalar replay of identical lists), so it cannot serve as an
    // oracle.
    "q48_sequence_match" ->
      """WITH g AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS uts,
            MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            + 2 * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            + 4 * MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bits
          FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        s AS (SELECT user_id,
            string_agg(chr(48 + bits), '' ORDER BY uts) AS seq
          FROM g GROUP BY user_id),
        c AS (SELECT user_id,
            len(regexp_extract_all(seq, '[1357].*?[2367].*?[4567]')) AS sc
          FROM s)
        SELECT user_id, sc > 0 AS seq_matched,
          CAST(sc AS INTEGER) AS seq_count
        FROM c ORDER BY user_id""",
    "q46_retention" ->
      """SELECT user_id,
        MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 AS r1,
        MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 AND
          MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 AS r2,
        MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 AND
          MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS r3
        FROM events GROUP BY user_id ORDER BY user_id""",
    // same equi-width bins over the observed [min,max] (identical
    // double arithmetic), bits interleaved with integer shifts
    "q45_zorder" ->
      """WITH st AS (SELECT
          MIN(CAST(p_retailprice AS DOUBLE)) AS mn0, MAX(CAST(p_retailprice AS DOUBLE)) AS mx0,
          MIN(CAST(p_size AS DOUBLE)) AS mn1, MAX(CAST(p_size AS DOUBLE)) AS mx1
          FROM part),
        bins AS (SELECT p_partkey,
          CASE WHEN mx0 = mn0 THEN 0 ELSE LEAST(65535, GREATEST(0,
            CAST(floor((CAST(p_retailprice AS DOUBLE) - mn0) / (mx0 - mn0) * 65535.0) AS BIGINT)))
          END AS b0,
          CASE WHEN mx1 = mn1 THEN 0 ELSE LEAST(65535, GREATEST(0,
            CAST(floor((CAST(p_size AS DOUBLE) - mn1) / (mx1 - mn1) * 65535.0) AS BIGINT)))
          END AS b1
          FROM part, st)
        SELECT p_partkey,
          CAST(list_sum(list_transform(range(0, 16), b ->
            (((b0 >> b) & 1) << (b * 2)) + (((b1 >> b) & 1) << (b * 2 + 1))))
            AS BIGINT) AS zval
        FROM bins ORDER BY p_partkey""",
    "q36_regexp" ->
      """SELECT doc_id,
        regexp_extract(text, '([a-z]+a[a-z]*)', 1) AS first_a_word,
        length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_len
        FROM documents ORDER BY doc_id""",
    "q37_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_custkey""",
    "q38_lateral" ->
      """SELECT o_orderkey, o_totalprice, l.price_band
        FROM orders,
        LATERAL (SELECT CASE WHEN o_totalprice > 200000 THEN 'hi'
                             WHEN o_totalprice > 50000 THEN 'mid'
                             ELSE 'lo' END AS price_band) AS l
        ORDER BY o_orderkey""",
    "q40_salted_join" ->
      """SELECT l_suppkey, s_name, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY l_suppkey, s_name ORDER BY l_suppkey""",
    "q39_array_set_ops" ->
      """SELECT doc_id,
        COALESCE(array_to_string(list_sort(list_intersect(list_distinct(string_split(text, ' ')),
          ['the','a','of','and','to'])), ','), '') AS stop_hits,
        len(list_filter(list_distinct(string_split(text, ' ')),
          w -> NOT list_contains(['the','a','of','and','to'], w))) AS n_content_words
        FROM documents ORDER BY doc_id""",
    "q41_asof_join" ->
      """WITH ev AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events),
        stats AS (SELECT event_type,
            CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_total
          FROM ev GROUP BY event_type, date_trunc('day', ts))
        SELECT e.event_id, e.event_type, s.day_ts AS stat_ts, s.day_total
        FROM ev e ASOF LEFT JOIN stats s
          ON e.event_type = s.event_type AND e.ts >= s.day_ts
        ORDER BY e.event_id""",
    "q42_range_join" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        iv AS (SELECT datediff('day', DATE '1970-01-01', d) AS interval_id,
            CAST(d AS TIMESTAMP) + INTERVAL 6 HOUR AS start_ts,
            CAST(d AS TIMESTAMP) + INTERVAL 18 HOUR AS end_ts
          FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM ev))
        SELECT e.event_id, i.interval_id
        FROM ev e JOIN iv i ON e.ts >= i.start_ts AND e.ts < i.end_ts
        ORDER BY e.event_id""",
    "q43_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
            md5(CAST(l_partkey AS VARCHAR)) AS h
          FROM lineitem),
        k AS (SELECT l_returnflag, list_sort(list(h))[64] AS kth,
            count(*) AS nd
          FROM h GROUP BY l_returnflag)
        SELECT l_returnflag,
          CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
               ELSE 63.0 / (CAST('0x' || substr(kth, 1, 13) AS UBIGINT)
                            / 4503599627370496.0) END AS kmv_est,
          nd AS exact_distinct
        FROM k ORDER BY l_returnflag""",
    "q55_histogram" -> histogramSql,
    "q54_with_fill" ->
      """WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
            COUNT(*) AS n
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
        g AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
          FROM b)
        SELECT g.hr, COALESCE(h.n, 0) AS n
        FROM g LEFT JOIN h ON g.hr = h.hr ORDER BY g.hr""",
    // global register replay over distinct users: register state
    // depends only on the hashed value, so the union of per-type
    // sketches equals the sketch of the union — the rollup identity
    // the query demonstrates
    "q53_hll_rollup" ->
      """WITH d AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v FROM events),
        b AS (SELECT
            CAST(CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT) >> 52 AS BIGINT) AS j,
            CAST(CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT)
                 & 4503599627370495 AS BIGINT) AS w
          FROM d),
        r AS (SELECT j,
            MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
          FROM b GROUP BY j),
        agg AS (SELECT
            list_sum(list(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)
              ORDER BY j)) AS sp,
            COUNT(*) AS np
          FROM r),
        est AS (SELECT
            (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
              / (sp + CAST(4096 - np AS DOUBLE)) AS e,
            4096 - np AS zeros
          FROM agg)
        SELECT
          CASE WHEN e <= 2.5 * 4096.0 AND zeros > 0
               THEN 4096.0 * ln(4096.0 / CAST(zeros AS DOUBLE))
               ELSE e END AS hll_est_total,
          (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct
        FROM est""",
    // the SAME SQL text Spark executes — the moment sums are exact
    // integers, so sharing the text is sound (and the strongest
    // statement that the formulas are engine-independent)
    "q52_regression" -> regressionSql,
    "q51_window_family" ->
      """SELECT event_id,
          lag(value, 1) OVER w AS prev_value,
          lead(value, 1) OVER w AS next_value,
          first_value(event_type) OVER w AS first_type,
          last_value(event_type) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
          rank() OVER v AS value_rank,
          dense_rank() OVER v AS value_dense_rank,
          ntile(4) OVER w AS quartile,
          round(percent_rank() OVER v, 6) AS value_pct_rank,
          round(cume_dist() OVER v, 6) AS value_cume_dist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
               v AS (PARTITION BY user_id ORDER BY value, event_id)
        ORDER BY event_id""",
    "q50_moving_agg" ->
      """WITH w AS (SELECT event_id,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS mov_sum5,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
            / COUNT(*) OVER f AS mov_avg5
        FROM events
        WINDOW f AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        SELECT * FROM w ORDER BY event_id""",
    // register replay: bucket = top 12 hash bits, rho = 53 - bin-length
    // of the 52-bit remainder (integer-exact); estimator folds present
    // registers in index order (left fold, exact powers of two) then
    // adds the empty-register count as one integer-valued term
    "q49_hll_distinct" ->
      """WITH d AS (SELECT DISTINCT event_type,
            CAST(user_id AS VARCHAR) AS v FROM events),
        b AS (SELECT event_type,
            CAST(CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT) >> 52 AS BIGINT) AS j,
            CAST(CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT)
                 & 4503599627370495 AS BIGINT) AS w
          FROM d),
        r AS (SELECT event_type, j,
            MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
          FROM b GROUP BY event_type, j),
        agg AS (SELECT event_type,
            list_sum(list(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)
              ORDER BY j)) AS sp,
            COUNT(*) AS np
          FROM r GROUP BY event_type),
        est AS (SELECT event_type,
            (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
              / (sp + CAST(4096 - np AS DOUBLE)) AS e,
            4096 - np AS zeros
          FROM agg),
        ex AS (SELECT event_type, COUNT(*) AS exact_distinct FROM d
          GROUP BY event_type)
        SELECT est.event_type,
          CASE WHEN e <= 2.5 * 4096.0 AND zeros > 0
               THEN 4096.0 * ln(4096.0 / CAST(zeros AS DOUBLE))
               ELSE e END AS hll_est,
          ex.exact_distinct
        FROM est JOIN ex ON est.event_type = ex.event_type
        ORDER BY est.event_type"""
  )
}
