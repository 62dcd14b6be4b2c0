package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Relational operator inventory (SURVEY.md §2.C/§2.D), re-expressed as
  * declarative Spark over the driver testdata so Catalyst handles
  * pushdown/pruning/join strategy. Each query mirrors a construct used by
  * the reference's SQL corpus (citations are reference-relative):
  *
  *  - projection/alias: examples/ethereum_blocks/create_buffer.sql:13-36
  *  - filters incl. computed: examples/ethereum_decoded_logs/create_buffer.sql:18-19
  *  - left equi-join (broadcastable): examples/ethereum_logs/create_buffer.sql:96
  *  - ARRAY JOIN single/parallel-zip: examples/ethereum_traces/create_buffer.sql:93-129,
  *    examples/ethereum_transactions/create_buffer.sql:161
  *  - group by single/multi key: examples/ethereum_token_erc20_balances/create_buffer.sql:63,88
  *  - any(col): examples/ethereum_token_erc20_balances/create_buffer.sql:68-69
  *  - UNION ALL: examples/ethereum_token_erc20_balances/create_buffer.sql:74-87
  *  - CTE chains: examples/ethereum_logs/create_buffer.sql:13-80
  *  - scalar subquery: examples/decoded_logs_to_daily_parquet_file/start.sql:2-12
  *  - HAVING-as-post-filter: examples/ethereum_token_erc20_balances/create_buffer.sql:23
  *  - 1-based element access: examples/ethereum_traces/create_buffer.sql:136-139
  *  - arrayMap → transform: examples/ethereum_blocks/create_buffer.sql:35
  *  - tuple() named struct: examples/ethereum_logs/create_buffer.sql:16-20
  *  - JSONExtract family: examples/ethereum_blocks/create_buffer.sql:39-71
  *  - date/time functions: examples/decoded_logs_to_daily_parquet_file/transform.sql:8-16
  *  - if/coalesce/casts: examples/ethereum_transactions/create_buffer.sql:149
  *  - generate_series: examples/ethereum_blocks/create_buffer.sql:7-11
  *  - ReplacingMergeTree dedup-on-read: examples/ethereum_blocks/create_table.sql:30-32
  */
object Relational extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-filter-agg, map-side partial agg, 2 grouping keys.
    "q01_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsumProd($"l_extendedprice", lit(1) - $"l_discount").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Projection + computed column + conjunctive filter (pushdown check).
    "q02_filter_project" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_quantity" >= 30 && $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1) - $"l_discount").cast("decimal(18,2)")).cast("double").as("net_price"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Left outer equi-join, small build side → broadcast.
    "q03_join_left" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      orders.join(broadcast(cust), orders("o_custkey") === cust("c_custkey"), "left")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
        .orderBy($"c_mktsegment")
    }),

    // Multi-table join chain (TPC-H Q5 shape): one big fact, small dims broadcast.
    "q04_join_chain" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cu = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val na = t(s, dir, "nation")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cu), $"o_custkey" === $"c_custkey")
        .join(broadcast(su), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(na), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(dsumProd($"l_extendedprice", lit(1) - $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    }),

    // ARRAY JOIN (single): explode an array column.
    "q05_explode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"word")
    }),

    // Parallel ARRAY JOIN zip semantics: two arrays unnested positionally
    // (arrays_zip + one explode), NOT a Cartesian product.
    "q06_zip_explode" -> ((s, dir) => {
      import s.implicits._
      val words = split($"text", " ")
      t(s, dir, "documents")
        .select($"doc_id",
          explode(arrays_zip(words.as("w"), sequence(lit(1), size(words)).as("p"))).as("z"))
        .select($"doc_id", $"z.w".as("word"), $"z.p".cast("long").as("pos"))
        .filter($"pos" <= 5)
        .orderBy($"doc_id", $"pos")
    }),

    // UNION ALL of heterogeneous projections.
    "q07_union_all" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_custkey".as("id"), lit("customer").as("kind"))
        .unionByName(
          t(s, dir, "supplier").select($"s_suppkey".as("id"), lit("supplier").as("kind")))
        .orderBy($"kind", $"id")
    }),

    // ReplacingMergeTree dedup-on-read emulation: row_number over the order
    // key, keep latest version (create_table.sql ORDER BY semantics).
    "q08_window_dedup" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate")
        .orderBy($"o_custkey")
    }),

    // Scalar subquery: threshold computed from an aggregate, broadcast back.
    "q09_scalar_subquery" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val thr = li.agg((dsum($"l_quantity") / count(lit(1))).as("avg_qty"))
      li.crossJoin(broadcast(thr))
        .filter($"l_quantity" > $"avg_qty")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    }),

    // HAVING (post-aggregation filter).
    "q10_having" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_suppkey")
        .agg(dsum($"l_extendedprice").as("total"))
        .filter($"total" > 1000000.0)
        .orderBy($"l_suppkey")
    }),

    // Semi join (EXISTS).
    "q11_semi_join" -> ((s, dir) => {
      import s.implicits._
      val cu = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cu.join(ord, cu("c_custkey") === ord("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name").orderBy($"c_custkey")
    }),

    // Anti join (NOT EXISTS).
    "q12_anti_join" -> ((s, dir) => {
      import s.implicits._
      val cu = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cu.join(ord, cu("c_custkey") === ord("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name").orderBy($"c_custkey")
    }),

    // JSONExtract family: typed extraction from a JSON string column.
    "q13_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id", get_json_object($"props", "$.k").cast("long").as("k"))
        .orderBy($"event_id")
    }),

    // toDate / toYYYYMM / addDays equivalents.
    "q14_dates" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id", to_date($"ts").as("d"),
          date_format($"ts", "yyyyMM").as("ym"),
          date_add(to_date($"ts"), 7).as("d7"))
        .orderBy($"event_id")
    }),

    // if()/multi-way conditional.
    "q15_case_when" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          when($"o_totalprice" > 200000.0, "big")
            .when($"o_totalprice" > 50000.0, "mid")
            .otherwise("small").as("bucket"))
        .orderBy($"o_orderkey")
    }),

    // Top-k with deterministic tie-break.
    "q16_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", $"o_totalprice")
    }),

    // DISTINCT.
    "q17_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select($"o_orderpriority").distinct()
        .orderBy($"o_orderpriority")
    }),

    // 1-based array element access (CH arr[i] → element_at).
    "q18_element_at" -> ((s, dir) => {
      import s.implicits._
      val words = split($"text", " ")
      t(s, dir, "documents")
        .select($"doc_id", element_at(words, 1).as("first_word"),
          element_at(words, 3).as("third_word"))
        .orderBy($"doc_id")
    }),

    // arrayMap → transform (higher-order function, codegen'd).
    "q19_transform" -> ((s, dir) => {
      import s.implicits._
      // joined to a scalar so the driver's pandas comparator can sort it
      t(s, dir, "documents")
        .select($"doc_id",
          array_join(transform(slice(split($"text", " "), 1, 4), x => upper(x)), ",")
            .as("words4"))
        .orderBy($"doc_id")
    }),

    // tuple(a as x, …) named-struct construction.
    "q20_struct" -> ((s, dir) => {
      import s.implicits._
      // build the named struct, then re-project its fields as scalars so
      // the comparator can hash the output (struct columns are unsortable
      // in the driver's pandas gate)
      t(s, dir, "orders")
        .select($"o_orderkey",
          struct($"o_custkey".as("cust"), $"o_totalprice".as("price")).as("info"))
        .select($"o_orderkey", $"info.cust".as("info_cust"),
          $"info.price".as("info_price"))
        .orderBy($"o_orderkey")
    }),

    // CTE chain via Spark SQL text (the corpus is SQL-first).
    "q21_cte_chain" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        WITH supp AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM lineitem GROUP BY l_suppkey
        ), m AS (SELECT MAX(total) AS mt FROM supp)
        SELECT s.l_suppkey, s.total
        FROM supp s, m
        WHERE s.total > m.mt * 0.8
        ORDER BY s.l_suppkey""")
    }),

    // any(col) → first over a functionally-dependent column + multi-agg.
    "q22_any_agg" -> ((s, dir) => {
      import s.implicits._
      val cu = t(s, dir, "customer")
      val na = t(s, dir, "nation")
      cu.join(broadcast(na), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_nationkey")
        .agg(first($"n_name").as("nation_name"), count(lit(1)).as("n_cust"),
          dsum($"c_acctbal").as("total_bal"))
        .orderBy($"c_nationkey")
    }),

    // CAST inventory (:: coercions).
    "q23_casts" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("long").as("qty_long"),
          $"l_linenumber".cast("string").as("ln_str"),
          ($"l_quantity" > 25).as("is_big"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // left()/length()/concat string functions.
    "q24_strings" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", substring($"text", 1, 4).as("prefix"),
          length($"text").as("len"),
          concat($"lang", lit("_"), $"source").as("tag"))
        .orderBy($"doc_id")
    }),

    // Conditional aggregation (countIf shape).
    "q25_conditional_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(when($"l_discount" > 0.05, lit(1))).as("n_disc"),
          count(lit(1)).as("n_all"))
        .orderBy($"l_returnflag")
    }),

    // Event-time tumbling window aggregation (micro-batch window analog).
    "q26_time_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 day").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .select($"w.start".as("day_start"), $"event_type", $"n", $"total_value")
        .orderBy($"day_start", $"event_type")
    }),

    // min/max/count-distinct aggregates.
    "q27_minmax_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(min($"l_shipdate").as("min_ship"), max($"l_shipdate").as("max_ship"),
          countDistinct($"l_suppkey").as("n_supp"))
        .orderBy($"l_returnflag")
    }),

    // generate_series → spark.range (block-number batch source shape,
    // examples/ethereum_blocks/create_buffer.sql:7-11).
    "q28_range_source" -> ((s, _) => {
      import s.implicits._
      s.range(1, 101).toDF("n")
        .select($"n", ($"n" * $"n").as("sq"))
        .orderBy($"n")
    }),

    // Inner equi-join fact-to-fact with aggregation.
    "q29_join_inner" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("rev"))
        .orderBy($"o_orderstatus")
    }),

    // GROUP BY multi-key (dedupe-touched-balances shape,
    // examples/ethereum_token_erc20_balances/create_buffer.sql:88).
    "q30_groupby_multi" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .orderBy($"user_id", $"event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DOUBLE) AS net_price
        FROM lineitem WHERE l_quantity >= 30 AND l_discount > 0.05
        ORDER BY l_orderkey, l_linenumber""",
    "q03_join_left" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q04_join_chain" ->
      """SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""",
    "q05_explode" ->
      """SELECT word, COUNT(*) AS cnt FROM
        (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY word""",
    "q06_zip_explode" ->
      """SELECT doc_id, word, pos FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        FROM documents)
        WHERE pos <= 5 ORDER BY doc_id, pos""",
    "q07_union_all" ->
      """SELECT c_custkey AS id, 'customer' AS kind FROM customer
        UNION ALL SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
        ORDER BY kind, id""",
    "q08_window_dedup" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        WHERE rn = 1 ORDER BY o_custkey""",
    "q09_scalar_subquery" ->
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        WHERE l_quantity > (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q10_having" ->
      """SELECT l_suppkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) > 1000000.0
        ORDER BY l_suppkey""",
    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""",
    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""",
    "q13_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id""",
    "q14_dates" ->
      """SELECT event_id, CAST(ts AS DATE) AS d, strftime(ts, '%Y%m') AS ym,
        CAST(ts AS DATE) + 7 AS d7 FROM events ORDER BY event_id""",
    "q15_case_when" ->
      """SELECT o_orderkey,
        CASE WHEN o_totalprice > 200000.0 THEN 'big'
             WHEN o_totalprice > 50000.0 THEN 'mid'
             ELSE 'small' END AS bucket
        FROM orders ORDER BY o_orderkey""",
    "q16_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q17_distinct" ->
      """SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority""",
    "q18_element_at" ->
      """SELECT doc_id, string_split(text, ' ')[1] AS first_word,
        string_split(text, ' ')[3] AS third_word
        FROM documents ORDER BY doc_id""",
    "q19_transform" ->
      """SELECT doc_id,
        array_to_string(list_transform(string_split(text, ' ')[1:4], x -> upper(x)), ',')
          AS words4
        FROM documents ORDER BY doc_id""",
    "q20_struct" ->
      """WITH packed AS (
          SELECT o_orderkey,
            struct_pack(cust := o_custkey, price := o_totalprice) AS info
          FROM orders)
        SELECT o_orderkey, info.cust AS info_cust, info.price AS info_price
        FROM packed ORDER BY o_orderkey""",
    "q21_cte_chain" ->
      """WITH supp AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM lineitem GROUP BY l_suppkey
        ), m AS (SELECT MAX(total) AS mt FROM supp)
        SELECT s.l_suppkey, s.total FROM supp s, m
        WHERE s.total > m.mt * 0.8 ORDER BY s.l_suppkey""",
    "q22_any_agg" ->
      """SELECT c_nationkey, MIN(n_name) AS nation_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q23_casts" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty_long,
        CAST(l_linenumber AS VARCHAR) AS ln_str, l_quantity > 25 AS is_big
        FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q24_strings" ->
      """SELECT doc_id, substr(text, 1, 4) AS prefix, length(text) AS len,
        lang || '_' || source AS tag FROM documents ORDER BY doc_id""",
    "q25_conditional_agg" ->
      """SELECT l_returnflag,
        COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc,
        COUNT(*) AS n_all
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q26_time_window" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY day_start, event_type""",
    "q27_minmax_distinct" ->
      """SELECT l_returnflag, MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
        COUNT(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q28_range_source" ->
      """SELECT range AS n, range * range AS sq FROM range(1, 101) ORDER BY n""",
    "q29_join_inner" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q30_groupby_multi" ->
      """SELECT user_id, event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"""
  )
}
