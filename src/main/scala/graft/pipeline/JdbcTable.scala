package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** JDBC-backed sink/source — `remote()` engine parity (reference:
  * `examples/ethereum_blocks/create_remote_table.sql:1-7`,
  * `internal/engine/impl/remote/remote_engine.go:10-45`). The reference
  * can point a pipeline at a genuinely remote warehouse table instead
  * of native storage; [[SinkTable]] maps that to parquet paths (right
  * for the native-storage design), and this variant keeps the SAME
  * contract against any JDBC database via Spark's jdbc source:
  * append-only writes carrying a monotonic `_ingest_seq`,
  * last-write-wins dedup on read over the order keys, and a max-key
  * resume probe — so re-runs stay effectively-once end to end.
  *
  * Scale shape: `readRawPartitioned` fans the scan out over
  * `numPartitions` range predicates on a numeric key (Spark's ranged
  * JDBC read), and `exists`/`maxKey`/the sequence base push 1-row
  * aggregates INTO the database instead of pulling the table over the
  * wire. Writes go through Spark's batched JDBC insert with the
  * DataFrame's own parallelism.
  *
  * Connection options (driver class, user, password) ride in
  * `connProps` — the (host, database, table, user, password) argument
  * list of the reference's `remote()` maps onto (url, table,
  * connProps).
  */
final case class JdbcTable(
    url: String,
    table: String,
    orderKeys: Seq[String],
    connProps: Map[String, String] = Map.empty,
    numPartitions: Int = 8) {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Quote an identifier for interpolation into pushed-down SQL (Spark
    * quotes DataFrame column names when it creates the table, so
    * manual SQL against those columns must quote too).
    *
    * The TABLE name is deliberately NOT quoted anywhere: Spark's own
    * jdbc reader/writer interpolates `dbtable` verbatim into
    * `CREATE TABLE $table` / `SELECT ... FROM $table`, so a
    * case-folding database (Derby, Postgres, ...) stores an unquoted
    * name FOLDED — quoting it here would make the probes miss the very
    * table the Spark paths just wrote. `table` therefore follows
    * Spark's dbtable contract: a SQL fragment passed through verbatim;
    * a mixed-case or reserved-word name must arrive pre-quoted and
    * then works identically in the Spark paths and these probes. */
  private def q(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  /** DriverManager-based probes need the driver registered: Spark's
    * read/write honors a `driver` connection property via its own
    * registry, but raw `DriverManager.getConnection` only sees drivers
    * that self-register through ServiceLoader — load the class
    * explicitly so both paths accept the same connProps. */
  private def loadDriver(): Unit =
    connProps.get("driver").foreach(Class.forName(_))

  /** Run `sql` as a pushed-down derived table (1-row aggregates stay
    * in the database). */
  private def pushdown(spark: SparkSession, sql: String): DataFrame =
    spark.read.jdbc(url, s"($sql) pushq", props)

  /** Table-existence probe via JDBC metadata (no scan, no exception
    * control flow). Checks the name as-given and uppercased — databases
    * that fold unquoted identifiers store Spark-created names verbatim,
    * but manual DDL may have folded. */
  def exists(spark: SparkSession): Boolean = {
    loadDriver()
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      def found(n: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, n, null)
        try rs.next() finally rs.close()
      }
      found(table) || found(table.toUpperCase(java.util.Locale.ROOT))
    } finally conn.close()
  }

  /** First-append-of-this-run base for `_ingest_seq` — same contract
    * as [[SinkTable]]: max existing seq + 1, so a re-ingest of an old
    * key range wins last-write-wins over the prior run. */
  @volatile private var seqBase: Long = -1L
  private def sequenceBase(spark: SparkSession): Long = {
    if (seqBase < 0L) synchronized {
      if (seqBase < 0L)
        seqBase =
          if (!exists(spark)) 0L
          else {
            val row = pushdown(spark,
              s"SELECT MAX(${q("_ingest_seq")}) AS mk FROM $table").head()
            if (row.isNullAt(0)) 0L else row.get(0).asInstanceOf[Number].longValue + 1L
          }
    }
    seqBase
  }

  /** Append one batch (idempotent under re-runs thanks to read-side
    * dedup). Spark creates the table on first append. */
  def append(df: DataFrame, ingestSeq: Long): Unit =
    df.withColumn("_ingest_seq",
        lit(sequenceBase(df.sparkSession) + ingestSeq))
      .write.mode("append").jdbc(url, table, props)

  /** Raw append-only contents (may contain superseded versions). */
  def readRaw(spark: SparkSession): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Raw contents fetched in parallel over `numPartitions` range
    * predicates on numeric `partCol` — the scan shape a big remote
    * table needs (a single-connection read serializes the wire). */
  def readRawPartitioned(spark: SparkSession, partCol: String): DataFrame = {
    val bounds = pushdown(spark,
      s"SELECT MIN(${q(partCol)}) AS lo, MAX(${q(partCol)}) AS hi FROM $table").head()
    if (bounds.isNullAt(0)) readRaw(spark)
    else spark.read.jdbc(url, table, q(partCol),
      bounds.get(0).asInstanceOf[Number].longValue,
      bounds.get(1).asInstanceOf[Number].longValue + 1L,
      numPartitions, props)
  }

  /** Dedup-on-read view: latest `_ingest_seq` wins per order key. */
  def read(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(orderKeys.map(col): _*)
      .orderBy(col("_ingest_seq").desc)
    readRaw(spark).withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_ingest_seq")
  }

  /** Resume probe: max(keyCol) pushed into the database, None when the
    * table is absent or empty — the `start.sql` contract. */
  def maxKey(spark: SparkSession, keyCol: String): Option[Long] = {
    if (!exists(spark)) return None
    val row = pushdown(spark,
      s"SELECT MAX(${q(keyCol)}) AS mk FROM $table").head()
    if (row.isNullAt(0)) None
    else Some(row.get(0).asInstanceOf[Number].longValue)
  }
}
