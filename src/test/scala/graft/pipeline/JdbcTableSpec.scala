package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `remote()` parity against an embedded Derby database (the JDBC
  * engine on the Spark classpath): the SinkTable contract — appends
  * carrying `_ingest_seq`, last-write-wins read, max-key resume —
  * exercised end-to-end through Spark's jdbc source against a real
  * external-warehouse table. */
class JdbcTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val home =
    java.nio.file.Files.createTempDirectory("derby-home").toString
  // derby.log and relative database names land under derby.system.home
  System.setProperty("derby.system.home", home)

  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  override def afterAll(): Unit = spark.stop()

  test("append/read/maxKey/resume round-trip through embedded Derby") {
    import spark.implicits._
    val url = "jdbc:derby:db1;create=true"
    val sink = JdbcTable(url, "blocks", Seq("number"), props)

    assert(!sink.exists(spark))
    assert(sink.maxKey(spark, "number").isEmpty)

    // run 1: two batches with overlapping keys — the later batch's
    // higher _ingest_seq must win on read
    sink.append((0L until 10L).map(n => (n, n * 10)).toDF("number", "v"), 0L)
    sink.append((5L until 15L).map(n => (n, n * 100)).toDF("number", "v"), 1L)
    assert(sink.exists(spark))
    assert(sink.maxKey(spark, "number").contains(14L))

    // run 2 (fresh instance = fresh sequence base): re-ingest of an old
    // key range must supersede run 1 (the forceStart contract)
    val rerun = JdbcTable(url, "blocks", Seq("number"), props)
    rerun.append((0L until 5L).map(n => (n, n * 1000)).toDF("number", "v"), 0L)

    val got = rerun.read(spark).as[(Long, Long)].collect().toMap
    assert(got.size == 15)
    (0L until 5L).foreach(n => assert(got(n) == n * 1000, s"key $n"))
    (5L until 15L).foreach(n => assert(got(n) == n * 100, s"key $n"))
  }

  test("partitioned raw read fans out over key ranges and loses nothing") {
    import spark.implicits._
    val url = "jdbc:derby:db2;create=true"
    val sink = JdbcTable(url, "events", Seq("number"), props, numPartitions = 4)
    sink.append((0L until 100L).map(n => (n, n % 7)).toDF("number", "v"), 0L)

    val part = sink.readRawPartitioned(spark, "number")
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    assert(part.select("number").as[Long].collect().sorted.toSeq ==
      (0L until 100L))
  }

  test("partitioned read of an empty table degrades to a plain read") {
    import spark.implicits._
    val url = "jdbc:derby:db3;create=true"
    val sink = JdbcTable(url, "empty_t", Seq("number"), props)
    // create the table with zero rows, then read it ranged
    Seq.empty[(Long, Long)].toDF("number", "v")
      .write.mode("append").jdbc(url, "empty_t", {
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        p
      })
    assert(sink.readRawPartitioned(spark, "number").count() == 0)
    assert(sink.maxKey(spark, "number").isEmpty)
  }
}
