package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 ADVICE regression: q52's regression formulas divide by
  * du/dc moments that are ZERO for degenerate groups (constant user_id
  * or constant value). The NULLIF guards must make Spark (ANSI mode)
  * emit NULL like DuckDB does, not throw DIVIDE_BY_ZERO. */
class Round7QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("q52 regression SQL yields NULLs (not DIVIDE_BY_ZERO) on degenerate groups") {
    import spark.implicits._
    // one group with a single event (du = dc = 0), one with constant
    // user_id (du = 0), one healthy group
    Seq(
      ("single", 7L, 1.25),
      ("constu", 3L, 1.00), ("constu", 3L, 2.00), ("constu", 3L, 3.00),
      ("ok", 1L, 1.00), ("ok", 2L, 2.00), ("ok", 3L, 4.00))
      .toDF("event_type", "user_id", "value")
      .createOrReplaceTempView("events")
    val rows = spark.sql(Relational2.regressionSql)
      .collect().map(r => r.getString(0) ->
        (r.isNullAt(2), r.isNullAt(4), r.isNullAt(5))).toMap
    // corr, slope, intercept are NULL wherever a divisor moment is 0
    assert(rows("single") == ((true, true, true)), "single-event group")
    assert(rows("constu") == ((true, true, true)), "constant-user group")
    assert(rows("ok") == ((false, false, false)), "healthy group")
  }
}
