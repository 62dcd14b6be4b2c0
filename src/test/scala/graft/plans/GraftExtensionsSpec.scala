package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HexExpressions._

/** SparkSessionExtensions integration: the hex roundtrip rule fires in
  * the optimized plan and the rewritten query stays correct. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    // force a NEW session so withExtensions applies (getOrCreate would
    // silently return a peer suite's session without the extensions)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .appName("graft-extensions-spec")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("decode(encode(n)) roundtrip is eliminated from the optimized plan") {
    import spark.implicits._
    val df = spark.range(1, 100).toDF("n")
      .select($"n", evmHexDecodeLongN(evmHexEncodeQuantityN($"n")).as("rt"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("evm_hex_decode"),
      s"roundtrip should be eliminated, got:\n$optimized")
    // and the result is still the identity
    assert(df.filter($"rt" =!= $"n").count() == 0)
  }

  test("decode(encode(bytes)) roundtrip is eliminated") {
    import spark.implicits._
    val df = spark.range(1, 50).toDF("n")
      .select($"n", evmHexDecodeN(evmHexEncodeN($"n".cast("string").cast("binary"))).as("rt"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("evm_hex_decode"))
    assert(df.filter($"rt".cast("string") =!= $"n".cast("string")).count() == 0)
  }

  test("a session WITHOUT the extensions keeps the expressions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val plain = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .appName("graft-no-extensions").getOrCreate()
    import plain.implicits._
    val df = plain.range(1, 10).toDF("n")
      .select(evmHexDecodeLongN(evmHexEncodeQuantityN($"n")).as("rt"))
    assert(df.queryExecution.optimizedPlan.toString.contains("evm_hex_decode"))
    assert(df.filter($"rt" <= 0).count() == 0)
  }
}
