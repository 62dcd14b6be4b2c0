package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("listener records output rows and elapsed per action") {
    val l = Metrics.register(spark)
    assert(Metrics.register(spark) eq l, "registration is idempotent")
    val before = l.completed.size()
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy("o_orderstatus").count()
    df.collect()
    // listener callbacks are async — poll for delivery
    val deadline = System.currentTimeMillis() + 10000
    while (l.completed.size() <= before && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val metas = Metrics.snapshot(spark).drop(before)
    assert(metas.nonEmpty)
    assert(metas.exists(m => m.outputRows > 0 && m.elapsedMs >= 0), metas.toString)
  }

  test("throughput summary formats the finalizer metric") {
    val s = Metrics.throughput(PipelineRunner.Result(3, 300, 2.0))
    assert(s.contains("3 batches"))
    assert(s.contains("150.0 items/s"))
  }
}
