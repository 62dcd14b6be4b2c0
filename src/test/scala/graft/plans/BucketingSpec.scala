package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the pre-partitioning story SCALE.md
  * promises: writing both sides bucketed on the join key lets the
  * sort-merge join read bucket-aligned splits directly, eliminating
  * BOTH shuffle exchanges. At 100 TB this is the difference between a
  * fact-fact join that moves the whole table over the network every
  * query and one that moves nothing — bucketing is decided once at
  * write time. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed join plans with ZERO exchanges; plain parquet join shuffles") {
    val s = spark
    import s.implicits._
    // recursive delete in the finally below — File.deleteOnExit cannot
    // remove a non-empty directory, and DROP TABLE on path-based
    // external tables leaves the data files behind
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed")
    // broadcast off + AQE off so the comparison is SMJ vs SMJ and the
    // executedPlan is final at explain time
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = (0L until 10000L).map(i => (i, s"l$i")).toDF("k", "lv")
      val right = (0L until 10000L by 2).map(i => (i, s"r$i")).toDF("k", "rv")
      left.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/left").mode("overwrite").saveAsTable("bkt_left")
      right.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/right").mode("overwrite").saveAsTable("bkt_right")

      val bucketed = s.table("bkt_left").join(s.table("bkt_right"), "k")
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")
      assert(bucketed.count() == 5000)

      left.write.mode("overwrite").parquet(s"$dir/pl")
      right.write.mode("overwrite").parquet(s"$dir/pr")
      val plain = s.read.parquet(s"$dir/pl")
        .join(s.read.parquet(s"$dir/pr"), "k")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "plain join should shuffle — contrast case broken")
      assert(plain.count() == 5000)
    } finally {
      s.sql("DROP TABLE IF EXISTS bkt_left")
      s.sql("DROP TABLE IF EXISTS bkt_right")
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.conf.unset("spark.sql.adaptive.enabled")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
