package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Scratch profiler: count Spark jobs + stages a named query issues —
  * pipeline queries are latency-bound by their sequential tiny-job
  * chains, so the job count IS their cost model. Not driver contract. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(js.stageInfos.size)
      }
    })
    for (name <- args) {
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let listener events drain
      println(f"[jobs] $name ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get}  stages=${stages.get}")
    }
    spark.stop()
  }
}
