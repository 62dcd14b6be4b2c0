package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Catalyst prune the projections away), and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Overlap queries with a small driver pool (the engine's concurrent-
    // jobs capability — the same overlap the micro-batch runtime uses for
    // batches): small queries fill scheduler gaps left by large ones.
    // value = wall-clock of the whole run; per-query numbers are measured
    // under that concurrency.
    val lanes = sys.env.getOrElse("SPARK_GRAFT_BENCH_LANES", "6").toInt
    val wall0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(lanes)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> pool.submit(new java.util.concurrent.Callable[Double] {
        def call(): Double = {
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
      })
    }.map { case (name, fut) => name -> fut.get() }
    pool.shutdown()
    val wall = (System.nanoTime() - wall0) / 1e9
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sum = results.map(_._2).sum
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"sum_sec":$sum,"lanes":$lanes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
