package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch phase profiler for s46 — not part of the driver contract. */
object ProfileS46 {
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
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def time(name: String)(body: => Unit): Unit = {
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        body
        println(f"[prof] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("count")(emb.count())
    time("full")(Similarity.cosineDupPairsLsh(emb, 0.4, dim = 64)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
