package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-scale-up generator: writes a `factor`x copy of a testdata dir as
  * `factor` DISJOINT key universes — every foreign-key relationship is
  * shifted consistently (universe i's lineitem rows reference universe
  * i's orders/parts/suppliers), so join cardinalities and group sizes
  * grow linearly the way a real TPC-H scale-up does, never
  * quadratically the way naive row duplication would.
  *
  * Text/vector universes are GENUINELY distinct, not near-copies:
  * every token in universe i>0 gets an `_ui` suffix (so each universe
  * reproduces the source's internal dup structure over a disjoint
  * vocabulary — the dup RATE stays constant, exactly like a real
  * larger corpus) and every embedding goes through a per-universe
  * DIMENSION PERMUTATION — a rotation, so norms and every
  * within-universe pairwise cosine are MATHEMATICALLY preserved (the
  * permutation reorders the float summation, so computed values can
  * differ in the last ulp — do not pin goldens against ScaleUp output
  * expecting bit-identical cosines; near-threshold LSH/dup pairs could
  * flip under an exactness gate, though GrowthBench only times) while
  * cross-universe cosines scatter to noise. Two rejected designs, kept
  * as a warning: appending ONE universe token per document (and
  * nudging one embedding dim by 1e-3) manufactured 9 near-duplicates
  * of everything and made the LSH pair operators read quadratic (t38
  * 34.9x at 10x data) purely from the 50x-inflated dup rate; a shared
  * Gaussian OFFSET per universe added a common direction to every
  * vector in the universe and pushed within-universe cosines over the
  * dup thresholds (s46/s48 ~33x) — only a rotation leaves the dup
  * rate untouched. Events keep their timestamps — users are disjoint,
  * so per-user sequences are unchanged.
  *
  * Usage: ScaleUp <srcDir> <outDir> [factor=10]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1gen")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def table(name: String): DataFrame =
      if (name == "events") {
        // keep ts as the raw nanos long; rewriting it unchanged keeps
        // the Util.t read path (nanosAsLong + div 1000) identical
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$src/$name.parquet")
      } else spark.read.parquet(s"$src/$name.parquet")

    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

    // key spans probed once from the source so every table shifts by
    // the same stride per universe
    val custS = span(table("customer"), "c_custkey")
    val suppS = span(table("supplier"), "s_suppkey")
    val partS = span(table("part"), "p_partkey")
    val orderS = span(table("orders"), "o_orderkey")
    val eventS = span(table("events"), "event_id")
    val userS = span(table("events"), "user_id")
    val docS = span(table("documents"), "doc_id")
    val vecS = span(table("embeddings"), "vec_id")

    def scaled(name: String)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = table(name)
      val all = (0 until factor).map(i => copy(base, i)).reduce(_.unionByName(_))
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> ${factor}x")
    }

    def shift(df: DataFrame, keys: (String, Long)*)(i: Int): DataFrame =
      keys.foldLeft(df) { case (d, (k, s)) =>
        d.withColumn(k, (col(k) + lit(i * s)).cast(d.schema(k).dataType))
      }

    // fixed dims copy once, not factor times (region/nation are lookup
    // tables every universe shares — scaling them would break the
    // foreign keys from customer/supplier)
    Seq("region", "nation").foreach { name =>
      table(name).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> 1x (shared dim)")
    }
    scaled("customer")((df, i) => shift(df, "c_custkey" -> custS)(i))
    scaled("supplier")((df, i) => shift(df, "s_suppkey" -> suppS)(i))
    scaled("part")((df, i) => shift(df, "p_partkey" -> partS)(i))
    scaled("orders")((df, i) =>
      shift(df, "o_orderkey" -> orderS, "o_custkey" -> custS)(i))
    scaled("lineitem")((df, i) =>
      shift(df, "l_orderkey" -> orderS, "l_partkey" -> partS,
        "l_suppkey" -> suppS)(i))
    scaled("events")((df, i) =>
      shift(df, "event_id" -> eventS, "user_id" -> userS)(i))
    scaled("documents") { (df, i) =>
      val s = shift(df, "doc_id" -> docS)(i)
      if (i == 0) s
      else s.withColumn("text",
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit(s"_u$i"))), " "))
    }
    scaled("embeddings") { (df, i) =>
      val s = shift(df, "vec_id" -> vecS)(i)
      if (i == 0) s
      else {
        val perm = {
          val idx = scala.collection.mutable.ArrayBuffer.range(1, 65)
          val rnd = new java.util.Random(7700 + i)
          // Fisher-Yates — deterministic per universe
          for (j <- idx.indices.reverse; k = rnd.nextInt(j + 1))
            { val t = idx(j); idx(j) = idx(k); idx(k) = t }
          idx.toArray
        }
        s.withColumn("embedding",
          array(perm.map(p => element_at(col("embedding"), p)): _*))
      }
    }
    spark.stop()
  }
}
