package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / vector similarity operators over an
  * embedding column (array<float>).
  *
  * Numeric determinism: dot products are computed as a left-to-right
  * fold of float-by-float products widened to double. float*float is
  * exact in double (24+24 mantissa bits < 53), and a fixed fold order
  * makes the sum bit-stable — so results can be hash-compared against
  * an oracle computing the same fold. Emitted cosines are rounded to 6
  * decimals to absorb any remaining last-bit noise.
  */
object Similarity {

  /** Left-to-right double fold of sum(a[i]*b[i]). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: every query row against every corpus row.
    * The query side is broadcast (small), so the corpus scan stays
    * pipelined with no shuffle — the correct baseline at any scale where
    * queries are few; for corpus-x-corpus use `cosineLshBuckets`. */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, via the
    * shingle-free all-pairs join (corpus must be modest) — exact. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Sign-random-projection (hyperplane) LSH bucket key: `nBits` signs of
    * dot(v, plane_j), planes drawn from a seeded RNG on the driver and
    * broadcast as literals — deterministic across runs and cluster sizes.
    * Same-bucket vectors are cosine-close with high probability; at scale
    * this is the corpus-x-corpus candidate generator (shuffle on the
    * bucket key replaces the quadratic cross join). */
  def srpBucket(vec: Column, dim: Int, nBits: Int = 16, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    val bits = (0 until nBits).map { j =>
      val dot = (0 until dim).map(i =>
        element_at(vec, i + 1).cast("double") * lit(planes(j)(i))).reduce(_ + _)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN top-k restricted to same-SRP-bucket candidates (the scale path;
    * recall < 1 by design, traded for a bucket-local join). */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bq = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      srpBucket(col(vecCol), dim, nBits).as("bucket"))
    val bc = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      srpBucket(col(vecCol), dim, nBits).as("bucket"))
    val scored = bc.join(broadcast(bq), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
