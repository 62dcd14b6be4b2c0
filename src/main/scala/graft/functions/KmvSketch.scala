package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a custom typed
  * Aggregator — the "novel sketch as a custom agg function" path from
  * the brief (a TypedColumn/udaf, not a UDF over collected data).
  *
  * State = the k smallest DISTINCT md5 hex hashes seen (bounded: k
  * strings, mergeable, so partial aggregation and shuffle volume are
  * O(k) per group regardless of group size). Estimate = (k-1) / u(kth)
  * where u maps the kth-smallest hash to (0,1) via its first 52 bits —
  * every step exact in doubles, so the estimate is REPRODUCIBLE across
  * partitionings and engines (unlike HLL, whose register layout is
  * implementation-defined); a DuckDB oracle can replay it exactly.
  * Groups with fewer than k distinct values return the exact count.
  */
object KmvSketch {

  final case class Buf(hashes: List[String])

  /** First 52 bits of the hex hash as a uniform in (0, 1]. */
  def uniform(hex: String): Double =
    java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble / 4503599627370496.0

  def estimate(hashes: List[String], k: Int): Double =
    if (hashes.size < k) hashes.size.toDouble
    else (k - 1).toDouble / uniform(hashes.last)

  final class KmvAgg(k: Int) extends Aggregator[String, Buf, Double] {
    @transient private lazy val mdLocal =
      new ThreadLocal[java.security.MessageDigest] {
        override def initialValue(): java.security.MessageDigest =
          java.security.MessageDigest.getInstance("MD5")
      }
    private val hexChars = "0123456789abcdef".toCharArray

    private def md5hex(s: String): String = {
      val d = mdLocal.get().digest(s.getBytes("UTF-8"))
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = hexChars((d(i) >> 4) & 0xf)
        out(2 * i + 1) = hexChars(d(i) & 0xf)
        i += 1
      }
      new String(out)
    }

    private def insert(b: Buf, h: String): Buf =
      // fast reject: once the sketch is full, almost every hash sorts
      // after the kth minimum — O(1) amortized instead of sort-per-row
      if (b.hashes.size >= k && h >= b.hashes.last) b
      else if (b.hashes.contains(h)) b
      else Buf(((h :: b.hashes).sorted).take(k))

    def zero: Buf = Buf(Nil)
    def reduce(b: Buf, a: String): Buf = if (a == null) b else insert(b, md5hex(a))
    def merge(a: Buf, b: Buf): Buf = {
      val merged = (a.hashes ++ b.hashes).distinct.sorted
      Buf(if (merged.size > k) merged.take(k) else merged)
    }
    def finish(b: Buf): Double = estimate(b.hashes, k)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped-API handle: df.groupBy(...).agg(kmvDistinct(64)(col)). */
  def kmvDistinct(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k), Encoders.STRING)
}
