package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch (Flajolet–Fusy–Gandouet–Meunier
  * 2007) as a custom typed Aggregator with a FULLY PINNED layout:
  * md5-derived 64-bit hash, top-12-bit register index, rho over the
  * remaining 52 bits. Library HLLs have implementation-defined register
  * layouts; pinning hash + layout + fold order makes this one
  * reproducible across partitionings AND replayable bit-for-bit by a
  * SQL oracle (the same property KmvSketch exploits — q49 is the HLL
  * counterpart of q43).
  *
  * State = 4096 byte registers (4 KB, mergeable by elementwise max), so
  * partial aggregation and shuffle volume are O(m) per group regardless
  * of group size — the billion-row distinct-count shape; KMV state is
  * k strings, HLL's is smaller and merge is branch-free.
  *
  * Estimator: alpha_m * m^2 / sum_j 2^-M_j with the linear-counting
  * small-range correction (E <= 2.5m with empty registers -> m*ln(m/V);
  * ln bit-matches DuckDB's libm, the m72/t57 precedent). The
  * large-range correction only matters beyond 2^32/30 distincts and is
  * deliberately omitted on both sides. Fold order is pinned: present
  * registers in index order (left fold from 0.0, the list_sum shape),
  * then all empty registers as one exact integer-valued term.
  */
object HllSketch {
  val P: Int = 12
  val M: Int = 1 << P // 4096 registers

  def alpha: Double = 0.7213 / (1.0 + 1.079 / M.toDouble)

  /** (register index, rho) of one hashed value — top P bits index, rho =
    * leading-zero run of the remaining 52-bit word + 1 (53 for zero). */
  def slot(h: Long): (Int, Int) = {
    val j = (h >>> (64 - P)).toInt
    val w = h & ((1L << (64 - P)) - 1)
    val rho = if (w == 0L) 53 else java.lang.Long.numberOfLeadingZeros(w) - (P - 1)
    (j, rho)
  }

  def estimate(regs: Array[Byte]): Double = {
    var sumPresent = 0.0
    var zeros = 0
    var j = 0
    while (j < M) {
      val r = regs(j)
      if (r == 0) zeros += 1
      else sumPresent += 1.0 / (1L << r).toDouble // exact power of two
      j += 1
    }
    val s = sumPresent + zeros.toDouble
    val e = alpha * M.toDouble * M.toDouble / s
    if (e <= 2.5 * M.toDouble && zeros > 0)
      M.toDouble * math.log(M.toDouble / zeros.toDouble)
    else e
  }

  final case class Buf(regs: Array[Byte])

  final class HllAgg extends Aggregator[String, Buf, Double] {
    @transient private lazy val mdLocal =
      new ThreadLocal[java.security.MessageDigest] {
        override def initialValue(): java.security.MessageDigest =
          java.security.MessageDigest.getInstance("MD5")
      }

    /** First 8 md5 bytes as a big-endian unsigned 64-bit word — the
      * integer the oracle parses from the first 16 hex chars. */
    private def hash64(s: String): Long = {
      val d = mdLocal.get().digest(s.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h
    }

    def zero: Buf = Buf(new Array[Byte](M))
    def reduce(b: Buf, a: String): Buf = {
      if (a != null) {
        val (j, rho) = slot(hash64(a))
        if (rho > b.regs(j)) b.regs(j) = rho.toByte
      }
      b
    }
    def merge(a: Buf, b: Buf): Buf = {
      var j = 0
      while (j < M) {
        if (b.regs(j) > a.regs(j)) a.regs(j) = b.regs(j)
        j += 1
      }
      a
    }
    def finish(b: Buf): Double = estimate(b.regs)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped-API handle: df.groupBy(...).agg(hllDistinct(col)). */
  def hllDistinct: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllAgg, Encoders.STRING)

  /** `hllDistinct` with the raw 4 KB register state as output — the
    * materializable half of sketch ROLLUP: persist per-partition /
    * per-dimension registers once, re-aggregate any slice with
    * `hllMerge` and never rescan the base data (the OLAP-cube use of
    * mergeable sketches). */
  def hllRegisters: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new Aggregator[String, Buf, Array[Byte]] {
        private val inner = new HllAgg
        def zero: Buf = inner.zero
        def reduce(b: Buf, a: String): Buf = inner.reduce(b, a)
        def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
        def finish(b: Buf): Array[Byte] = b.regs
        def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
        def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      }, Encoders.STRING)

  /** Merge previously-materialized register blobs (elementwise max —
    * associative, commutative, idempotent) and finish to the estimate:
    * the re-aggregation half of sketch rollup. */
  def hllMerge: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new Aggregator[Array[Byte], Buf, Double] {
        def zero: Buf = Buf(new Array[Byte](M))
        def reduce(b: Buf, a: Array[Byte]): Buf = {
          if (a != null) {
            require(a.length == M, s"register blob must be $M bytes, got ${a.length}")
            var j = 0
            while (j < M) {
              if (a(j) > b.regs(j)) b.regs(j) = a(j)
              j += 1
            }
          }
          b
        }
        def merge(a: Buf, b: Buf): Buf = {
          var j = 0
          while (j < M) {
            if (b.regs(j) > a.regs(j)) a.regs(j) = b.regs(j)
            j += 1
          }
          a
        }
        def finish(b: Buf): Double = estimate(b.regs)
        def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
        def outputEncoder: Encoder[Double] = Encoders.scalaDouble
      }, Encoders.BINARY)
}
