package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for shuffle joins on hot keys.
  *
  * AQE's skew-join split handles sort-merge joins after the fact; salting
  * is the planned form — spread one hot key over `salt` shuffle
  * partitions by joining on (key, salt) instead of key. The SMALL side is
  * replicated `salt`× (explode over the salt range); the LARGE side gets
  * a deterministic salt derived from its row content, so the rewrite is
  * a pure plan transformation: results are IDENTICAL to the unsalted
  * join (gated by oracle q40), only the shuffle distribution changes.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `salt` ways.
    * `large`'s salt is xxhash64 of its whole row (deterministic, no rand
    * — re-executed tasks land on the same partition); `small` is
    * replicated once per salt value. Inner join only (outer joins would
    * need null-handling on the replicated side). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    val largeSalted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)).cast("int"))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    largeSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }
}
