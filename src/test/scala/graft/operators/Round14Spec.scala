package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-14: the hot-code posting backstop, the verified affine-frame
  * tier's video/chiral members, the de-squeeze hypothesis fan, and
  * full public-suffix-list semantics. */
class Round14Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("auto posting cap drops a planted hot code, logs the count, keeps benign pairs") {
    val s = spark
    import s.implicits._
    implicit val sp: SparkSession = s
    // 10 byte-identical copies of image X: every X code's df = 10.
    // 2 copies of image Y: every Y code's df = 2 (the benign dup).
    // With the auto cap lowered under 10, ALL X codes are hot ->
    // dropped; without the cap the scorer would explode 45 X pairs.
    val media = s.range(0, 12).map { id =>
      val payload =
        if (id < 10) Multimodal.syntheticPng(0L)
        else Multimodal.syntheticPng(999L)
      (id, payload)
    }.toDF("doc_id", "payload")
    val acc = Multimodal.hotCodesDropped(s)
    val before = acc.value
    val saved = Multimodal.hotCodeAutoCap
    Multimodal.hotCodeAutoCap = 8
    try {
      // maxDf = 0 -> the AUTO cap path (the previously unguarded seam)
      val pairs = Multimodal.imagePeakPairs(media, minMatch = 0.6)
        .orderBy("doc_a", "doc_b").collect()
      assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((10L, 11L)),
        s"expected only the benign pair, got ${pairs.mkString(", ")}")
      assert(acc.value > before, "dropped hot codes must be counted")
      // an EXPLICIT maxDf above the plant keeps the hot code: the
      // auto cap must never override a caller's deliberate choice
      val uncapped = Multimodal.imagePeakPairs(media, minMatch = 0.6,
        maxDf = 64).count()
      assert(uncapped == 45 + 1, s"explicit maxDf=64 must keep all " +
        s"pairs (45 hot + 1 benign), got $uncapped")
    } finally Multimodal.hotCodeAutoCap = saved
  }
}
