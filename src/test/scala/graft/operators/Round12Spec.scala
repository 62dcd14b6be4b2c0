package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-12: the PHASE-INSENSITIVE chroma tier (candidate+verify) —
  * TRUE (envelope-preserving) pitch shifts on METRONOMIC audio, the
  * one measured recall gap round 11 pinned (m158 analysis: 2/10
  * survival for single-window chroma codes under inter-tone phase
  * scrambling). */
class Round12Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Metronomic masters (8 kHz, uniform 96 ms segments) plus probe
    * classes: ids 20-29 TRUE-pitch-shift one semitone of id-20
    * (pitchNum/pitchDen — tone frequencies scale, envelope times do
    * not), ids 40-49 the stretch+pitch COMPOUND (5% speed AND a
    * further true semitone) of id-40, ids 128+ fresh decoys. All
    * probes trimmed 50 ms and muxed at 44.1 kHz. */
  private def media(masters: Seq[Long], pitched: Seq[Long],
      compound: Seq[Long], decoys: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    val rows =
      masters.map(id => (id, Multimodal.syntheticWavBeats(id, 8000,
        ms = 1248, uniformSegMs = 96))) ++
      pitched.map(id => (id, Multimodal.syntheticWavBeats(id - 20, 44100,
        ms = 1000, offsetMs = 50, pitchNum = 196, pitchDen = 185,
        uniformSegMs = 96))) ++
      compound.map(id => (id, Multimodal.syntheticWavBeats(id - 40, 44100,
        ms = 1000, offsetMs = 50, speedNum = 21, speedDen = 20,
        pitchNum = 196, pitchDen = 185, uniformSegMs = 96))) ++
      decoys.map(id => (id, Multimodal.syntheticWavBeats(id, 44100,
        ms = 1000, uniformSegMs = 96)))
    rows.toDF("doc_id", "payload")
  }

  test("single-window chroma tier MISSES most true-pitch metronomic re-uploads (the m158 gap, pinned as contrast)") {
    implicit val s: SparkSession = spark
    val m = media(0L until 10L, 20L until 30L, Nil, Nil)
    val pairs = Multimodal.audioChromaLandmarkPairs(m, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = (0L until 10L).count(id => pairs((id, id + 20)))
    info(s"single-window tier catches $caught/10 true-pitch pairs")
    assert(caught <= 4,
      s"single-window codes should remain broken on TRUE pitch (got $caught/10) — " +
        "if this now passes, the m158 contrast gate needs re-pinning")
  }

  test("verified chroma tier catches ALL true-pitch AND compound re-uploads, no false pairs (m159)") {
    implicit val s: SparkSession = spark
    val m = media(0L until 10L, 20L until 30L, 40L until 50L,
      Seq(128L, 129L, 130L, 131L))
    val got = Multimodal.audioChromaVerifiedPairs(m)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val pitchCaught = (0L until 10L).count(id => got.contains((id, id + 20)))
    val compCaught = (0L until 10L).count(id => got.contains((id, id + 40)))
    info(s"pitch caught: $pitchCaught/10, compound caught: $compCaught/10")
    info(s"all pairs: ${got.toSeq.sortBy(_._1).mkString(" ")}")
    assert(pitchCaught == 10, s"pitch pairs missed: $got")
    assert(compCaught == 10, s"compound pairs missed: $got")
    val expected = (0L until 10L).flatMap(id =>
      Seq((id, id + 20), (id, id + 40), (id + 20, id + 40))).toSet
    val falsePairs = got.keySet -- expected
    assert(falsePairs.isEmpty, s"false pairs: $falsePairs")
  }

  test("verified chroma tier still covers the SPEED-rendition class (m124 fixture shape)") {
    implicit val s: SparkSession = spark
    val sp = spark
    import sp.implicits._
    val rows =
      (0L until 6L).map(id => (id, Multimodal.syntheticWavBeats(id, 8000,
        ms = 1248, uniformSegMs = 96))) ++
      (20L until 26L).map(id => (id, Multimodal.syntheticWavBeats(id - 20,
        44100, ms = 1000, offsetMs = 50, speedNum = 196, speedDen = 185,
        uniformSegMs = 96)))
    val got = Multimodal.audioChromaVerifiedPairs(rows.toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = (0L until 6L).count(id => got((id, id + 20)))
    info(s"speed-rendition caught: $caught/6")
    assert(caught == 6, s"speed pairs missed: $got")
  }

  test("moment-normalized tier lands OFF-FAN squeezes the default aspect fan provably misses (m160)") {
    implicit val s: SparkSession = spark
    val sp = spark
    import sp.implicits._
    // 1.196:1 squeeze (outW 107) and 1.164:1 widen (outW 149) — both
    // > 10% from every default hypothesis {1.0, 0.75, 4/3}
    val rows =
      (0L until 8L).map(id => (id, Multimodal.syntheticPngBlobs(id))) ++
      Seq(20L -> 107, 21L -> 107, 22L -> 149, 23L -> 149).map {
        case (id, w) => (id, Multimodal.pngCropResize(
          Multimodal.syntheticPngBlobs(id - 20), 0, 0, 128, 128, w, 128))
      } ++
      (140L until 142L).map(id => (id, Multimodal.syntheticPngBlobs(id)))
    val m = rows.toDF("doc_id", "payload")
    val fan = Multimodal.imageScalePairsAspect(m, minMatch = 0.3, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fanCaught = (0L until 4L).count(id => fan((id, id + 20)))
    info(s"default fan catches $fanCaught/4 off-fan squeezes (the contrast gate)")
    assert(fanCaught == 0,
      s"default fan should miss off-fan factors; if it now catches, " +
        s"the m160 contrast factors need re-picking: $fan")
    val norm = Multimodal.imageScalePairsNormalized(m, minMatch = 0.3,
        maxDf = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val caught = (0L until 4L).count(id => norm.contains((id, id + 20)))
    info(s"normalized tier: $caught/4, pairs: ${norm.toSeq.sortBy(_._1)}")
    assert(caught == 4, s"normalized tier missed off-fan squeezes: $norm")
    val falsePairs = norm.keySet.filterNot { case (a, b) => b - a == 20 && a < 4 }
    assert(falsePairs.isEmpty, s"false pairs: $falsePairs")
  }

  test("structureless-texture scope line is measured, not asserted (m161)") {
    def tex(id: Long) = Multimodal.syntheticPngTexture(id, 64, 64)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (id <- 0L until 4L) {
      val m = Multimodal.pHash64(tex(id)).get
      // unresized re-encode: pHash owns it
      assert(ham(m, Multimodal.pHash64(
        Multimodal.jpegReencode(tex(id), 0.95f)).get) <= 3)
      // integer-ratio upsample (64->96 = exact 3x box at the 32 grid):
      // pHash ALSO owns it — the positive half of the scope line
      assert(ham(m, Multimodal.pHash64(Multimodal.pngCropResize(
        tex(id), 0, 0, 64, 64, 96, 96)).get) <= 3)
      // non-integer resample (64->80): aliased wholesale — the gap
      assert(ham(m, Multimodal.pHash64(Multimodal.pngCropResize(
        tex(id), 0, 0, 64, 64, 80, 80)).get) > 3,
        s"id=$id: 64->80 resample unexpectedly inside maxDist — " +
          "the m161 scope line would be stale")
    }
  }

  test("folds=1 keeps chromaCodeAt bit-exact legacy behavior") {
    val mono = Multimodal.monoMix(Multimodal.decodeWav(
      Multimodal.syntheticWavBeats(3L, 8000, ms = 1248,
        uniformSegMs = 96)).get)
    Multimodal.energyOnsets(mono, 8000, 1024, 8).foreach { o =>
      assert(Multimodal.chromaCodeAt(mono, 8000, o, 12, 12) ==
        Multimodal.chromaCodeAt(mono, 8000, o, 12, 12, folds = 1))
    }
  }
}
