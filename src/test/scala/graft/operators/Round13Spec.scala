package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-13: public-suffix-table registered domains (the data-driven
  * form the round-12 verdict asked for) and friends. */
class Round13Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("urlDomainCapPsl registers one level below a multi-label public suffix; heuristic mis-groups") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://news.alpha.co.uk/a"),
      (2L, "http://Blog.Beta.CO.UK/b"),      // case noise on a PSL host
      (3L, "http://deep.sub.gamma.co.uk/c"), // >3 labels: still 3-label registration
      (4L, "http://delta.co.jp/d"),          // registrant directly under suffix
      (5L, "http://www.epsilon.com/e"),      // www stripped, gTLD: heuristic exact
      (6L, "http://cdn.zeta.org/f"),         // gTLD with subdomain
      (7L, "http://co.uk/g"),                // bare suffix host: keeps the suffix
      (8L, "http://eta.com.au/h")
    ).toDF("doc_id", "url")
    val out = TextAnalysis.urlDomainCapPsl(s, docs, "doc_id", "url", cap = 2)
      .orderBy("doc_id").collect()
    val domain = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    val domainH = out.map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(domain(1L) == "alpha.co.uk" && domainH(1L) == "co.uk")
    assert(domain(2L) == "beta.co.uk")
    assert(domain(3L) == "gamma.co.uk")
    assert(domain(4L) == "delta.co.jp" && domainH(4L) == "co.jp")
    assert(domain(5L) == "epsilon.com" && domainH(5L) == "epsilon.com")
    assert(domain(6L) == "zeta.org" && domainH(6L) == "zeta.org")
    assert(domain(7L) == "co.uk")
    assert(domain(8L) == "eta.com.au" && domainH(8L) == "com.au")
    // the provable mis-group: four distinct registrants under co.uk
    // collapse into ONE heuristic domain, so cap=2 throttles two of
    // them heuristically while the table form keeps all four
    val coUk = out.filter(r => Set(1L, 2L, 3L, 7L)(r.getLong(0)))
    assert(coUk.forall(_.getString(5) == "co.uk"))
    assert(coUk.map(_.getString(2)).distinct.length == 4)
    assert(coUk.count(_.getBoolean(7)) == 2)  // kept_h: only cap=2 survive
    assert(coUk.forall(_.getBoolean(4)))      // kept (PSL): all 4 survive
  }

  /** Blob masters + CROP x ROTATE x SQUEEZE compound probes (the
    * class the round-12 verdict named the top user-hittable recall
    * gap): central 75% crop, then 17-degree rotation, then a 1.4:1
    * x-squeeze — all three factors unknown to the dedup. */
  private def cropAffineMedia(nMasters: Int, deg: Double = 17.0,
      sq: Double = 1.4): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    // richer-structure masters than the plain 128px blob fixtures
    // (24 blobs on a 256 canvas, same safe minSep): the compound
    // probe loses border peaks to the crop, the rotation's corner
    // clip, AND the detector margin — a corpus with only 10 peaks
    // leaves too few for 5-point rot codes
    def blobs(seed: Long) =
      Multimodal.syntheticPngBlobs(seed, 256, 256, nBlobs = 24, minSep = 22.0)
    val rows =
      (0 until nMasters).map(i => (i.toLong, blobs(i.toLong))) ++
      (0 until nMasters).map { i =>
        // crop to the central 75% RE-RENDERED at source size (how a
        // real crop re-upload ships), then rotate, then squeeze
        val crop = Multimodal.pngCropResize(blobs(i.toLong),
          32, 32, 224, 224, 256, 256)
        val rot = Multimodal.pngRotateResize(crop, deg)
        (100L + i, Multimodal.pngCropResize(rot, 0, 0, 256, 256,
          math.round(256 / sq).toInt, 256))
      } ++
      (0 until nMasters).map(i => (200L + i, blobs(1000L + i)))
    rows.toDF("doc_id", "payload")
  }

  test("m174 kernel: crop x rot x squeeze lands under LOCAL whitening; m169 and the crop ladder are blind") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val media = cropAffineMedia(10)
    // the oriented scorer can match one pair under several residual
    // hypotheses — count DISTINCT pairs
    def planted(df: org.apache.spark.sql.DataFrame): Long =
      df.filter($"doc_b" - $"doc_a" === 100 && $"doc_b" < 200)
        .select($"doc_a", $"doc_b").distinct().count()
    val frames = planted(
      Multimodal.imageAffineFramePairs(media))
    val global = planted(
      Multimodal.imageScalePairsAffine(media, minMatch = 0.2))
    val crop = planted(
      Multimodal.imageScalePairs(media, minMatch = 0.2))
    info(s"frames=$frames global=$global cropLadder=$crop of 10")
    assert(frames >= 8, s"affine-frame recall too low: $frames/10")
    assert(global <= 2, s"m169 should be (mostly) blind here, got $global")
    assert(crop <= 2, s"crop ladder should be (mostly) blind here, got $crop")
    // no spurious pairs against the 10 fresh decoys
    val spurious = Multimodal.imageAffineFramePairs(media)
      .filter($"doc_b" >= 200 || ($"doc_b" - $"doc_a" =!= 100))
      .select($"doc_a", $"doc_b").distinct().count()
    assert(spurious == 0, s"spurious pairs: $spurious")
  }

  test("urlDomainCapPsl broadcasts the suffix table (no shuffle added by the join)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "http://a.b.co.uk/x")).toDF("doc_id", "url")
    val plan = TextAnalysis.urlDomainCapPsl(s, docs, "doc_id", "url", cap = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"suffix join must broadcast, got:\n$plan")
  }
}
