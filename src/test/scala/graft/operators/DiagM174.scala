package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Scratch diagnostics for the m174 affine-frame kernel (not part of
  * the gate — prints internals). */
class DiagM174 extends AnyFunSuite {
  private def blobs(seed: Long) =
    Multimodal.syntheticPngBlobs(seed, 256, 256, nBlobs = 24, minSep = 22.0)
  private def img(p: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
  private def cells(im: java.awt.image.BufferedImage) =
    Multimodal.coarsePeakCells(Multimodal.lumaPlane(im),
      im.getWidth, im.getHeight, 4, 6, 24)
  private var qStepDiag = 0.25
  private def codesOf(cs: scala.collection.Seq[(Int, Int, Int)]) =
    Multimodal.affineFrameCodes(cs, 48, 8, 4, qStepDiag).toSet
  private def codes(p: Array[Byte]) = codesOf(cells(img(p)))

  test("m174 diag8: qStep sensitivity") {
    for (q <- Seq(0.2, 0.3, 0.4)) {
      qStepDiag = q
      var worst = (1.0, 0)
      var decMax = 0
      for (i <- 0 until 6) {
        val master = blobs(i.toLong)
        val crop = Multimodal.pngCropResize(master, 32, 32, 224, 224, 256, 256)
        val rot = Multimodal.pngRotateResize(crop, 17.0)
        val sq = Multimodal.pngCropResize(rot, 0, 0, 256, 256, 183, 256)
        val sm = codes(master); val sp = codes(sq)
        val inter = (sm intersect sp).size
        val frac = inter.toDouble / math.min(sm.size, sp.size)
        if (frac < worst._1) worst = (frac, inter)
        val dec = codes(blobs(1000L + i))
        decMax = math.max(decMax, (sm intersect dec).size)
      }
      info(f"qStep=$q worstPlantedFrac=${worst._1}%.4f (shared=${worst._2}) decoyMaxShared=$decMax")
      qStepDiag = 0.25
    }
    succeed
  }

  test("m174 diag9: crop-compound misses by squeeze class") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    val media = graft.tools.ScaleCheck.cropAffinePngs(s, 800)
    val planted = Multimodal.imageAffineFramePairs(media, maxDf = 500)
      .filter($"doc_b" - $"doc_a" === 9 && $"doc_b" % 10 === 9)
      .select($"doc_b").as[Long].collect().toSet
    val byClass = (0 until 3).map { c =>
      val ids = (9L until 800L by 10L).filter(_ % 3 == c)
      (Array(1.3, 1.5, 1.7)(c), ids.count(planted), ids.size)
    }
    byClass.foreach { case (sq, hit, n) => info(s"squeeze $sq: $hit/$n") }
    succeed
  }

  test("m174 diag10: score distribution of missed planted crop pairs") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    val media = graft.tools.ScaleCheck.cropAffinePngs(s, 800)
    val all = Multimodal.imageAffineFramePairs(media, minMatch = 0.0001,
        maxDf = 500, minShared = 1)
      .filter($"doc_b" - $"doc_a" === 9 && $"doc_b" % 10 === 9)
      .select($"doc_b", $"match_frac").as[(Long, Double)].collect().toMap
    val missedAtGate = (9L until 800L by 10L).map { id =>
      (id, all.getOrElse(id, 0.0)) }
      .filter(_._2 < 0.02)
    info(s"pairs below the 0.02 gate: ${missedAtGate.size} of 80")
    info("their scores: " + missedAtGate.map(_._2).sorted.mkString(", "))
    succeed
  }

  test("m179 diag11: verified tier on the crop-compound corpus") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    val media = graft.tools.ScaleCheck.cropAffinePngs(s, 800)
    val out = Multimodal.imageAffineFramePairsVerified(media, maxDf = 500)
      .collect()
    val planted = out.filter(r => r.getLong(1) - r.getLong(0) == 9 &&
      r.getLong(1) % 10 == 9)
    val spurious = out.length - planted.length
    val scores = planted.map(_.getDouble(2)).sorted
    info(s"planted ${planted.length}/80 spurious $spurious " +
      s"minScore ${scores.headOption.getOrElse(-1.0)}")
    succeed
  }

  test("m179 diag12: inspect non-planted verified pairs at 2k") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    val media = graft.tools.ScaleCheck.cropAffinePngs(s, 2000)
    val out = Multimodal.imageAffineFramePairsVerified(media, maxDf = 500)
      .collect()
    val extras = out.filterNot(r => r.getLong(1) - r.getLong(0) == 9 &&
      r.getLong(1) % 10 == 9)
    info(s"extras: ${extras.length}")
    extras.sortBy(-_.getDouble(2)).take(24).foreach(r =>
      info(s"  ${r.getLong(0)} ~ ${r.getLong(1)} frac ${r.getDouble(2)}"))
    succeed
  }

  test("m179 diag13: probe-class gray-zone scan") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    def blobs(seed: Long) =
      Multimodal.syntheticPngBlobs(seed, 256, 256, nBlobs = 24, minSep = 22.0)
    def probe(src: Long, c0: Int, c1: Int, deg: Double, outW: Int) =
      Multimodal.pngCropResize(Multimodal.pngRotateResize(
        Multimodal.pngCropResize(blobs(src), c0, c0, c1, c1, 256, 256),
        deg), 0, 0, 256, 256, outW, 256)
    // scan crop tightness x squeeze for the gray zone
    val classes = Seq(
      ("c70_sq13_d23", (i: Long) => probe(i, 38, 218, -23.0, 197)),
      ("c75_sq16_d9", (i: Long) => probe(i, 32, 224, 9.0, 160)),
      ("c69_sq152_d33", (i: Long) => probe(i, 40, 216, 33.0, 169)),
      ("c70_sq15_d21", (i: Long) => probe(i, 38, 218, 21.0, 171)),
      ("c66_sq14_d17", (i: Long) => probe(i, 44, 212, 17.0, 183)),
      ("c62_sq13_d11", (i: Long) => probe(i, 48, 208, 11.0, 197)),
      ("c66_sq15_d27", (i: Long) => probe(i, 44, 212, 27.0, 171)))
    classes.foreach { case (nameC, mk) =>
      val rows = (0 until 6).map(i => (i.toLong, blobs(i.toLong))) ++
        (0 until 6).map(i => (100L + i, mk(i.toLong)))
      val media = rows.toDF("doc_id", "payload")
      val code = Multimodal.imageAffineFramePairs(media,
          minMatch = 0.0001, minShared = 1)
        .filter($"doc_b" - $"doc_a" === 100)
        .select($"doc_a", $"match_frac").as[(Long, Double)].collect().toMap
      val ver = Multimodal.imageAffineFramePairsVerified(media)
        .filter($"doc_b" - $"doc_a" === 100)
        .select($"doc_a", $"match_frac").as[(Long, Double)].collect().toMap
      val codeHits = (0L until 6L).count(i => code.getOrElse(i, 0.0) >= 0.02)
      val verHits = (0L until 6L).count(i => ver.getOrElse(i, 0.0) > 0)
      info(f"$nameC: codeGate $codeHits/6 verified $verHits/6 " +
        s"codeScores ${(0L until 6L).map(i => f"${code.getOrElse(i, 0.0)}%.4f").mkString(",")}")
    }
    succeed
  }

  test("m179 diag14: candidate fixture, per-probe scores") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    def blobs(seed: Long) =
      Multimodal.syntheticPngBlobs(seed, 256, 256, nBlobs = 24, minSep = 22.0)
    def probe(src: Long, c0: Int, c1: Int, deg: Double, outW: Int) =
      Multimodal.pngCropResize(Multimodal.pngRotateResize(
        Multimodal.pngCropResize(blobs(src), c0, c0, c1, c1, 256, 256),
        deg), 0, 0, 256, 256, outW, 256)
    val rows = (0 until 8).map(i => (i.toLong, blobs(i.toLong))) ++
      Seq((20L, probe(3, 38, 218, -23.0, 197)),
        (21L, probe(2, 40, 216, 33.0, 169)),
        (22L, probe(2, 44, 212, 17.0, 183)),
        (23L, probe(3, 44, 212, 17.0, 183)),
        (24L, probe(2, 48, 208, 11.0, 197)),
        (25L, probe(4, 38, 218, 21.0, 171))) ++
      (0 until 2).map(i => (140L + i, blobs(1000L + i)))
    val media = rows.toDF("doc_id", "payload")
    val code = Multimodal.imageAffineFramePairs(media,
        minMatch = 0.0001, minShared = 1, maxDf = 64)
      .filter($"doc_b" >= 20 && $"doc_b" <= 25)
      .select($"doc_a", $"doc_b", $"match_frac")
      .as[(Long, Long, Double)].collect()
    val ver = Multimodal.imageAffineFramePairsVerified(media, maxDf = 64)
      .filter($"doc_b" >= 20 && $"doc_b" <= 25)
      .select($"doc_a", $"doc_b", $"match_frac")
      .as[(Long, Long, Double)].collect()
    info("code: " + code.sortBy(_._2).map { case (a, b, f) =>
      f"$a->$b:$f%.4f" }.mkString(" "))
    info("verified: " + ver.sortBy(_._2).map { case (a, b, f) =>
      f"$a->$b:$f%.3f" }.mkString(" "))
    succeed
  }

  test("m179 diag15: master-by-class gray-zone matrix") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    def blobs(seed: Long) =
      Multimodal.syntheticPngBlobs(seed, 256, 256, nBlobs = 24, minSep = 22.0)
    def probe(src: Long, c0: Int, c1: Int, deg: Double, outW: Int) =
      Multimodal.pngCropResize(Multimodal.pngRotateResize(
        Multimodal.pngCropResize(blobs(src), c0, c0, c1, c1, 256, 256),
        deg), 0, 0, 256, 256, outW, 256)
    val classes = Seq(
      ("A_c70d23", (i: Long) => probe(i, 38, 218, -23.0, 197)),
      ("B_c66d17", (i: Long) => probe(i, 44, 212, 17.0, 183)),
      ("C_c66d27sq15", (i: Long) => probe(i, 44, 212, 27.0, 171)),
      ("D_c62d11", (i: Long) => probe(i, 48, 208, 11.0, 197)))
    for ((nameC, mk) <- classes; m <- 0L until 8L) {
      val rows = (0 until 8).map(i => (i.toLong, blobs(i.toLong))) ++
        Seq((20L, mk(m)))
      val media = rows.toDF("doc_id", "payload")
      val code = Multimodal.imageAffineFramePairs(media,
          minMatch = 0.0001, minShared = 1, maxDf = 64)
        .filter($"doc_a" === m && $"doc_b" === 20)
        .select($"match_frac").as[Double].collect().headOption.getOrElse(0.0)
      val ver = Multimodal.imageAffineFramePairsVerified(media, maxDf = 64)
        .filter($"doc_a" === m && $"doc_b" === 20)
        .select($"match_frac").as[Double].collect().headOption.getOrElse(0.0)
      if (code < 0.02 && ver >= 0.4)
        info(f"GRAYWIN $nameC m=$m code=$code%.4f ver=$ver%.3f")
    }
    succeed
  }

  test("m179 diag16: spec fixture verify internals") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    def blobs(seed: Long) =
      Multimodal.syntheticPngBlobs(seed, 256, 256, nBlobs = 24, minSep = 22.0)
    def probe(src: Long, c0: Int, c1: Int, deg: Double, outW: Int) =
      Multimodal.pngCropResize(Multimodal.pngRotateResize(
        Multimodal.pngCropResize(blobs(src), c0, c0, c1, c1, 256, 256),
        deg), 0, 0, 256, 256, outW, 256)
    val rows = (0 until 8).map(i => (i.toLong, blobs(i.toLong))) ++
      Seq((123L, probe(3, 38, 218, -23.0, 197)),
        (126L, probe(6, 44, 212, 17.0, 183))) ++
      (0 until 6).map(i => (200L + i, blobs(3000L + i)))
    val media = rows.toDF("doc_id", "payload")
    val all = Multimodal.imageAffineFramePairsVerified(media,
        verifyMinFrac = 0.0001, verifyMinAligned = 1, maxDf = 64)
      .filter($"doc_b" >= 100 && $"doc_b" < 200)
      .select($"doc_a", $"doc_b", $"match_frac")
      .as[(Long, Long, Double)].collect()
    all.sortBy(t => (t._2, t._1)).foreach { case (a, b, f) =>
      info(f"$a -> $b verifiedFrac $f%.3f") }
    succeed
  }

  test("m179 diag18: 32k verified at the (9, 0.5) floor") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    val media = graft.tools.ScaleCheck.cropAffinePngs(s, 32000).persist()
    media.count()
    val out = Multimodal.imageAffineFramePairsVerified(media,
        maxDf = 500).collect()
    val planted = out.count(r => r.getLong(1) - r.getLong(0) == 9 &&
      r.getLong(1) % 10 == 9)
    info(s"32k: planted=$planted/3200 extras=${out.length - planted}")
    media.unpersist()
    succeed
  }

  test("m179 diag17: verify floor tradeoff at 8k") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import s.implicits._
    val media = graft.tools.ScaleCheck.cropAffinePngs(s, 8000).persist()
    media.count()
    for ((minAl, minFr) <- Seq((7, 0.4), (9, 0.5), (10, 0.55), (11, 0.6))) {
      val out = Multimodal.imageAffineFramePairsVerified(media,
          verifyMinFrac = minFr, verifyMinAligned = minAl, maxDf = 500)
        .collect()
      val planted = out.count(r => r.getLong(1) - r.getLong(0) == 9 &&
        r.getLong(1) % 10 == 9)
      info(s"minAligned=$minAl minFrac=$minFr planted=$planted/800 " +
        s"extras=${out.length - planted}")
    }
    media.unpersist()
    succeed
  }

  test("m174 diag7: affine-frame code overlap across the transform grid") {
    for (i <- 0 until 6) {
      val master = blobs(i.toLong)
      val crop = Multimodal.pngCropResize(master, 32, 32, 224, 224, 256, 256)
      val rot = Multimodal.pngRotateResize(crop, 17.0)
      val sq = Multimodal.pngCropResize(rot, 0, 0, 256, 256, 183, 256)
      val sm = codes(master)
      // exact cloud-level affine (no resample): invariance ceiling
      val c0 = cells(img(master))
      val th = 17 * math.Pi / 180
      val exact = codesOf(c0.map { case (x, y, v) =>
        val rx = StrictMath.cos(th) * x + StrictMath.sin(th) * y
        val ry = -StrictMath.sin(th) * x + StrictMath.cos(th) * y
        (math.round(rx / 1.4).toInt, math.round(ry).toInt, v) })
      val sc = codes(crop); val sr = codes(rot); val sq2 = codes(sq)
      val dec = codes(blobs(1000L + i)) // fresh decoy
      info(f"id=$i nm=${sm.size} exactAffine=${(sm intersect exact).size} " +
        f"crop=${(sm intersect sc).size} cropRot=${(sm intersect sr).size} " +
        f"compound=${(sm intersect sq2).size}/${math.min(sm.size, sq2.size)} " +
        f"decoy=${(sm intersect dec).size}")
    }
    succeed
  }
}
