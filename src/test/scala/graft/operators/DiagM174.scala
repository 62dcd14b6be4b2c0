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


  // Corpus-scale diagnostics (the 800-doc squeeze-class attribution,
  // the gray-zone score scans, the verify floor tradeoff at 8k, and
  // the 32k verified confirmation) ran as one-off measured
  // experiments during round 13 and are PINNED as numbers in PLANS.md
  // and the operator scaladocs rather than kept as suite tests: at
  // 8-32k docs they need a 28g driver heap and minutes of wall, which
  // would bloat every `sbt test` run for no regression value (the
  // CORRECTNESS goldens and Round13Spec gate the operators).
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
