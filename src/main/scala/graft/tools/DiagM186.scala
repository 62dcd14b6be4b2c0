package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Materialize, Multimodal}

/** Cold+warm timing of the m185/m186 affine-frame growth pair at
  * arbitrary corpus sizes — the focused iteration loop for the
  * round-14 growth artifact's one super-linear entry (m186 per-doc
  * wall x1.6 per corpus decade, attributed by measurement to the
  * applyDfCap + two-sided self-join candidate shape). GrowthBench
  * remains the artifact of record; this tool exists so a candidate
  * rewrite can be timed without paying the full 40-query sweep.
  *
  * Usage: DiagM186 <n> [<n2> ...]
  */
object DiagM186 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark

    // dfstats mode: quantify code-space saturation of the ScaleCheck
    // blob fixture class at corpus size n — df distribution of the
    // anchored affine-frame codes and the implied candidate-pair row
    // count Sum(df^2)/2 under a cap. At 50k docs the 36-bit code
    // space saturates and the capped pair explode crossed 74 GB of
    // shuffle spill (the measured 100x wall); these numbers put the
    // wall on the fixture class, not the operator.
    // pts=4: emit 4-point (48-bit) codes instead of the production
    // triples — the round-17 selectivity experiment (accidental df
    // mass vs per-code jitter survival on the textured class)
    val nPts = args.find(_.startsWith("pts="))
      .map(_.drop(4).toInt).getOrElse(3)
    // qstep=<v>: coordinate quantizer width (default 0.3, the
    // production value) — the knob that trades per-point jitter
    // survival against cell collisions in the pts=4 experiment
    val qStep = args.find(_.startsWith("qstep="))
      .map(_.drop(6).toDouble).getOrElse(0.3)
    if (args.contains("dfstats")) {
      args.filter(_.forall(_.isDigit)).foreach { a =>
        val n = a.toInt
        val media =
          if (args.contains("textured")) ScaleCheck.cropAffineJpegTextured(spark, n)
          else ScaleCheck.cropAffinePngs(spark, n)
        val lms = Materialize.eager(
          Multimodal.imageAffineFrameLandmarksAnchored(media,
            qStep = qStep, nPts = nPts))
        val dfs = lms.groupBy(col("lm"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val stats = dfs.agg(
          count(lit(1)).as("codes"),
          sum(col("df")).as("postings"),
          max(col("df")).as("max_df"),
          sum(when(col("df") >= 2, col("df") * col("df")) / 2).as("pairs_uncapped"),
          sum(when(col("df").between(2, 500), col("df") * col("df")) / 2)
            .as("pairs_cap500"),
          sum(when(col("df").between(2, 64), col("df") * col("df")) / 2)
            .as("pairs_cap64"),
          sum(when(col("df") > 500, 1).otherwise(0)).as("codes_over_500"),
          sum(when(col("df") > 64, 1).otherwise(0)).as("codes_over_64"))
          .collect()(0)
        println(s"[diag] dfstats n=$n $stats")
        // exact per-df census + cumulative pair bytes at w16 — the
        // budget-calibration curve for interior-binding autocap gates
        if (args.contains("census")) {
          val rows = dfs.filter(col("df") >= 2).groupBy(col("df"))
            .agg(count(lit(1)).as("codes"),
              sum(col("df") * col("df")).as("s2"))
            .orderBy(col("df")).collect()
          var cum = 0L
          rows.foreach { r =>
            cum += r.getLong(2) / 2 * 16
            println(s"[diag]   df=${r.getLong(0)} codes=${r.getLong(1)} " +
              s"cumPairBytesW16<=$cum")
          }
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
      }
      spark.stop(); return
    }
    val textured = args.contains("textured")
    // autocap mode: maxDf = AutoDf end-to-end — the engine solves the
    // cap from the measured df distribution and the DEFAULT budget
    // (spark.graft.pair.shuffleBudgetBytes, 16 GiB), then m185/m186
    // run at the solved cap. The round-15 verdict's acceptance: at
    // the 50k saturated blob fixture this must reproduce the cap-64
    // operating point (flat per-doc, verified >= 90% recall, 0
    // spurious) WITHOUT a hand knob.
    val autocap = args.contains("autocap")
    // cap=<k> overrides the df cap (default 500, the gate queries'
    // value) — the saturation-tuning demonstration: on a corpus whose
    // code space has saturated, lowering the cap restores a bounded
    // pair explode at the cost of the saturated codes' (nil) signal
    val cap0 = args.find(_.startsWith("cap="))
      .map(_.drop(4).toInt).getOrElse(500)
    val cap = if (autocap) Multimodal.AutoDf else cap0
    // budget=<bytes> pins the autocap byte budget (default 16 GiB) —
    // the slope measurement wants a budget that BINDS at every
    // measured corpus size, so per-doc cost is read at constant
    // pair-mass, the regime a 100-TB deployment actually runs in
    args.find(_.startsWith("budget=")).map(_.drop(7)).foreach { b =>
      println(s"[diag] pair budget = $b bytes")
      spark.conf.set(Multimodal.PairBudgetConf, b)
    }
    args.filter(_.forall(_.isDigit)).foreach { a =>
      val n = a.toInt
      println(s"[diag] ===== corpus n=$n textured=$textured cap=" +
        s"${if (autocap) "auto" else cap0} =====")
      if (autocap) {
        // report the solved caps once, visibly (the runs below solve
        // again internally — same pure function of the same data)
        val media =
          if (textured) ScaleCheck.cropAffineJpegTextured(spark, n)
          else ScaleCheck.cropAffinePngs(spark, n)
        Materialize.scoped {
          val lms = Materialize.eager(
            Multimodal.imageAffineFrameLandmarksAnchored(media,
              qStep = qStep, nPts = nPts))
            .select(col("doc_id"), col("lm"))
          // round 17: the verified tier's count-first candidate pass
          // shuffles 16 B rows too, so both tiers solve at w16
          println(s"[diag] solved cap (both tiers, w16) = " +
            Multimodal.solveDfCap(lms, 16))
        }
      }
      // only=m185|m186 restricts to one tier (a failed long run at the
      // 50k sizes retries without re-paying the other tier)
      val onlyQ = args.find(_.startsWith("only=")).map(_.drop(5))
      onlyQ.foreach { q =>
        if (q != "m185" && q != "m186") {
          System.err.println(
            s"[diag] unknown only=$q (valid: m185, m186) — refusing " +
              "to run an empty measurement loop")
          spark.stop(); sys.exit(2)
        }
      }
      // iters=1 for single-shot attribution sweeps (recall is
      // deterministic; only the warm timing needs the second pass)
      val iters = args.find(_.startsWith("iters="))
        .map(_.drop(6).toInt).getOrElse(2)
      for (q <- Seq("m185", "m186") if onlyQ.forall(_ == q)) {
        val times = (0 until iters).map { _ =>
          val t0 = System.nanoTime()
          // scoped: the run's eager checkpoints die at the timing
          // boundary (round 16) — the diff-clean below should find
          // nothing and says so when it does
          Materialize.scoped {
            val media =
              if (textured) ScaleCheck.cropAffineJpegTextured(spark, n)
              else ScaleCheck.cropAffinePngs(spark, n)
            val planted = col("doc_b") - col("doc_a") === 9 &&
              col("doc_b") % 10 === 9
            val pairs =
              if (q == "m185") Multimodal.imageAffineFramePairs(media,
                maxDf = cap, qStep = qStep, nPts = nPts)
              else Multimodal.imageAffineFramePairsVerified(media,
                maxDf = cap, qStep = qStep, nPts = nPts)
            val row = pairs.agg(lit(n).as("corpus_n"),
                sum(when(planted, 1).otherwise(0)).as("planted_found"),
                sum(when(!planted, 1).otherwise(0)).as("spurious"))
              .collect()(0)
            println(s"[diag]   $q planted=${row.get(1)} spurious=${row.get(2)}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        val leaked = spark.sparkContext.getPersistentRDDs
        if (leaked.nonEmpty) {
          println(s"[diag] LEAKED persistent RDDs: ${leaked.keySet}")
          leaked.values.foreach(_.unpersist(blocking = true))
        }
        System.gc()
        val warm = times.last
        println(f"[diag] $q n=$n cold=${times(0)}%7.2f warm=$warm%7.2f per-doc-warm=${warm * 1000 / n}%6.2f ms")
      }
    }
    spark.stop()
  }
}
