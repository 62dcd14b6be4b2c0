package graft.tools

import org.apache.spark.sql.SparkSession

/** Growth evidence runner: time a fixed set of DATA-PROPORTIONAL
  * headline queries (the pipeline/streaming families are trigger-
  * latency-bound, so they are excluded by design) against two or more
  * data dirs — typically sf0.1 and a [[ScaleUp]]-generated 10x copy —
  * and emit one JSON line per dir plus a growth-ratio summary. An
  * operator whose warm time grows ~linearly with the data (after fixed
  * job overhead) has no hidden quadratic; one that bends super-linear
  * is a scale bug.
  *
  * Usage: GrowthBench <outJson> <dir1> <dir2> [...]
  */
object GrowthBench {

  /** Data-proportional headline set: the heaviest relational kernels
    * plus every dedup/quality/ANN family representative. s48 is
    * deliberately absent: the gated query pins nCentroids=8, and at a
    * FIXED centroid count SemDeDup is per-cluster quadratic by spec —
    * its corpus-linear contract needs centroids ~ sqrt(n), which is
    * exactly what the ScaleCheck sweep runs (and shows linear). */
  val names: Seq[String] = Seq(
    "q01_agg", "q35_percentile", "q44_funnel", "q47_weighted_quantile",
    "t31_dedup_exact", "t38_minhash_lsh_pairs", "t39_simhash_pairs",
    "t48_decontaminate", "t51_dup_substring", "t56_dup_substring_remove",
    "t57_bigram_lm", "t59_token_budget", "t60_bm25", "t61_paragraph_dedup",
    "t64_bpe_merges", "t65_bpe_encode", "t66_cross_neardup",
    "t67_char_entropy", "t68_bpe_batched", "t69_index_dedup",
    "t71_bpe_vocab4k", "t72_index_append",
    // t73 is t72 through the parquet sink: index build + LWW window +
    // compaction rewrite all scale with the corpus
    "t73_index_sink_loop",
    // confusable tier: normalization is a per-row projection and the
    // decontamination shingle join grows with the corpus
    "t74_confusable_dedup", "t75_decontaminate_confusables",
    // winnowing: per-doc kernel + fingerprint posting lists, both
    // corpus-proportional
    "t76_winnow_fingerprints", "t77_winnow_overlap",
    "t78_cdc_overlap",
    // round-11 incremental indexes: corpus index build dominates and
    // grows with the documents table (probe batches are fixture-sized);
    // the sink-loop forms add the LWW read + compaction rewrite
    "t80_winnow_index", "t81_cdc_index",
    "t82_winnow_sink_loop", "t83_cdc_sink_loop",
    "s46_cosine_dup_lsh", "s49_embed_curate",
    "s54_diversity_select", "s56_index_dedup",
    // corpus-proportional legs of the round-9 subtitle bridge: the
    // probe side is fixture-sized, the documents side (bands, shingle
    // verify, equality join) grows with the corpus
    "m97_subtitle_decontam", "m98_subtitle_neardup",
    // affine-frame family (round 14): the crop x affine corpus is
    // sized by the documents count, so decode + code join + (m186)
    // RANSAC verify all grow with the data; m192 (round 15) is the
    // same planted class over JPEG-textured photo-world masters
    "m185_affine_frame_growth", "m186_affine_frame_verified_growth",
    "m192_affine_frame_textured_growth")

  private def r3(d: Double): Double = math.rint(d * 1000) / 1000

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GrowthBench <outJson> <dir1> <dir2> [...]")
    val outPath = args(0)
    val dirs = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // GROWTH_ONLY=<substr,substr> restricts the set — the 100x decade
    // runs time only the shuffle-dominated trio, not the full sweep
    val onlyF = sys.env.get("GROWTH_ONLY").map(_.split(",").toSeq)
    val run = names.filter(graft.SparkEntry.queries.contains)
      .filter(n => onlyF.forall(_.exists(n.contains)))
    val results = dirs.map { dir =>
      dir -> run.map { name =>
        val fn = graft.SparkEntry.queries(name)
        // cold + warm: first run pays codegen/scan setup, second is the
        // data-proportional number the growth ratio uses. Cleanup runs
        // AFTER EACH iteration (outside the timed window): every fn()
        // call rebuilds its own Materialize.eager checkpoints, so the
        // warm run never legitimately reuses the cold run's leaked
        // blocks — but at the 10x dir those blocks are multi-GB and
        // holding them THROUGH the warm run read as warm-slower-than-
        // cold GC inversions (round-15: t57 4.75 cold / 10.0 warm,
        // m185 24.3 / 61.5 — both clean when each run starts from a
        // drained heap). The cleanup itself only drops ids the run
        // added (the round-14 ADVICE rule: never evict caches created
        // outside the timed query).
        val times = (0 until 2).map { _ =>
          val pre = spark.sparkContext.getPersistentRDDs.keySet
          val t0 = System.nanoTime()
          // scoped (round 16): the run's eager checkpoints release at
          // the timing boundary itself; the diff below is an assert
          // that it held, not the cleanup mechanism anymore
          graft.operators.Materialize.scoped {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
          }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs
            .foreach { case (id, rdd) =>
              if (!pre.contains(id)) {
                println(s"[growth] LEAKED persistent RDD after $name: id=$id")
                rdd.unpersist(blocking = true)
              }
            }
          System.gc()
          sec
        }
        val left = spark.sparkContext.getPersistentRDDs.size
        val mem = {
          val s = spark.sparkContext.getExecutorMemoryStatus.values
            .foldLeft((0L, 0L)) { case ((t, f), (mt, mf)) => (t + mt, f + mf) }
          f"${(s._1 - s._2) / 1e9}%.1f"
        }
        println(f"[growth] $dir $name%-26s cold=${times(0)}%7.2f warm=${times(1)}%7.2f residentRdds=$left memUsedGB=$mem")
        name -> times
      }
    }
    def jq(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (n, ts) =>
        "\"" + n + "\":[" + ts.map(r3).mkString(",") + "]"
      }.mkString(",")
    val ratios =
      if (results.length == 2) {
        val base = results.head._2.toMap
        results(1)._2.map { case (n, ts) =>
          val b = base(n)(1)
          "\"" + n + "\":" + (if (b > 0) r3(ts(1) / b) else -1.0)
        }.mkString(",")
      } else ""
    val json =
      s"""{"metric":"growth","dirs":{${results.map { case (d, rs) =>
          "\"" + d + "\":{" + jq(rs) + "}" }.mkString(",")}},""" +
      s""""warm_ratio":{$ratios}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
