package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Catalyst prune the projections away), and
  * prints ONE compact JSON line — also written to
  * SPARK_GRAFT_BENCH_OUT (default bench_out.json) so a truncated stdout
  * capture can't lose the artifact.
  *
  * Reported fields:
  *  - value: wall-clock of the concurrent pass (6 FAIR lanes — the
  *    engine's realistic concurrent-jobs throughput)
  *  - queries: per-query seconds measured UNDER that concurrency
  *    (overcounts scheduler contention; see isolated)
  *  - isolated: sequential re-timings of the slowest queries — the
  *    honest per-query signal
  *  - failed: queries that threw (their timings are excluded)
  */
object Bench {
  private def r3(d: Double): Double = math.rint(d * 1000) / 1000

  /** 1-minute loadavg, or 0.0 where /proc is unavailable (non-Linux). */
  private def loadAvg1(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => 0.0 }

  /** Wait for the machine to go idle before the timed pass. A bench
    * captured under external load is not a measurement of the engine
    * (round-3: the committed artifact read 88.9s for code that measures
    * 35.4s idle — per-lane contention 5-8x). Retries until loadavg drops
    * below the threshold or the budget runs out; either way the observed
    * load is recorded in the JSON so the artifact is self-describing.
    */
  private def awaitIdle(maxLoad: Double, maxWaitSec: Int): Double = {
    val deadline = System.nanoTime() + maxWaitSec * 1e9.toLong
    var load = loadAvg1()
    while (load > maxLoad && System.nanoTime() < deadline) {
      System.err.println(f"[bench] loadavg $load%.2f > $maxLoad%.2f - waiting for idle machine")
      // never overshoot the wait budget by a full interval
      Thread.sleep(math.min(15000L,
        math.max(1L, (deadline - System.nanoTime()) / 1000000L)))
      load = loadAvg1()
    }
    if (load > maxLoad)
      System.err.println(f"[bench] proceeding under load $load%.2f (wait budget exhausted) - timings will overstate")
    load
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val nIsolated = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATED", "12").toInt
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "1.0").toDouble
    val maxWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WAIT_SEC", "300").toInt
    val loadBefore = awaitIdle(maxLoad, maxWait)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        pool: String = "default"): (Double, Boolean) = {
      // FAIR pools share the CPU equally: the many-small-jobs pipeline
      // queries get their own pool so the heavy scan/join lanes can't
      // starve their per-batch jobs (round-3: e56 14s lane vs 1.3s
      // isolated under a single shared pool)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // Kick off the shared pair-set materialization so it OVERLAPS the
    // lanes (serializing it first wastes idle cores; measured: 46s total
    // serialized vs 25s overlapped). Wall-clock therefore includes every
    // byte of work the suite does — nothing is excluded — and the
    // isolated re-timings below give the contention-free per-query view.
    val prewarm = new Thread(() =>
      try graft.queries.TextOps.prewarmPairs(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] prewarm: $e") })
    prewarm.setDaemon(true)
    prewarm.start()

    // Overlap queries with a small driver pool (the engine's concurrent-
    // jobs capability — the same overlap the micro-batch runtime uses
    // for batches): small queries fill scheduler gaps left by large ones.
    // PipelineRunner-based queries carry their own worker thread pools and
    // multi-batch commit barriers; running six of them at once smears
    // every lane timing (round-2: 10-20s lane vs 1-2s isolated), so they
    // get a dedicated 2-wide pool while pure queries share the rest.
    // 10 measured best on local[32] with the LPT ordering (19.9s wall vs
    // 23.8s at 8 and 21.9s at 12); more lanes thrash the FAIR scheduler
    val lanes = sys.env.getOrElse("SPARK_GRAFT_BENCH_LANES", "10").toInt
    val pipelineQueries = Set("e56_blocks_pipeline", "e59_erc20_balances",
      "e60_decoded_logs_variant", "e61_config_pipeline", "e62_config_derived",
      "e63_config_transactions", "e64_config_logs", "e65_config_traces",
      "e66_config_decoded_traces", "e67_config_erc20_balances",
      "e68_config_daily_export", "e69_config_decoded_logs_export",
      "st63_tip_catchup")
    // lanes=1 degenerates to one shared single-thread pool (a 0-thread
    // pipe pool is both invalid and pointless)
    val pipeLanes = math.min(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PIPE_LANES", "3").toInt, lanes - 1)
    val wall0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, lanes - math.max(0, pipeLanes)))
    val pipePool =
      if (pipeLanes < 1) pool
      else java.util.concurrent.Executors.newFixedThreadPool(pipeLanes)
    // Longest-first submission (LPT makespan heuristic): alphabetical
    // order put the multi-batch exports and streaming queries at the
    // END of their pools, so the wall was "everything else" + a late
    // heavy tail. The list is a static cost hint from measured lane
    // times, not a timing input — unknown names just sort after it.
    val heavyFirst = Seq(
      "e68_config_daily_export", "e69_config_decoded_logs_export",
      "e67_config_erc20_balances", "e66_config_decoded_traces",
      "e62_config_derived", "e63_config_transactions", "e56_blocks_pipeline",
      "st64_stream_session_window", "st61_stream_window", "st65_stream_dedup",
      "st66_stream_quality_gate", "t38_minhash_lsh_pairs", "t39_simhash_pairs",
      "s46_cosine_dup_lsh", "t48_decontaminate"
    ).zipWithIndex.toMap
    // the pair-cache consumers block on the prewarm future — submitted
    // early they'd HOLD a lane idle until the shared pair set
    // materializes; submitted last the prewarm overlaps everything else
    // and they start against a warm cache
    val pairConsumers = Set("t36_ngram_jaccard", "t41_dedup_clusters",
      "t42_dedup_resolve")
    val results = SparkEntry.queries.toSeq
      .sortBy { case (n, _) =>
        (if (pairConsumers(n)) Int.MaxValue else heavyFirst.getOrElse(n, 1000), n)
      }
      .map { case (name, fn) =>
      val isPipe = pipelineQueries(name)
      val p = if (isPipe) pipePool else pool
      name -> p.submit(new java.util.concurrent.Callable[(Double, Boolean)] {
        // per-query pools for the pipeline family: FAIR schedules
        // ACROSS pools but FIFO within one, so a single shared "pipe"
        // pool serialized the three exports' many tiny jobs behind
        // each other; one pool per query lets each pipeline's job
        // stream proceed at its own pace
        def call(): (Double, Boolean) =
          time(name, fn, if (isPipe) s"pipe-$name" else "default")
      })
    }.map { case (name, fut) => val (sec, ok) = fut.get(); (name, sec, ok) }
    pool.shutdown(); pipePool.shutdown()
    val wall = (System.nanoTime() - wall0) / 1e9

    // sequential re-timings of the slowest queries: contention-free
    val slowest = results.filter(_._3).sortBy(-_._2).take(nIsolated).map(_._1)
    val isolated = slowest.map { name =>
      name -> time(name, SparkEntry.queries(name))._1
    }

    // load sampled AFTER the timed pass too: a contention spike that
    // arrives mid-run (the round-3 88.9s-vs-35.4s artifact) is then
    // visible from the JSON alone — load ≈ lanes is the engine itself,
    // load >> lanes means external contention smeared the timings
    val loadAfter = loadAvg1()
    val failed = results.filter(!_._3).map(_._1)
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${r3(wall)},"unit":"sec",""" +
      s""""queries":${jmap(results.map(t => t._1 -> t._2))},""" +
      s""""isolated":${jmap(isolated)},""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""sum_sec":${r3(results.map(_._2).sum)},""" +
      s""""load":${r3(loadBefore)},"load_after":${r3(loadAfter)},""" +
      s""""lanes":$lanes,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(3)
  }
}
