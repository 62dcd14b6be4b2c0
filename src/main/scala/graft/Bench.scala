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
  *  - value: wall-clock of the concurrent pass (FAIR lanes — the
  *    engine's realistic concurrent-jobs throughput)
  *  - queries: per-query seconds measured UNDER that concurrency
  *    (overcounts scheduler contention; see isolated)
  *  - isolated: sequential re-timings of the slowest queries PLUS the
  *    whole pipeline/streaming family — the honest per-query signal
  *  - ext_cores / ext_cores_isolated: external (non-self) CPU cores
  *    observed busy during each pass; >~2 means another process smeared
  *    the timings. The concurrent pass AUTO-RERUNS once if contended
  *    (round-5: a loaded artifact read 64.7s for code that re-measures
  *    32.5s idle — neither the artifact nor a hand-retime was the truth)
  *  - failed: queries that threw (their timings are excluded)
  *
  * Single-query mode: SPARK_GRAFT_BENCH_ONLY=<substr> skips the
  * concurrent pass and times each matching query
  * SPARK_GRAFT_BENCH_ITERS (default 3) times warm, so one query can be
  * retimed honestly in one command and the numbers land in a committed
  * JSON instead of a shell scrollback.
  */
object Bench {
  private def r3(d: Double): Double = math.rint(d * 1000) / 1000

  /** JSON string escape for values interpolated into the artifact
    * (the BENCH_ONLY filter and the sf dir come from the environment;
    * a quote or backslash in either must not produce unparseable
    * output). */
  private def jesc(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case c if c < ' '  => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }

  /** 1-minute loadavg, or 0.0 where /proc is unavailable (non-Linux). */
  private def loadAvg1(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => 0.0 }

  /** (machine busy jiffies, self jiffies): /proc/stat cpu line minus
    * idle+iowait, and /proc/self/stat utime+stime. Spark local[*] runs
    * entirely in this JVM, so busy-minus-self is EXTERNAL load — the
    * 1-min loadavg can't make that distinction right after our own
    * 32-thread pass, which is why round-5's load_after check was
    * inconclusive. */
  private def cpuJiffies(): (Long, Long) = {
    try {
      val stat = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next().split("\\s+").drop(1).map(_.toLong)
      val busy = stat.sum - stat(3) - (if (stat.length > 4) stat(4) else 0L)
      val self = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/stat"))
        .split("\\s+")
      (busy, self(13).toLong + self(14).toLong)
    } catch { case _: Throwable => (0L, 0L) }
  }
  private val UserHz = 100.0

  /** Diagnostics for the driver-vs-local wall gap (round-12: the
    * official artifact read 220.6s for a suite an identical invocation
    * re-measures at 88.5s on the same machine 35 minutes later, both
    * with ext_cores < 0.7 — external CPU alone cannot adjudicate a
    * window where the BENCH ITSELF is given fewer effective cores).
    * These fields make the artifact self-diagnosing:
    *  - jvm_cpus: Runtime.availableProcessors (container-aware — a
    *    cpuset/quota shrinks it below the host's /proc/cpuinfo count)
    *  - self_cores: our own CPU seconds / wall over the concurrent
    *    pass — the directly-observed parallelism. Local runs read
    *    ~8-20; a quota-throttled or frequency-capped window reads the
    *    cap instead, with ext_cores still ~0.
    *  - gc_sec: total JVM GC time — separates heap thrash from CPU
    *    starvation.
    *  - cpu_throttled_sec: cgroup-v2 cpu.stat throttled_usec delta
    *    over the run — nonzero means a CPU quota actively stalled us.
    */
  private def cgroupThrottledSec(): Double =
    try {
      java.nio.file.Files.readString(
        java.nio.file.Paths.get("/sys/fs/cgroup/cpu.stat"))
        .linesIterator.find(_.startsWith("throttled_usec"))
        .map(_.split("\\s+")(1).toDouble / 1e6).getOrElse(0.0)
    } catch { case _: Throwable => 0.0 }

  private def cgroupCpuMax(): String =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/sys/fs/cgroup/cpu.max")).trim
    catch { case _: Throwable => "" }

  private def gcSec(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1000.0
  }

  /** External busy cores averaged over the window since `start`. */
  private def extCores(start: (Long, Long), elapsedSec: Double): Double =
    if (start == ((0L, 0L)) || elapsedSec <= 0) 0.0
    else {
      val (b1, s1) = cpuJiffies()
      math.max(0.0, ((b1 - start._1) - (s1 - start._2)) / UserHz / elapsedSec)
    }

  /** Sample external load over short windows until it drops below
    * maxExt cores or the budget runs out. Used before the timed passes:
    * unlike loadavg (decays over minutes, poisoned by our own previous
    * pass), this settles within a couple of seconds of the machine
    * actually going quiet. */
  private def awaitExternalIdle(maxExt: Double, maxWaitSec: Int, tag: String): Double = {
    val deadline = System.nanoTime() + maxWaitSec * 1e9.toLong
    var ext = Double.MaxValue
    var first = true
    while (ext > maxExt && (first || System.nanoTime() < deadline)) {
      first = false
      val t0 = System.nanoTime(); val j0 = cpuJiffies()
      Thread.sleep(2000)
      ext = extCores(j0, (System.nanoTime() - t0) / 1e9)
      if (ext > maxExt)
        System.err.println(f"[bench] $tag: external load $ext%.2f cores > $maxExt%.2f - waiting")
    }
    if (ext > maxExt)
      System.err.println(f"[bench] $tag: proceeding under external load $ext%.2f cores (wait budget exhausted) - timings will overstate")
    ext
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val nIsolated = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATED", "12").toInt
    val maxExt = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_EXT_CORES", "2.0").toDouble
    val maxWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WAIT_SEC", "300").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.trim).filter(_.nonEmpty)
    awaitExternalIdle(maxExt, maxWait, "start")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // message-matching filter for the one expected per-block warning
    // the scoped release triggers — the rdd package keeps its WARN
    // signal (see LogNoise)
    LogNoise.muteUnpersistWarning()

    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        pool: String = "default"): (Double, Boolean) = {
      // FAIR pools share the CPU equally: the many-small-jobs pipeline
      // queries get their own pool so the heavy scan/join lanes can't
      // starve their per-batch jobs (round-3: e56 14s lane vs 1.3s
      // isolated under a single shared pool)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      val t0 = System.nanoTime()
      // scoped release (round 16): every Materialize.eager checkpoint a
      // query creates dies with the query, not with the ContextCleaner —
      // the accumulated leaked blocks were the measured mechanism behind
      // two rounds of end-of-suite bench drift
      val ok =
        try {
          graft.operators.Materialize.scoped {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // ---- single-query mode: SPARK_GRAFT_BENCH_ONLY=<substr> ----------
    only.foreach { substr =>
      val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
      val matching = SparkEntry.queries.toSeq.filter(_._1.contains(substr)).sortBy(_._1)
      if (matching.isEmpty) {
        System.err.println(s"[bench] BENCH_ONLY '$substr' matches no query"); sys.exit(2)
      }
      if (matching.exists(q => Set("t36_ngram_jaccard", "t41_dedup_clusters",
          "t42_dedup_resolve").contains(q._1)))
        graft.queries.TextOps.prewarmPairs(spark, sfDir)
      val runs = matching.map { case (name, fn) =>
        // first run is the warm-up (scan cache, codegen, broadcast);
        // report it too — the reader can see cold vs warm
        val j0 = cpuJiffies(); val t0 = System.nanoTime()
        val timed = (0 until math.max(1, iters)).map { _ =>
          // t64's contract is the REAL 3-round induction every time —
          // without this, iter 2+ (and every fork-isolated warm figure)
          // would publish a ~0.1s memo hit for a ~4s induction
          if (name == "t64_bpe_merges") graft.queries.TextOps.resetMergeMemo()
          time(name, fn)
        }
        val ext = extCores(j0, (System.nanoTime() - t0) / 1e9)
        (name, timed.map(_._1), ext, timed.forall(_._2))
      }
      // a failing query's time-to-throw must never read as a fast warm
      // retime: mark it and exit non-zero like the suite mode does
      val onlyFailed = runs.filter(!_._4).map(_._1)
      val json =
        s"""{"metric":"only","filter":"${jesc(substr)}","iters":${math.max(1, iters)},""" +
        s""""queries":{${runs.map { case (n, ts, _, _) =>
            "\"" + n + "\":[" + ts.map(r3).mkString(",") + "]" }.mkString(",")}},""" +
        s""""ext_cores":{${runs.map { case (n, _, e, _) =>
            "\"" + n + "\":" + r3(e) }.mkString(",")}},""" +
        s""""failed":[${onlyFailed.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""sf":"${jesc(sfDir)}"}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
      emitAndHalt(spark, json, if (onlyFailed.nonEmpty) 3 else 0)
    }

    val pipelineQueries = Set("e56_blocks_pipeline", "e59_erc20_balances",
      "e60_decoded_logs_variant", "e61_config_pipeline", "e62_config_derived",
      "e63_config_transactions", "e64_config_logs", "e65_config_traces",
      "e66_config_decoded_traces", "e67_config_erc20_balances",
      "e68_config_daily_export", "e69_config_decoded_logs_export",
      "st63_tip_catchup")

    /** One full concurrent pass; returns (wall, per-query results,
      * external cores, self cores — our own observed parallelism). */
    def concurrentPass(): (Double, Seq[(String, Double, Boolean)], Double, Double) = {
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
      // get a dedicated pool while pure queries share the rest.
      // 10 measured best on local[32] with the LPT ordering (19.9s wall vs
      // 23.8s at 8 and 21.9s at 12); more lanes thrash the FAIR scheduler
      val lanes = sys.env.getOrElse("SPARK_GRAFT_BENCH_LANES", "10").toInt
      val pipeLanes = math.max(1,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PIPE_LANES", "3").toInt)
      val jiff0 = cpuJiffies()
      val wall0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, lanes))
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
        "st66_stream_quality_gate", "st68_stream_neardup",
        "st69_stream_embed_ingest", "st70_stream_retention",
        "st71_stream_hll", "t38_minhash_lsh_pairs",
        "t39_simhash_pairs", "s46_cosine_dup_lsh", "t48_decontaminate"
      ).zipWithIndex.toMap
      // the pair-cache consumers block on the prewarm future — submitted
      // early they'd HOLD a lane idle until the shared pair set
      // materializes; submitted last the prewarm overlaps everything else
      // and they start against a warm cache
      val pairConsumers = Set("t36_ngram_jaccard", "t41_dedup_clusters",
        "t42_dedup_resolve")
      // The pipeline/streaming-tip family runs as its OWN PHASE after
      // the bulk pass (round-15): these queries are multi-batch
      // orchestration with commit barriers, so under the bulk pass's
      // scan/join load their lane times read 4-5x their isolated times
      // (round-14: e67-e69 printed 15-19s lanes for 3.1-3.7s queries)
      // and wall noise masked real drift. A dedicated phase on an
      // otherwise-idle machine keeps family lane times within ~2x of
      // isolated while the wall stays inclusive of every byte of work.
      val sorted = SparkEntry.queries.toSeq
        .sortBy { case (n, _) =>
          (if (pairConsumers(n)) Int.MaxValue else heavyFirst.getOrElse(n, 1000), n)
        }
      val (pipeSeq, rest) = sorted.partition { case (n, _) => pipelineQueries(n) }
      // The st gates run as their own LIGHT PHASE, OVERLAPPED with the
      // pipeline phase (round 16). Mixed into the bulk lanes their
      // micro-batch jobs queued FIFO behind heavy scan stages (r15:
      // lane median 3.07 s vs isolated 1.91 s) — measured to be
      // scheduler queuing, not checkpoint IO (tmpfs moved nothing).
      // The shapes measured before landing here: a SERIALIZED st phase
      // fixed the tail (median 2.96, p90 3.68) at sum parity but cost
      // +18 s wall (the gates had been filling bulk-pass scheduler
      // gaps); per-gate FAIR pools (66 pools) and one weighted
      // minShare pool both made the heavy lanes globally slower (sum
      // 841 -> 926/1019). Overlapping the light gates with the pipe
      // family's commit-barrier idle gaps keeps both phases' lane
      // numbers readable without the serialization cost.
      val (stSeq, pureSeq) = rest.partition { case (n, _) => n.startsWith("st") }
      val pureResults = pureSeq.map { case (name, fn) =>
        name -> pool.submit(new java.util.concurrent.Callable[(Double, Boolean)] {
          def call(): (Double, Boolean) = time(name, fn)
        })
      }.map { case (name, fut) => val (sec, ok) = fut.get(); (name, sec, ok) }
      pool.shutdown()
      val stLanes = math.max(1,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_ST_LANES", "5").toInt)
      val stPool = java.util.concurrent.Executors.newFixedThreadPool(stLanes)
      val pipePool = java.util.concurrent.Executors.newFixedThreadPool(pipeLanes)
      val stFuts = stSeq.map { case (name, fn) =>
        name -> stPool.submit(new java.util.concurrent.Callable[(Double, Boolean)] {
          def call(): (Double, Boolean) = time(name, fn, s"st-$name")
        })
      }
      val pipeFuts = pipeSeq.map { case (name, fn) =>
        name -> pipePool.submit(new java.util.concurrent.Callable[(Double, Boolean)] {
          // per-query FAIR pools within the phase: FAIR schedules
          // ACROSS pools but FIFO within one, so a single shared
          // scheduler pool would serialize the exports' many tiny
          // jobs behind each other
          def call(): (Double, Boolean) = time(name, fn, s"pipe-$name")
        })
      }
      val stResults = stFuts.map { case (name, fut) =>
        val (sec, ok) = fut.get(); (name, sec, ok) }
      val pipeResults = pipeFuts.map { case (name, fut) =>
        val (sec, ok) = fut.get(); (name, sec, ok) }
      stPool.shutdown(); pipePool.shutdown()
      val results = pureResults ++ stResults ++ pipeResults
      val wall = (System.nanoTime() - wall0) / 1e9
      val selfCores =
        if (jiff0 == ((0L, 0L)) || wall <= 0) 0.0
        else (cpuJiffies()._2 - jiff0._2) / UserHz / wall
      (wall, results, extCores(jiff0, wall), selfCores)
    }

    val throttled0 = cgroupThrottledSec()
    // gc_sec must be a DELTA over the measured window like
    // cpu_throttled_sec — the MXBean figure is JVM-lifetime cumulative
    // and would otherwise include dataset generation / pre-pass work
    val gc0 = gcSec()
    var (wall, results, extConc, selfConc) = concurrentPass()
    var rerun = false
    var wallFirst = wall
    // the pass ran while another process held >maxExt cores: its
    // numbers overstate the engine. Wait for quiet and re-run — up to
    // maxReruns times (round-11's official artifact recorded ext 2.2
    // cores even after its single re-run; the budget is now 2 by
    // default and env-tunable). The artifact records the first wall
    // and the rerun flag so the decision is auditable.
    val maxReruns =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RERUNS", "2").toInt
    var attempts = 0
    while (extConc > maxExt && attempts < maxReruns) {
      attempts += 1
      System.err.println(f"[bench] concurrent pass contended (ext $extConc%.2f cores) - re-running ($attempts/$maxReruns)")
      rerun = true
      awaitExternalIdle(maxExt, maxWait, s"rerun$attempts")
      val (w2, r2, e2, s2) = concurrentPass()
      // keep the better-conditioned pass (lower external load), the
      // isolated-retime rule: a rerun that landed on a BUSIER window
      // must not replace a cleaner first pass
      if (e2 <= extConc) { wall = w2; results = r2; extConc = e2; selfConc = s2 }
    }
    // gc_sec is the CONCURRENT pass's delta only: the isolated phase
    // below runs deliberate System.gc() hygiene between timings, which
    // would otherwise swamp the heap-thrash diagnostic this field exists
    // to adjudicate
    val gcConc = gcSec() - gc0

    // sequential re-timings: the slowest queries by lane time PLUS the
    // whole pipeline/streaming family (their lane numbers overstate
    // worst — multi-batch orchestration under FAIR contention; round-5
    // shipped st63 at 8.2s lane with no isolated figure to correct it)
    // PLUS a pinned set of long-running single queries whose contaminated
    // numbers have historically been mistaken for regressions (round-6:
    // the driver artifact read t64 at 62.7s under external load vs a
    // true ~4s — one global ext_cores over the whole pass couldn't say
    // WHICH query absorbed the contention)
    // the whole BPE-induction family is pinned so round-over-round
    // induction cost stays trackable even when lane packing hides it
    // (round-12: t65's 0.56->4.29s lane move was unadjudicatable
    // because it lacked an isolated figure — all five BPE queries are
    // pinned now)
    val alwaysIsolated = Set("t64_bpe_merges", "t57_bigram_lm", "t58_joint_curation",
      "t65_bpe_encode", "t68_bpe_batched", "t70_bpe_roundtrip", "t71_bpe_vocab4k")
    // STABLE ISOLATED CORE (round 18): slowest-N membership churns with
    // lane packing (r17: t82/t83 out, s46/m185 in), shrinking the
    // cross-round co-isolated trend denominator. This fixed set — the
    // suite's recurring heavy hitters across lanes, chosen from r17
    // isolated/lane data — is ALWAYS isolated, so round-over-round
    // medians compare a constant set. slowest-N stays for coverage of
    // new movers.
    val isolatedCore = Set(
      "q44_funnel", "q51_window_family", "s42_cosine_dup_pairs",
      "s46_cosine_dup_lsh", "t38_minhash_lsh_pairs", "t48_decontaminate",
      "t73_index_sink_loop", "t82_winnow_sink_loop",
      "e67_config_erc20_balances", "e68_config_daily_export",
      "st73_stream_audio_dedup", "st99_stream_video_thirds_dedup",
      "st126_stream_affine_squeeze_fan_screen", "m80_audio_landmarks",
      "m134_video_thirds_index", "m185_affine_frame_growth",
      "m186_affine_frame_verified_growth", "m192_affine_frame_textured_growth",
      "m193_affine_frame_autocap", "m194_affine_frame_textured_autocap")
    val ok = results.filter(_._3)
    val slowest = ok.sortBy(-_._2).take(nIsolated).map(_._1)
    val family = ok.map(_._1).filter(n => pipelineQueries(n) || n.startsWith("st"))
    val isoNames =
      (slowest ++ family ++ (alwaysIsolated ++ isolatedCore)
        .filter(SparkEntry.queries.contains)).distinct
    // isolated numbers are only honest on a quiet machine: re-check
    // external load first (our own previous pass no longer pollutes the
    // signal the way it polluted loadavg)
    awaitExternalIdle(maxExt, 60, "isolated")
    // Leak ASSERT (round-16): Materialize.scoped now releases every
    // query's eager checkpoints at query exit, so after the concurrent
    // pass the only persistent RDD left should be the shared pair
    // cache. Count anything else into the artifact (leaked_rdds_pass)
    // instead of the round-15 defensive unpersist-all + System.gc —
    // the scoped lifecycle is the fix; this field proves it holds.
    graft.queries.TextOps.resetPairsCache()
    val leakedAfterPass = spark.sparkContext.getPersistentRDDs.toSeq
    leakedAfterPass.foreach { case (id, rdd) =>
      System.err.println(s"[bench] LEAKED persistent RDD after pass: " +
        s"id=$id ${rdd.name}")
      rdd.unpersist(blocking = true)
    }
    val pairConsumersIso = Set("t36_ngram_jaccard", "t41_dedup_clusters",
      "t42_dedup_resolve")
    var leakedIsolated = 0

    // ---- fresh-JVM isolated mode (SPARK_GRAFT_BENCH_FORK_ISOLATED=1):
    // each isolated query runs in its OWN forked JVM via the BENCH_ONLY
    // runner (3 iters: cold incl. session startup, then two warms — the
    // published warm figure is the MIN of the two). No end-of-suite
    // JVM/heap state can touch the numbers. STATISTIC CAVEAT: rounds
    // <=16 published the single warm iteration; rounds >=17 publish
    // min-of-2-warms — a systematically lower statistic, so cross-round
    // fork trends spanning that boundary compare unlike statistics.
    // Both warm iterations land in the artifact (isolated_warms) and
    // the statistic is named there (isolated_stat) so a reader can
    // recompute either. Min-of-2-warms (round 17):
    // the FIRST fork after the concurrent pass deterministically read
    // 2.5-4x its standalone warm on two closing runs (m193 12.86/12.88
    // vs 4.5-5.5 standalone, same command, child-measured ext ~0 both
    // times) — a post-pass window penalty a single warm iteration
    // cannot see past; the second warm iteration recovers it. Costs one
    // extra warm iteration per fork. Default off; the round's local
    // artifact is taken with it on.
    val forkIso =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK_ISOLATED", "0") == "1"
    // the same module options build.sbt hands every forked run JVM
    // (launcher-injected under spark-submit; rebuilt here because the
    // child is a bare `java` exec, not an sbt run)
    def forkJvmArgs: Seq[String] = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}")
    /** One fresh-JVM timing: (cold sec, warm iterations, ext cores), or
      * None if the child died / timed out / reported the query failed.
      * The published warm figure is warms.min; both warms go to the
      * artifact. */
    def forkOne(name: String): Option[(Double, Seq[Double], Double)] = {
      val outFile = java.nio.file.Files.createTempFile("graft-forkiso", ".json")
      val errFile = java.nio.file.Files.createTempFile("graft-forkiso", ".err")
      try {
        val javaBin = java.nio.file.Paths.get(
          System.getProperty("java.home"), "bin", "java").toString
        val cmd = new java.util.ArrayList[String]()
        (Seq(javaBin) ++ forkJvmArgs ++ Seq("-cp",
          System.getProperty("java.class.path"), "graft.Bench"))
          .foreach(cmd.add)
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
        pb.environment().put("SPARK_GRAFT_BENCH_ITERS", "3")
        pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile.toString)
        pb.environment().put("SPARK_GRAFT_BENCH_MAX_WAIT_SEC", "30")
        pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
        pb.redirectError(errFile.toFile)
        val p = pb.start()
        if (!p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)) {
          p.destroyForcibly()
          System.err.println(s"[bench] fork-isolated $name timed out")
          return None
        }
        val txt = java.nio.file.Files.readString(outFile)
        if (!txt.contains("\"failed\":[]")) {
          System.err.println(s"[bench] fork-isolated $name failed " +
            s"(exit ${p.exitValue()}): see ${errFile.toString}")
          return None
        }
        java.nio.file.Files.deleteIfExists(errFile)
        for {
          q <- """"queries":\{"[^"]*":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
          e <- """"ext_cores":\{"[^"]*":([0-9.eE+\-]+)""".r.findFirstMatchIn(txt)
          ts = q.group(1).split(",").map(_.trim.toDouble)
          if ts.nonEmpty
        } yield (ts.head,
          if (ts.length > 1) ts.tail.toSeq else Seq(ts.head),
          e.group(1).toDouble)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] fork-isolated $name error: $e")
          None
      } finally java.nio.file.Files.deleteIfExists(outFile)
    }
    val isoJiff = cpuJiffies(); val isoT0 = System.nanoTime()
    // ext_cores is measured PER QUERY in this pass, and any query that
    // ran while another process held >maxExt cores is re-timed once
    // after waiting for quiet — a transient background job poisons only
    // its own window, not the whole artifact, and the artifact records
    // which entries were re-taken so the decision is auditable
    def timeIsolatedOnce(name: String): (Double, Double) = {
      // t64's merge rules are memoized per data dir and the concurrent
      // pass already warmed them — an isolated timing against that memo
      // is a cache hit (~0.1s) published as the authoritative figure
      // for a ~4s induction. Reset the memo so t64 re-runs for real.
      if (name == "t64_bpe_merges") graft.queries.TextOps.resetMergeMemo()
      // pair-cache consumers time against a warm shared cache — the
      // same basis the lanes use (the build cost is the prewarm's)
      if (pairConsumersIso(name))
        graft.queries.TextOps.prewarmPairs(spark, sfDir)
      val pre = spark.sparkContext.getPersistentRDDs.keySet
      val j0 = cpuJiffies(); val t0 = System.nanoTime()
      val sec = time(name, SparkEntry.queries(name))._1
      val ext = extCores(j0, (System.nanoTime() - t0) / 1e9)
      // leak assert: the scoped release should leave nothing behind —
      // count and drop any survivor (never caches created OUTSIDE the
      // timed run, e.g. the prewarmed pair set)
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!pre.contains(id)) {
            leakedIsolated += 1
            System.err.println(s"[bench] LEAKED persistent RDD after " +
              s"isolated $name: id=$id ${rdd.name}")
            rdd.unpersist(blocking = true)
          }
        }
      (sec, ext)
    }
    val isolatedForkCold =
      scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // every warm iteration per fork (the published figure is the min) —
    // recorded so cross-round trend readers can recompute either
    // statistic across the r16/r17 single-warm → min-of-warms boundary
    val isolatedForkWarms =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // fork failures (timeout / non-zero exit / unparseable JSON) are a
    // COVERAGE hole in the isolated artifact — record them
    // machine-readably (mirroring `failed`) instead of only a stderr
    // line, and fail the run below like a failed concurrent query
    val forkFailed = scala.collection.mutable.ArrayBuffer.empty[String]
    val isolatedFull =
      if (forkIso) isoNames.flatMap { name =>
        forkOne(name) match {
          case Some((cold0, warm0, ext0)) =>
            val (c, w, e, rt) =
              if (ext0 <= maxExt) (cold0, warm0, ext0, false)
              else {
                System.err.println(f"[bench] fork-isolated $name contended " +
                  f"(ext $ext0%.2f cores) - re-forking once")
                awaitExternalIdle(maxExt, 60, s"fork:$name")
                forkOne(name) match {
                  // keep the better-conditioned (lower-ext) fork
                  case Some((c1, w1, e1)) if e1 <= ext0 => (c1, w1, e1, true)
                  case _ => (cold0, warm0, ext0, true)
                }
              }
            isolatedForkCold(name) = c
            isolatedForkWarms(name) = w
            Some((name, w.min, e, rt))
          case None =>
            forkFailed += name
            None
        }
      }
      else isoNames.map { name =>
        val (sec0, ext0) = timeIsolatedOnce(name)
        if (ext0 <= maxExt) (name, sec0, ext0, false)
        else {
          System.err.println(
            f"[bench] isolated $name contended (ext $ext0%.2f cores) - re-timing once")
          awaitExternalIdle(maxExt, 60, s"isolated:$name")
          val (sec1, ext1) = timeIsolatedOnce(name)
          // keep the better-conditioned (lower-ext) measurement
          if (ext1 <= ext0) (name, sec1, ext1, true) else (name, sec0, ext0, true)
        }
      }
    val isolated = isolatedFull.map(t => t._1 -> t._2)
    val isolatedExt = isolatedFull.map(t => t._1 -> t._3)
    val isolatedRetimed = isolatedFull.filter(_._4).map(_._1)
    val extIso = extCores(isoJiff, (System.nanoTime() - isoT0) / 1e9)

    val loadAfter = loadAvg1()
    val failed = results.filter(!_._3).map(_._1)
    // per-lane medians of the CONCURRENT pass — the st-lane bar
    // (<= 2.5 s median) is judged off the artifact of record, so the
    // artifact computes it itself instead of leaving it to a
    // post-processor (round-17 verdict task 4)
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0
      else { val s = xs.sorted; s((s.size - 1) / 2) }
    val laneMedians = results.groupBy(_._1.takeWhile(_.isLetter))
      .map { case (l, rs) => l -> median(rs.map(_._2)) }
      .toSeq.sortBy(_._1)
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${r3(wall)},"unit":"sec",""" +
      s""""queries":${jmap(results.map(t => t._1 -> t._2))},""" +
      s""""isolated":${jmap(isolated)},""" +
      s""""isolated_mode":"${if (forkIso) "fork" else "inproc"}",""" +
      (if (forkIso)
        s""""isolated_cold":${jmap(isolatedForkCold.toSeq)},""" +
        s""""isolated_warms":${isolatedForkWarms.map { case (k, vs) =>
            "\"" + k + "\":[" + vs.map(r3).mkString(",") + "]"
          }.mkString("{", ",", "}")},""" +
        s""""isolated_stat":"min_of_warms",""" +
        s""""fork_failed":[${forkFailed.map("\"" + _ + "\"").mkString(",")}],"""
      else "") +
      s""""isolated_ext":${jmap(isolatedExt)},""" +
      s""""isolated_retimed":[${isolatedRetimed.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""lane_medians":${jmap(laneMedians)},""" +
      s""""sum_sec":${r3(results.map(_._2).sum)},""" +
      s""""ext_cores":${r3(extConc)},"ext_cores_isolated":${r3(extIso)},""" +
      s""""contended_rerun":$rerun,"wall_first":${r3(wallFirst)},""" +
      s""""load_after":${r3(loadAfter)},""" +
      s""""jvm_cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""self_cores":${r3(selfConc)},"gc_sec":${r3(gcConc)},""" +
      s""""cpu_throttled_sec":${r3(cgroupThrottledSec() - throttled0)},""" +
      s""""cpu_quota":"${jesc(cgroupCpuMax())}",""" +
      s""""leaked_rdds_pass":${leakedAfterPass.size},""" +
      s""""leaked_rdds_isolated":$leakedIsolated,""" +
      s""""lanes":${sys.env.getOrElse("SPARK_GRAFT_BENCH_LANES", "10").toInt},"sf":"${jesc(sfDir)}"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    // The LAST stdout line is the driver's bench artifact. It MUST
    // carry the per-query map: the driver's round-over-round per-query
    // comparison ran blind for two rounds (PERF_r16/r17 per_query={})
    // because the map lived only in outPath, which the driver never
    // reads. The rounds-9-11 unparseable artifacts that motivated
    // dropping it were NOT line-length — they were sbt's `[info] `
    // prefix / `[success]` epilogue, fixed separately in round 12
    // (build.sbt outputStrategy + emitAndHalt). The summary stays
    // lighter than the full artifact (no isolated/lane diagnostics),
    // but `queries` is the driver contract and belongs here.
    val summary =
      s"""{"metric":"total","value":${r3(wall)},"unit":"sec",""" +
      s""""queries":${jmap(results.map(t => t._1 -> t._2))},""" +
      s""""n":${results.size},"failed":[${failed.map("\"" + _ + "\"").mkString(",")}],""" +
      (if (forkIso)
        s""""fork_failed":[${forkFailed.map("\"" + _ + "\"").mkString(",")}],"""
      else "") +
      s""""st_median":${r3(laneMedians.toMap.getOrElse("st", 0.0))},""" +
      s""""sum_sec":${r3(results.map(_._2).sum)},""" +
      s""""ext_cores":${r3(extConc)},"contended_rerun":$rerun,""" +
      s""""jvm_cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""self_cores":${r3(selfConc)},"gc_sec":${r3(gcConc)},""" +
      s""""cpu_throttled_sec":${r3(cgroupThrottledSec() - throttled0)},""" +
      s""""full":"${jesc(outPath)}","sf":"${jesc(sfDir)}"}"""
    emitAndHalt(spark, summary,
      if (failed.nonEmpty) 3 else if (forkFailed.nonEmpty) 4 else 0)
  }

  /** Print `line` as the LAST thing this JVM ever writes, then halt.
    *
    * The driver parses the final stdout line as the bench summary, so
    * ordering is: stop Spark first (its INFO/WARN chatter lands on
    * stderr before the summary), flush, print, flush, then
    * `Runtime.halt` — which skips shutdown hooks (Spark's
    * ShutdownHookManager would otherwise log after the summary) and
    * any lingering non-daemon threads. Temp-dir cleanup is the only
    * thing the skipped hooks would have done; acceptable for a bench
    * process. */
  private def emitAndHalt(spark: SparkSession, line: String, code: Int): Nothing = {
    try spark.stop() catch { case _: Throwable => () }
    System.err.flush()
    println(line)
    System.out.flush()
    Runtime.getRuntime.halt(code)
    throw new IllegalStateException("unreachable")
  }
}
