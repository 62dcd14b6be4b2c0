package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalIndex, TextAnalysis, TextDedup}
import Util._

/** LLM-training-data text operators over the `documents` table: exact
  * and near dedup (n-gram Jaccard, MinHash+LSH, SimHash), token stats,
  * quality scoring, language ID, fingerprints. Oracle SQL is provided
  * wherever DuckDB can express the same deterministic computation;
  * md5-based hashing keeps signatures engine-portable.
  */
object TextOps extends QueryPack {

  /** t36/t41/t42 share the exact near-dup pair set — materialize it once
    * per data dir (a cached common subexpression; recomputing the pair
    * expansion three times, concurrently, is pure waste). Memoized as a
    * future: the FIRST caller computes, later callers block on the
    * result only — no global lock serializing unrelated queries (which
    * poisoned t41/t42 bench numbers with lock-wait in round 1). */
  private val pairsCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CompletableFuture[org.apache.spark.sql.DataFrame]]

  private def pairsFuture(s: SparkSession, dir: String) =
    pairsCache.computeIfAbsent(dir, _ =>
      java.util.concurrent.CompletableFuture.supplyAsync { () =>
        val df = TextDedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize so peers reuse, not recompute
        df
      })

  private def jaccardPairs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    pairsFuture(s, dir).join()

  /** Pre-warm hook: materialize the shared pair set and wait for it
    * (benchmarks call this before timing their lanes, so the one-off
    * cache-build cost is reported separately, not smeared into lanes). */
  def prewarmPairs(s: SparkSession, dir: String): Unit = { pairsFuture(s, dir).join(); () }

  /** t64/t65 share the 3-round merge induction — memoized per data dir
    * (the pairsCache precedent): the first caller computes, later
    * callers block on the result, so concurrent bench lanes never run
    * the induction twice. The memo holds the tiny driver-side rule
    * list, not a DataFrame. */
  private val mergeRulesCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CompletableFuture[Seq[(Int, String, String, Long)]]]

  private def learnedMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    mergeRulesCache.computeIfAbsent(dir, _ =>
      java.util.concurrent.CompletableFuture.supplyAsync { () =>
        // scoped: the induction's round-state checkpoints die with the
        // build — only the collected driver-side rule list escapes
        graft.operators.Materialize.scoped {
          TextAnalysis.bpeMergeRules(t(s, dir, "documents"), "text", merges = 3)
            .collect()
            .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
            .toSeq
        }
      }).join()

  /** Bench hook: drop the memoized merge rules so an ISOLATED re-timing
    * of t64 measures the real 3-round induction, not a cache hit left
    * by the concurrent pass (r7 advice: the isolated artifact published
    * a ~40x falsely-fast t64 figure — exactly the number documented to
    * supersede the contaminated lane time). t65 keeps the memo: its
    * isolated figure is the ENCODE cost by contract, and clearing
    * before it would smear a full induction into that number. */
  def resetMergeMemo(): Unit = mergeRulesCache.clear()

  /** Bench hook: drop the shared pair cache CATALOG-CONSISTENTLY
    * (Dataset.unpersist, so CacheManager stops recording the plan as
    * cached) and clear the memo. The bench's isolated phase starts
    * from a clean heap — leaked blocks from the 300+-query concurrent
    * pass were inflating UNRELATED isolated timings (round-15 A/B:
    * the r13->r14 one-sided isolated drift tracked suite size, not
    * code) — and re-prewarms before timing a pair-cache consumer. */
  def resetPairsCache(): Unit = {
    pairsCache.values.forEach { f =>
      if (f.isDone && !f.isCompletedExceptionally) f.join().unpersist()
    }
    pairsCache.clear()
  }

  /** Synthetic keys with PLANTED distance-1 mutations for t63 and the
    * ScaleCheck sweep (one definition, so the gated query and the
    * growth curve can't drift apart): every 5th doc carries its
    * predecessor's md5-prefix key with the 3rd character deleted. */
  private[graft] def plantedFuzzyKeys(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(substring(md5((col("doc_id") - 1).cast("string")), 1, 2),
          substring(md5((col("doc_id") - 1).cast("string")), 4, 5)))
        .otherwise(substring(md5(col("doc_id").cast("string")), 1, 8))
        .as("key"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t31_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      TextDedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"text_hash")
    }),

    "t32_token_stats" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.tokenStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    "t33_quality_score" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Heuristic — no SQL oracle; rows-only check.
    "t34_langid" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    "t35_fingerprint" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    "t36_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      jaccardPairs(s, dir).orderBy($"doc_a", $"doc_b")
    }),

    "t37_minhash_sig" -> ((s, dir) => {
      import s.implicits._
      // signature joined to one scalar string so the driver comparator
      // can sort/hash it (arrays are unsortable in the pandas gate)
      TextDedup.withMinHash(t(s, dir, "documents"), "doc_id", "text")
        .select($"doc_id", array_join($"sig", ",").as("sig"))
        .orderBy($"doc_id")
    }),

    // LSH band/bucket/verify ladder replayed exactly by the SQL oracle
    // (also cross-validated against t36 in the ScalaTest suite).
    "t38_minhash_lsh_pairs" -> ((s, dir) => {
      import s.implicits._
      TextDedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text", 0.5)
        .orderBy($"doc_a", $"doc_b")
    }),

    // UDF-based fingerprint; oracle replays the md5-bit votes + chunk
    // banding in SQL.
    "t39_simhash_pairs" -> ((s, dir) => {
      import s.implicits._
      TextDedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text", 6)
        .orderBy($"doc_a", $"doc_b")
    }),

    // Fold-based hash; oracle uses DuckDB list_reduce for the same fold.
    "t40_rolling_fingerprint" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.rollingFingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // near-dup pairs → connected components (min-label propagation).
    "t41_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      graft.operators.DedupCluster.components(jaccardPairs(s, dir)).orderBy($"doc_id")
    }),

    // full dedup resolution: cluster + keep best by length, tie → low id.
    "t42_dedup_resolve" -> ((s, dir) => {
      import s.implicits._
      graft.operators.DedupCluster.resolve(t(s, dir, "documents"),
        jaccardPairs(s, dir), "doc_id", "n_chars")
        .orderBy($"doc_id")
    }),

    // deterministic hash-based train/val/test split.
    "t43_split" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.deterministicSplit(t(s, dir, "documents"), "doc_id")
        .orderBy($"doc_id")
    }),

    // dataset mixing: per-language sampling rates, membership a pure
    // function of (seed, id) — stable across runs/engines/cluster sizes.
    "t44_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.1), defaultRate = 0.05)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // pretraining sequence packing: concat-in-id-order, cut every 512
    // tokens; distributed prefix sum (range buckets + P-row offsets).
    "t45_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.packSequences(t(s, dir, "documents"), "doc_id", "text", 512)
        .orderBy($"doc_id")
    }),

    // Gopher/C4-style repetition signals: top-token/bigram coverage and
    // duplicate-trigram fraction, as pure column expressions.
    "t46_repetition" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Gopher-style quality gate: individual boolean signals + keep flag.
    "t47_quality_gate" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.gopherQualityFlags(t(s, dir, "documents"), "doc_id", "text",
          minTokens = 10, maxMeanLen = 6.0)
        .orderBy($"doc_id")
    }),

    // benchmark decontamination: 3-shingle overlap of every corpus doc
    // against a probe set (here: the 5 lowest-id docs standing in for an
    // eval benchmark).
    "t48_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TextDedup.contaminationOverlap(docs, "doc_id", "text",
          docs.filter($"doc_id" < 5), "text")
        .orderBy($"doc_id")
    }),

    // t48 decontamination under HOMOGLYPH OBFUSCATION: five corpus
    // rows are spoofed copies of eval documents (Cyrillic lookalikes +
    // zero-width breaks - raw shingles share NOTHING with the eval
    // set, so plain t48 scores them clean). Normalizing BOTH sides
    // first restores the spoofed rows to the eval text exactly (the
    // t74 round-trip, spec-pinned), so the overlap scorer flags them
    // at fraction 1.0. The oracle replays with the spoofed rows
    // carrying their ORIGINAL text - equivalent by the exact
    // round-trip, and it keeps the invisibles out of the SQL.
    "t75_decontaminate_confusables" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val spoofed = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          regexp_replace(
            translate($"text", "aeocpxy",
              "\u0430\u0435\u043e\u0441\u0440\u0445\u0443"),
            " ", "\u200b ").as("text"))
      val corpus = docs.select($"doc_id", $"text").unionByName(spoofed)
      val norm = corpus.select($"doc_id",
        graft.operators.TextAnalysis.normalizeConfusables($"text").as("text"))
      TextDedup.contaminationOverlap(norm, "doc_id", "text",
          docs.filter($"doc_id" < 5).select(
            graft.operators.TextAnalysis.normalizeConfusables($"text")
              .as("text")), "text")
        .orderBy($"doc_id")
    }),

    // WINNOWING fingerprints (Schleimer/Wilkerson/Aiken - MOSS): the
    // guaranteed-recall sampled overlap index. Gate pins per-doc
    // fingerprint count AND position extremes against the full SQL
    // replay of the window-min/rightmost-tie selection.
    "t76_winnow_fingerprints" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      TextDedup.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text")
        .toDF().groupBy($"doc_id")
        .agg(count(lit(1)).as("n_fp"), min($"pos").as("first_pos"),
          max($"pos").as("last_pos"))
        .orderBy($"doc_id")
    }),

    // Winnowing OVERLAP detection - the partial-plagiarism /
    // spliced-span leak: five corpus docs re-appear EMBEDDED inside
    // junk (new prefix + suffix), so exact hashing and whole-doc
    // signatures see nothing, but every shared >= w+k-1-token run
    // shares a selected fingerprint by the winnowing guarantee.
    // Posting-list pair expansion with the family's distinct-doc df
    // cap; full SQL replay.
    "t77_winnow_overlap" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val spliced = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
      val corpus = docs.select($"doc_id", $"text").unionByName(spliced)
      TextDedup.winnowOverlapPairs(corpus, "doc_id", "text", maxDf = 64)
        .orderBy($"doc_a", $"doc_b")
    }),

    // CONTENT-DEFINED-CHUNKING overlap (the LBFS/FastCDC principle at
    // the token level) - the shift-tolerant exact-span complement of
    // t77: boundaries are a pure local-content predicate, so the
    // junk-embedded splices re-synchronize within ~window tokens and
    // share their interior chunks byte-exactly at ANY offset. FOUR of
    // the five planted splices land; doc 2's happens to carve only
    // one interior chunk (CDC is chunk-granular and has NO recall
    // floor - that splice is caught by t77, whose winnowing guarantee
    // is exactly what CDC trades away for byte-exact span identity).
    // Full SQL replay (boundary predicate = md5 last hex digit).
    "t78_cdc_overlap" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val spliced = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
      val corpus = docs.select($"doc_id", $"text").unionByName(spliced)
      // nibbles=2 (boundary p = 1/8, ~8-token chunks): the corpus
      // docs are 30-70 tokens, so the default 16-token chunks leave
      // almost no interior chunk to share
      TextDedup.cdcOverlapPairs(corpus, "doc_id", "text", maxDf = 64,
          nibbles = 2)
        .orderBy($"doc_a", $"doc_b")
    }),

    "t49_unigram_rarity" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.unigramRarity(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    "t50_tfidf_topterms" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy($"doc_id", $"rank")
    }),

    "t51_dup_substring" -> ((s, dir) => {
      import s.implicits._
      TextDedup.dupSubstringCoverage(t(s, dir, "documents"), "doc_id", "text", 8)
        .orderBy($"doc_id")
    }),

    // exact-substring dedup REMOVAL (t51 measures; this edits): kept
    // text after cutting the union of duplicated 8-token windows. The
    // oracle reformulates independently at token level (NOT EXISTS
    // against the duplicated spans) vs Spark's island fold.
    "t56_dup_substring_remove" -> ((s, dir) => {
      import s.implicits._
      TextDedup.dupSubstringRemove(t(s, dir, "documents"), "doc_id", "text", 8)
        .orderBy($"doc_id")
    }),

    // BPE merge-rule induction (the iterative half of subword-vocab
    // training; t52 covers the pretokenizer): 3 rounds of count → argmax
    // → corpus rewrite, ties and merge application pinned so the oracle
    // unrolls the identical 3 rounds in SQL.
    "t64_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      learnedMerges(s, dir).toDF("iter", "tok_a", "tok_b", "pair_count")
        .orderBy($"iter")
    }),

    // BPE ENCODE (the apply half t64's induction learns): the corpus
    // re-encoded with its own 3 learned merges — per-doc REAL subword
    // token counts + an md5 of the encoded text, so the whole encode is
    // hash-gated, not just counted. Oracle unrolls the same 3 rounds
    // keeping doc_id through the rewrites.
    "t65_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val rules = learnedMerges(s, dir).sortBy(_._1).map(x => (x._2, x._3))
      TextAnalysis.bpeEncode(t(s, dir, "documents"), "doc_id", "text", rules)
        .select($"doc_id", $"n_tokens", $"n_merged",
          md5($"text_enc").as("enc_hash"))
        .orderBy($"doc_id")
    }),

    // BATCHED BPE induction — the scale path past t64's sequential
    // 16-merge cap: 64 rules learned in ~merges/batch rounds of
    // count → greedy disjoint-token batch → ONE fused rewrite. Gated
    // by a pinned golden (the corpus is seed-fixed; unrolling 64
    // data-dependent batches in SQL is not expressible).
    "t68_bpe_batched" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bpeMergeRulesBatched(t(s, dir, "documents"), "text", merges = 64)
        .orderBy($"iter")
    }),

    // cross-corpus NEAR-dup decontamination (t48 screens exact n-gram
    // overlap; this catches paraphrased benchmark copies): corpus band
    // buckets x probe band buckets (probe = first 50 docs, the t48
    // convention), exact cross-Jaccard verify.
    "t66_cross_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TextDedup.crossNearDupPairs(docs, "doc_id", "text",
          docs.filter($"doc_id" < 50), "doc_id", "text", 0.5)
        .orderBy($"doc_id", $"probe_id")
    }),

    // character-entropy quality signal (gibberish / compressibility
    // screen): pinned ascending-char fold, ln bit-identical across
    // engines, 6-decimal rounding both sides.
    "t67_char_entropy" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.charEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // fuzzy key matching (FastSS deletion neighborhoods): edit-
    // distance<=1 pairs over synthetic doc keys with PLANTED mutations
    // (every 5th doc carries its predecessor's key with one char
    // deleted — both engines derive identical keys from md5), verified
    // by levenshtein on both sides.
    "t63_fuzzy_keys" -> ((s, dir) => {
      import s.implicits._
      TextDedup.fuzzyKeyPairs(TextOps.plantedFuzzyKeys(t(s, dir, "documents")),
          "doc_id", "key")
        .orderBy($"id_a", $"id_b")
    }),

    // temperature-scaled source mixing (multinomial alpha=0.5 sampling
    // — the multilingual-training mixing rule t55's fixed weights
    // don't cover): sqrt-of-count weights, pinned-fold weight sum,
    // integer quotas, deterministic hash ranks.
    "t62_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.temperatureMixSample(t(s, dir, "documents"),
          "doc_id", "source", targetDocs = 300)
        .orderBy($"source", $"sample_rank")
    }),

    // paragraph-level dedup (C4's line-dedup keep rule at 16-token
    // block granularity): later identical blocks are removed, the first
    // corpus occurrence survives — the keep-first complement of t56's
    // cut-every-occurrence rule.
    "t61_paragraph_dedup" -> ((s, dir) => {
      import s.implicits._
      TextDedup.paragraphDedup(t(s, dir, "documents"), "doc_id", "text", 16)
        .orderBy($"doc_id")
    }),

    "t52_bpe_pretokens" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bpePretokenStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // corpus-LM cross-entropy (CCNet-style typicality signal, corpus as
    // its own model): bigram MLE counts → per-doc mean -ln p, summed in
    // pinned position order on both engines.
    "t57_bigram_lm" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // PII scrub over documents with deterministically INJECTED PII
    // (the base corpus is digit-free word soup, so both engines build
    // the same email/IP-bearing text from (doc_id, text) and the regex
    // path is exercised with non-trivial counts).
    "t54_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val withPii = docs.select($"doc_id", concat($"text",
        when($"doc_id" % 3 === 0,
          concat(lit(" contact user"), $"doc_id".cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when($"doc_id" % 4 === 0,
          concat(lit(" from 10.0."), ($"doc_id" % 200).cast("string"),
            lit(".7"))).otherwise(lit(""))).as("text"))
      TextAnalysis.piiScrub(withPii, "doc_id", "text")
        .select($"doc_id", $"n_emails", $"n_ipv4", $"n_chars_redacted",
          md5($"redacted_text").as("redacted_hash"))
        .orderBy($"doc_id")
    }),

    // URL canonicalization + registered domain + per-domain cap over
    // deterministically constructed crawl URLs (the corpus has no URL
    // column, so both engines build the same messy URL from
    // (doc_id, source): scheme/host case noise, www., default and
    // non-default ports, trailing slashes, utm_ trackers, unsorted
    // params, fragments — every class the canonicalizer exists for).
    "t86_url_domain_cap" -> ((s, dir) => {
      import s.implicits._
      val url = concat(
        when($"doc_id" % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
        when($"doc_id" % 3 === 0, lit("WWW.")).otherwise(lit("")),
        lit("Docs."), $"source",
        when($"doc_id" % 11 === 0, lit(".COM:8080"))
          .when($"doc_id" % 2 === 0, lit(".COM:443"))
          .otherwise(lit(".com:80")),
        lit("/Wiki/Page-"), $"doc_id".cast("string"),
        when($"doc_id" % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&z="), ($"doc_id" % 7).cast("string"),
        lit("&a="), ($"doc_id" % 3).cast("string"),
        when($"doc_id" % 5 === 0, lit("&utm_campaign=x")).otherwise(lit("")),
        when($"doc_id" % 6 === 0,
          concat(lit("#sec-"), ($"doc_id" % 4).cast("string")))
          .otherwise(lit("")))
      TextAnalysis.urlDomainCap(
          t(s, dir, "documents").select($"doc_id", url.as("url")),
          "doc_id", "url", cap = 10)
        .orderBy($"doc_id")
    }),

    // public-suffix-table registered domains: hosts under multi-label
    // ccTLD suffixes (news.<src>.co.uk, blog.<src>.com.au, <src>.co.jp)
    // where the 2-label heuristic PROVABLY mis-groups — it collapses
    // every *.co.uk registrant into one `co.uk` mega-domain (kept_h
    // throttles them collectively) while the broadcast suffix table
    // registers each at 3 labels. gTLD hosts (www.<src>.com,
    // cdn.<src>.org) take the heuristic path in both engines.
    "t87_url_domain_psl" -> ((s, dir) => {
      import s.implicits._
      val url = concat(lit("http://"),
        when($"doc_id" % 5 === 0, concat(lit("News."), $"source", lit(".co.uk")))
          .when($"doc_id" % 5 === 1, concat(lit("blog."), $"source", lit(".com.au")))
          .when($"doc_id" % 5 === 2, concat($"source", lit(".co.jp")))
          .when($"doc_id" % 5 === 3, concat(lit("www."), $"source", lit(".com")))
          .otherwise(concat(lit("cdn."), $"source", lit(".org"))),
        lit("/p-"), $"doc_id".cast("string"))
      TextAnalysis.urlDomainCapPsl(s,
          t(s, dir, "documents").select($"doc_id", url.as("url")),
          "doc_id", "url", cap = 4)
        .orderBy($"doc_id")
    }),

    // FULL published-PSL registered domains — the rule table is the
    // COMPLETE ~9.5k-row publicsuffix.org file shipped as library
    // data (src/main/resources/public_suffix_list.dat), algorithm per
    // the published spec (wildcards, exceptions, >2-label rules,
    // exception-wins-else-longest-match). Hosts hit every rule kind:
    // `shop.<src>.ck` (wildcard — each site registers under its own
    // `<src>.ck`, where the 2-label subset collapses the lot),
    // `a.www.ck` (exception — !www.ck beats *.ck, so www.ck IS the
    // registrant), `x.pref.aichi.jp` (3-label plain rule — subset
    // mis-groups to `aichi.jp`), `b.city.kobe.jp` (exception under
    // the *.kobe.jp city wildcard), `<src>.ck` bare (host IS a public
    // suffix — no registrant label, host kept as its own domain),
    // `<src>.github.io` (a private-domain rule OUTSIDE the curated
    // subset — the real-world contrast: the full file registers each
    // site owner separately, the subset collapses every site into one
    // `github.io` mega-domain and the cap throttles them
    // collectively), plus co.uk/gTLD hosts where both forms agree.
    "t88_url_domain_psl_full" -> ((s, dir) => {
      import s.implicits._
      val url = concat(lit("http://"),
        when($"doc_id" % 8 === 0, concat(lit("shop."), $"source", lit(".ck")))
          .when($"doc_id" % 8 === 1, lit("a.www.ck"))
          .when($"doc_id" % 8 === 2, concat($"source", lit(".pref.aichi.jp")))
          .when($"doc_id" % 8 === 3, concat(lit("news."), $"source", lit(".co.uk")))
          .when($"doc_id" % 8 === 4, concat(lit("www."), $"source", lit(".com")))
          .when($"doc_id" % 8 === 5, concat($"source", lit(".ck")))
          .when($"doc_id" % 8 === 6, concat($"source", lit(".github.io")))
          .otherwise(lit("b.city.kobe.jp")),
        lit("/p-"), $"doc_id".cast("string"))
      TextAnalysis.urlDomainCapPslFull(s,
          t(s, dir, "documents").select($"doc_id", url.as("url")),
          "doc_id", "url", cap = 3)
        .orderBy($"doc_id")
    }),

    // exact-quota dataset mixing toward integer target weights; the
    // selected set is a pure function of (seed, ids), replayed by the
    // oracle's identical integer budget/quota arithmetic.
    "t55_source_mix" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.sourceMixSample(t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 10, "src1" -> 8, "src2" -> 6), defaultWeight = 4)
        .orderBy($"source", $"sample_rank")
    }),

    // The flagship curation composition — the end-to-end shape a
    // training-data pipeline actually runs, chained from the operators
    // above: exact dedup → decontamination screen (vs the doc_id<5
    // probe set, which drops the probes themselves at fraction 1.0) →
    // Gopher quality gate → deterministic split + token counts. Every
    // stage is the same operator its standalone query gates, so the
    // composite checks INTEROP (column contracts, join keys), not new
    // math.
    "t53_curate_pipeline" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val keep = TextDedup.exactDedup(docs, "doc_id", "text")
        .select($"keep_id".as("doc_id"))
      val deduped = docs.join(keep, Seq("doc_id"), "left_semi")
      val clean = TextDedup.contaminationOverlap(deduped, "doc_id", "text",
          docs.filter($"doc_id" < 5), "text")
        .filter($"contaminated_fraction" <= 0.5)
        .select($"doc_id")
      val gated = TextAnalysis.gopherQualityFlags(deduped, "doc_id", "text",
          minTokens = 10, maxMeanLen = 6.0)
        .filter($"keep").select($"doc_id")
      val survivors = deduped
        .join(clean, Seq("doc_id"), "left_semi")
        .join(gated, Seq("doc_id"), "left_semi")
      TextAnalysis.deterministicSplit(survivors, "doc_id")
        .select($"doc_id", $"split")
        .join(TextAnalysis.tokenStats(survivors, "doc_id", "text")
          .select($"doc_id", $"n_tokens"), "doc_id")
        .orderBy($"doc_id")
    }),

    // token-budget quality selection (the data-mixing primitive): best
    // documents by stopword-ratio quality until the budget fills —
    // binned-selection execution, window-cumsum definition.
    "t59_token_budget" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.tokenBudgetSelect(t(s, dir, "documents"), "doc_id", "text",
          budgetTokens = 15000L)
        .orderBy($"doc_id")
    }),

    // BM25 against a fixed query-term set (topic-targeted subset
    // selection): every scoring input is an integral-valued double, so
    // both engines evaluate the identical expression shape.
    "t60_bm25" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bm25Score(t(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join", "spark", "window"))
        .orderBy($"doc_id")
    }),

    // JOINT text+embedding curation: documents and embeddings share an
    // id space, so the composite drops a document if its TEXT is an
    // exact duplicate, its EMBEDDING is a near-duplicate (SRP-LSH,
    // keep-first), or it fails the Gopher gate — the cross-modal
    // curation run a multimodal corpus needs. Every stage is a proven
    // standalone operator; the composite gates interop across tables.
    "t58_joint_curation" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val keepText = docs.groupBy($"text").agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      val dropEmb = graft.operators.Similarity.cosineDupPairsLsh(emb, 0.4, 64)
        .select($"id_b".as("doc_id")).distinct()
      val gated = TextAnalysis.gopherQualityFlags(docs, "doc_id", "text",
          minTokens = 10, maxMeanLen = 6.0)
        .filter($"keep").select($"doc_id")
      docs.join(keepText, Seq("doc_id"), "left_semi")
        .join(dropEmb, Seq("doc_id"), "left_anti")
        .join(gated, Seq("doc_id"), "left_semi")
        .select($"doc_id", $"source", $"lang")
        .orderBy($"doc_id")
    }),

    // Incremental dedup against a PERSISTED corpus index: build the
    // band index of the documents corpus once, then screen an ingest
    // batch (40 mutated re-uploads + 10 reversed-text fresh docs)
    // against it — the corpus never re-shingles. Estimator agreement
    // >= 8/16 (the st68 rule); oracle replays index + probes in SQL.
    "t69_index_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val index = TextDedup.minHashBandIndex(docs, "doc_id", "text")
      val probes = docs.filter($"doc_id" < 40)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" ingestdup tail")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 40 && $"doc_id" < 50)
          .select(($"doc_id" + 2000000).as("doc_id"),
            reverse($"text").as("text")))
      TextDedup.dedupAgainstIndex(probes, index, "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Tokenizer ROUND-TRIP gate: encode the corpus with 64 learned
    // merge rules, decode it back, and hash-compare against the RAW
    // table — the oracle needs no BPE replay at all, so any defect in
    // either direction (ordering, nesting, whitespace) breaks the
    // gate. The corpus is underscore-free and single-spaced (checked),
    // which is exactly the contract bpeDecode documents.
    "t70_bpe_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val rules = TextAnalysis.bpeMergeRulesBatched(docs, "text", merges = 64)
        .select($"iter", $"tok_a", $"tok_b")
        .as[(Int, String, String)].collect().sortBy(_._1)
        .map(r => (r._2, r._3)).toSeq
      TextAnalysis.bpeDecode(
        TextAnalysis.bpeEncode(docs, "doc_id", "text", rules),
        "doc_id", "text_enc", rules)
        .orderBy($"doc_id")
    }),

    // PRODUCTION-VOCABULARY tokenizer gate: encode + decode with 4096
    // merge rules through the token-array kernel (the nested-replace
    // chain t65 uses is structurally incapable past ~200 rules — JVM
    // 64 KB codegen limit). The corpus is arithmetic over doc_id
    // (tokens t0..t8191; even positions open rule pair (t_2v, t_2v+1),
    // odd positions complete it iff (doc_id+j) % 3 == 0), so the
    // oracle replays BOTH the reconstruction AND the expected merge
    // count in SQL — a do-nothing encode fails on n_merged, a broken
    // decode fails on text.
    "t71_bpe_vocab4k" -> ((s, dir) => {
      import s.implicits._
      val rules = (0 until 4096).map(i => (s"t${2 * i}", s"t${2 * i + 1}"))
      val docs = t(s, dir, "documents").select($"doc_id",
        concat_ws(" ", (0 until 64).map { j =>
          val v = ($"doc_id" * 7 + (j / 2) * 53) % 4096
          val tok = if (j % 2 == 0) v * 2
            else when(($"doc_id" + j) % 3 === 0, v * 2 + 1)
              .otherwise((v * 2 + 2) % 8192)
          concat(lit("t"), tok.cast("string"))
        }: _*).as("text"))
      val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", rules)
      TextAnalysis.bpeDecode(enc, "doc_id", "text_enc", rules)
        .join(enc.select($"doc_id", $"n_merged"), Seq("doc_id"))
        .select($"doc_id", $"text", $"n_merged")
        .orderBy($"doc_id")
    }),

    // INDEX MAINTENANCE for the incremental family (t69 screens a
    // frozen index; this closes the steady-state loop): (1) docs 0-4
    // get UPDATED content and re-index — last-write-wins must drop
    // their old rows (batch-1 probes carrying the OLD text + tail must
    // come back KEPT, and probes of the new text must dup to 0-4);
    // (2) batch 1's kept probes are appended, so batch-2 re-uploads of
    // them must dup to their 1000000-space ids — through an index that
    // never re-touched the corpus. Oracle replays both phases from
    // first principles.
    "t72_index_append" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val index0 = TextDedup.minHashBandIndex(docs, "doc_id", "text")
      val updated = docs.filter($"doc_id" < 5)
        .select($"doc_id", reverse($"text").as("text"))
      val index1 = IncrementalIndex.append(index0,
        TextDedup.minHashBandIndex(updated, "doc_id", "text"))
      val b1 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" ingestdup tail")).as("text"))
        .unionAll(docs.filter($"doc_id" < 5)
          .select(($"doc_id" + 1100000).as("doc_id"),
            concat(reverse($"text"), lit(" ingestdup tail")).as("text")))
      val v1 = TextDedup.dedupAgainstIndex(b1, index1, "doc_id", "text")
      val kept1 = b1.join(v1.filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      val index2 = IncrementalIndex.append(index1,
        TextDedup.minHashBandIndex(kept1, "doc_id", "text"))
      val b2 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 3000000).as("doc_id"),
          concat($"text", lit(" ingestdup tail moretail")).as("text"))
      val v2 = TextDedup.dedupAgainstIndex(b2, index2, "doc_id", "text")
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept", $"dup_src"))
        .orderBy($"doc_id")
    }),

    // t72's steady-state loop driven through the parquet SINK (closes
    // round-9 task #7): the band index lives in a SinkTable with
    // ReplacingMergeTree semantics — orderKeys (doc_id, band), so a
    // re-indexed document's 8 new rows supersede its 8 old ones by
    // ingest sequence. The append-only files hold BOTH row versions
    // after the update; the LWW read must hide the stale ones
    // (batch 1), `compact()` must physically drop them WITHOUT
    // changing a verdict (batch 11 re-screens after compaction and
    // must equal batch 1 row for row), and batch-1 keeps appended as
    // increment 2 must catch batch-2 re-uploads (batch 2) — the full
    // screen → append → compact → screen loop over real files, not
    // in-memory frames. Oracle: the t72 replay with batch 1 asserted
    // twice.
    "t73_index_sink_loop" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sinkDir = java.nio.file.Files.createTempDirectory("graft-t73-sink")
      sinkDir.toFile.deleteOnExit()
      val sink = graft.pipeline.SinkTable(
        sinkDir.resolve("band_index").toString,
        orderKeys = Seq("doc_id", "band"))
      sink.append(TextDedup.minHashBandIndex(docs, "doc_id", "text"), 0L)
      val updated = docs.filter($"doc_id" < 5)
        .select($"doc_id", reverse($"text").as("text"))
      sink.append(TextDedup.minHashBandIndex(updated, "doc_id", "text"), 1L)
      val b1 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" ingestdup tail")).as("text"))
        .unionAll(docs.filter($"doc_id" < 5)
          .select(($"doc_id" + 1100000).as("doc_id"),
            concat(reverse($"text"), lit(" ingestdup tail")).as("text")))
      // materialize BEFORE compact(): it deletes and rewrites the
      // sink's files, so a lazy plan over the old files must not
      // survive past it
      val v1 = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstIndex(b1, sink.read(s), "doc_id", "text"))
      sink.compact(s)
      val v1post = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstIndex(b1, sink.read(s), "doc_id", "text"))
      val kept1 = b1.join(v1post.filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      sink.append(TextDedup.minHashBandIndex(kept1, "doc_id", "text"), 2L)
      val b2 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 3000000).as("doc_id"),
          concat($"text", lit(" ingestdup tail moretail")).as("text"))
      val v2 = TextDedup.dedupAgainstIndex(b2, sink.read(s), "doc_id", "text")
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v1post.select(lit(11L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"batch", $"doc_id")
    }),

    // CONFUSABLE-normalized exact dedup (the homoglyph-spam vector
    // exact dedup misses by construction): five corpus docs re-posted
    // with every a/e/o/c/p/x/y swapped for its Cyrillic lookalike and
    // a zero-width space in front of every word break - byte-distinct,
    // visually identical. Hashing the normalizeConfusables() form
    // (pure translate + regexp_replace, codegen'd, replayed verbatim
    // in the oracle) groups each spoof with its source; the raw t31
    // hash provably would not (the spoofed texts contain no ASCII
    // a/e/o..., so their raw md5 differs from every corpus row).
    "t74_confusable_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val spoofed = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          regexp_replace(
            translate($"text", "aeocpxy",
              "\u0430\u0435\u043e\u0441\u0440\u0445\u0443"),
            " ", "\u200b ").as("text"))
      val corpus = docs.select($"doc_id", $"text").unionByName(spoofed)
      corpus.select($"doc_id",
          graft.operators.TextAnalysis.normalizeConfusables($"text").as("norm"))
        .groupBy(md5($"norm").as("text_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"text_hash")
    }),

    // BOUNDED content-defined chunking (the production LBFS/FastCDC
    // form \u2014 closes round-10 gap #2): hard minChunk=6 / maxChunk=24
    // token bounds over a synthetic corpus with (a) 10 masters,
    // (b) 5 junk-embedded splices (re-synchronization must survive the
    // bounds: interior chunks realign after one common accepted
    // boundary, so every splice still pairs with its master), and
    // (c) a degenerate single-token-repeated doc whose window hashes
    // are uniform \u2014 unbounded CDC would carve it into one chunk or
    // all-minimum slivers; the bounds force every interior chunk into
    // [6, 24]. The boundary set is STATEFUL (each edge depends on the
    // previous accepted edge), so the SQL oracle cannot replay it \u2014
    // pinned golden (the cdcChunks scaladoc draws exactly this line).
    // Output per doc: chunk count, shortest/longest chunk, and the
    // lowest master it overlaps with (shared distinct chunks >= 2).
    "t79_cdc_bounded" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      // synthetic, dir-independent corpus: token j of doc i is
      // w<(i*131 + j*17 + i*j*7) mod 97>, 120 tokens per master — the
      // i*j cross term keeps two masters' token streams from being
      // cyclic shifts of each other (a pure-linear formula makes every
      // master a re-synchronizing near-dup of every other)
      def tokens(idCol: org.apache.spark.sql.Column, n: Int,
          tag: String): org.apache.spark.sql.Column =
        concat_ws(" ", (0 until n).map(j =>
          concat(lit(tag),
            (idCol * 131 + j * 17 + idCol * j * 7) % 97)): _*)
      val masters = s.range(0, 10)
        .select($"id".as("doc_id"), tokens($"id", 120, "w").as("text"))
      val spliced = s.range(20, 25)
        .select($"id".as("doc_id"),
          concat(tokens($"id", 17, "j"), lit(" "),
            tokens($"id" - 20, 120, "w"), lit(" "),
            tokens($"id" + 7, 5, "k")).as("text"))
      val degen = s.range(30, 31)
        .select($"id".as("doc_id"),
          concat_ws(" ", (0 until 150).map(_ => lit("zzz")): _*).as("text"))
      val corpus = masters.unionByName(spliced).unionByName(degen)
      val chunks = graft.operators.Materialize.eager(
        TextDedup.cdcChunksBounded(corpus, "doc_id", "text",
          nibbles = 2, minChunk = 6, maxChunk = 24).toDF())
      val stats = chunks.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"), min($"n_tokens").as("min_len"),
          max($"n_tokens").as("max_len"))
      val dup = TextDedup.cdcOverlapPairsBounded(corpus, "doc_id", "text",
          nibbles = 2, minChunk = 6, maxChunk = 24, maxDf = 64)
        .filter($"doc_a" < 10)
        .groupBy($"doc_b".as("doc_id")).agg(min($"doc_a").as("dup_src"))
      stats.join(dup, Seq("doc_id"), "left")
        .select($"doc_id", $"n_chunks", $"min_len", $"max_len", $"dup_src")
        .orderBy($"doc_id")
    }),

    // WINNOWING incremental index (the t69/t72 contract at the t76
    // seam \u2014 closes round-10 gap #3): corpus fingerprinted ONCE into
    // winnowIndex (version-stamped); batch 1 screens 5 junk-embedded
    // splices (every one lands on its master by the winnowing
    // guarantee) + 5 reversed-text fresh docs (kept); the kept probes
    // APPEND (IncrementalIndex.append) and batch 2's re-splices of the
    // reversed texts must land on the 2000000-space ids \u2014 through an
    // index that never re-fingerprinted the corpus. Full SQL replay
    // (the t76/t77 winnow selection, two screen phases).
    "t80_winnow_index" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val index0 = TextDedup.winnowIndex(docs, "doc_id", "text")
      val b1 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            reverse($"text").as("text")))
      val v1 = TextDedup.dedupAgainstWinnowIndex(b1, index0, "doc_id", "text")
      val kept1 = b1.join(v1.filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      val index1 = IncrementalIndex.append(index0,
        TextDedup.winnowIndex(kept1, "doc_id", "text"))
      val b2 = docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          concat(lit("fresh head junk of the second batch "),
            reverse($"text"), lit(" second tail junk")).as("text"))
      val v2 = TextDedup.dedupAgainstWinnowIndex(b2, index1, "doc_id", "text")
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"doc_id")
    }),

    // CDC chunk incremental index (t80's shift-tolerant exact-span
    // sibling): corpus chunked ONCE into cdcChunkIndex (nibbles=2,
    // version-stamped); batch 1 screens the 5 splices \u2014 FOUR land,
    // doc 2's splice carves only one interior chunk and is KEPT (the
    // honest CDC recall trade t78 documents; winnowing's t80 catches
    // that one) \u2014 plus 5 reversed fresh docs; kept probes append;
    // batch 2 re-splices of the reversed texts screen against the
    // appended index (two carve >= 2 shared interior chunks and land;
    // the other three are the same chunk-granular recall trade \u2014 t80's
    // winnowing guarantee catches all five). Full SQL replay
    // (stateless chunk predicate).
    "t81_cdc_index" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val index0 = TextDedup.cdcChunkIndex(docs, "doc_id", "text",
        nibbles = 2)
      val b1 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            reverse($"text").as("text")))
      val v1 = TextDedup.dedupAgainstCdcIndex(b1, index0, "doc_id", "text",
        nibbles = 2)
      val kept1 = b1.join(v1.filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      val index1 = IncrementalIndex.append(index0,
        TextDedup.cdcChunkIndex(kept1, "doc_id", "text", nibbles = 2))
      val b2 = docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          concat(lit("fresh head junk of the second batch "),
            reverse($"text"), lit(" second tail junk")).as("text"))
      val v2 = TextDedup.dedupAgainstCdcIndex(b2, index1, "doc_id", "text",
        nibbles = 2)
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"doc_id")
    }),

    // t80's loop through the parquet SINK (the t73 shape at the
    // winnow seam): the fingerprint index lives in a SinkTable
    // (orderKeys (doc_id, fp) — append-only ingest, so LWW never
    // binds; the re-index UPDATE leg needs delete-by-doc, not
    // key-wise LWW, and has its own gate: t84).
    // Screen batch 1 over the sink files, `compact()` must rewrite
    // them WITHOUT changing a verdict (batch 11 re-screens and must
    // equal batch 1 row for row), kept probes append as increment 1,
    // and batch 2's re-splices land on them — the full
    // screen -> compact -> append -> screen loop over real files.
    // Oracle: the t80 replay with batch 1 asserted twice.
    "t82_winnow_sink_loop" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val sinkDir = java.nio.file.Files.createTempDirectory("graft-t82-sink")
      sinkDir.toFile.deleteOnExit()
      val sink = graft.pipeline.SinkTable(
        sinkDir.resolve("winnow_index").toString,
        orderKeys = Seq("doc_id", "fp"))
      sink.append(TextDedup.winnowIndex(docs, "doc_id", "text"), 0L)
      val b1 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            reverse($"text").as("text")))
      // materialize BEFORE compact(): it deletes and rewrites the
      // sink's files, so a lazy plan over the old files must not
      // survive past it (the t73 precedent)
      val v1 = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstWinnowIndex(b1, sink.read(s), "doc_id", "text"))
      sink.compact(s)
      val v1post = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstWinnowIndex(b1, sink.read(s), "doc_id", "text"))
      val kept1 = b1.join(v1post.filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      sink.append(TextDedup.winnowIndex(kept1, "doc_id", "text"), 1L)
      val b2 = docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          concat(lit("fresh head junk of the second batch "),
            reverse($"text"), lit(" second tail junk")).as("text"))
      val v2 = TextDedup.dedupAgainstWinnowIndex(b2, sink.read(s),
        "doc_id", "text")
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v1post.select(lit(11L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"batch", $"doc_id")
    }),

    // t81's loop through the parquet sink — the CDC sibling of t82
    // (orderKeys (doc_id, ch)); same screen -> compact -> append ->
    // screen phases, same honest chunk-granular recall in batch 2.
    // Oracle: the t81 replay with batch 1 asserted twice.
    "t83_cdc_sink_loop" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val sinkDir = java.nio.file.Files.createTempDirectory("graft-t83-sink")
      sinkDir.toFile.deleteOnExit()
      val sink = graft.pipeline.SinkTable(
        sinkDir.resolve("cdc_index").toString,
        orderKeys = Seq("doc_id", "ch"))
      sink.append(TextDedup.cdcChunkIndex(docs, "doc_id", "text",
        nibbles = 2), 0L)
      val b1 = docs.filter($"doc_id" < 5)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            reverse($"text").as("text")))
      val v1 = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstCdcIndex(b1, sink.read(s), "doc_id", "text",
          nibbles = 2))
      sink.compact(s)
      val v1post = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstCdcIndex(b1, sink.read(s), "doc_id", "text",
          nibbles = 2))
      val kept1 = b1.join(v1post.filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      sink.append(TextDedup.cdcChunkIndex(kept1, "doc_id", "text",
        nibbles = 2), 1L)
      val b2 = docs.filter($"doc_id" >= 40 && $"doc_id" < 45)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          concat(lit("fresh head junk of the second batch "),
            reverse($"text"), lit(" second tail junk")).as("text"))
      val v2 = TextDedup.dedupAgainstCdcIndex(b2, sink.read(s),
        "doc_id", "text", nibbles = 2)
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v1post.select(lit(11L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"batch", $"doc_id")
    }),

    // The UPDATE leg the t82 comment keeps out of its gate: re-indexing
    // an EDITED document changes the doc's hash-KEY set, so key-wise
    // LWW (compact()/read() on orderKeys (doc_id, fp)) can never retire
    // the old rows — batch 1 screens against the stale+fresh union and
    // a probe borrowing the RETIRED text still dups (the hazard,
    // pinned). SinkTable.compactByDoc then applies the
    // IncrementalIndex.append delete-by-doc rule at compaction time
    // (latest _ingest_seq batch per doc survives), and batch 2
    // re-screens the SAME probes: retired-text probes KEPT, current-
    // text probes dup to the edited doc, unedited-doc controls
    // unchanged. Oracle: full SQL replay — winnow fingerprints over
    // originals + edited versions, screened vs the stale union and the
    // post-update index.
    "t84_winnow_update_loop" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val sinkDir = java.nio.file.Files.createTempDirectory("graft-t84-sink")
      sinkDir.toFile.deleteOnExit()
      val sink = graft.pipeline.SinkTable(
        sinkDir.resolve("winnow_index").toString,
        orderKeys = Seq("doc_id", "fp"))
      sink.append(TextDedup.winnowIndex(docs, "doc_id", "text"), 0L)
      // edit docs 10-14 in place: entirely new body, disjoint fps
      val edited = docs.filter($"doc_id" >= 10 && $"doc_id" < 15)
        .select($"doc_id",
          concat(lit("edited replacement body "), reverse($"text"))
            .as("text"))
      sink.append(TextDedup.winnowIndex(edited, "doc_id", "text"), 1L)
      val probes = docs.filter($"doc_id" >= 10 && $"doc_id" < 15)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 10 && $"doc_id" < 15)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            concat(lit("junk prefix tokens before the borrowed span "),
              lit("edited replacement body "), reverse($"text"),
              lit(" junk suffix after")).as("text")))
        .unionAll(docs.filter($"doc_id" < 5)
          .select(($"doc_id" + 3000000L).as("doc_id"),
            concat(lit("junk prefix tokens before the borrowed span "),
              $"text", lit(" junk suffix after")).as("text")))
      // materialize BEFORE compactByDoc(): it rewrites the sink files
      val v1 = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstWinnowIndex(probes, sink.read(s),
          "doc_id", "text"))
      sink.compactByDoc(s, "doc_id")
      val v2 = TextDedup.dedupAgainstWinnowIndex(probes, sink.read(s),
        "doc_id", "text")
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"batch", $"doc_id")
    }),

    // t84's CDC sibling (orderKeys (doc_id, ch)): same edit →
    // re-index → stale-union screen → compactByDoc → re-screen
    // phases, chunk-hash keyed. Oracle: the t81 chunking replayed
    // over originals + edits with both index states.
    "t85_cdc_update_loop" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val sinkDir = java.nio.file.Files.createTempDirectory("graft-t85-sink")
      sinkDir.toFile.deleteOnExit()
      val sink = graft.pipeline.SinkTable(
        sinkDir.resolve("cdc_index").toString,
        orderKeys = Seq("doc_id", "ch"))
      sink.append(TextDedup.cdcChunkIndex(docs, "doc_id", "text",
        nibbles = 2), 0L)
      val edited = docs.filter($"doc_id" >= 10 && $"doc_id" < 15)
        .select($"doc_id",
          concat(lit("edited replacement body "), reverse($"text"))
            .as("text"))
      sink.append(TextDedup.cdcChunkIndex(edited, "doc_id", "text",
        nibbles = 2), 1L)
      val probes = docs.filter($"doc_id" >= 10 && $"doc_id" < 15)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat(lit("junk prefix tokens before the borrowed span "),
            $"text", lit(" junk suffix after")).as("text"))
        .unionAll(docs.filter($"doc_id" >= 10 && $"doc_id" < 15)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            concat(lit("junk prefix tokens before the borrowed span "),
              lit("edited replacement body "), reverse($"text"),
              lit(" junk suffix after")).as("text")))
        .unionAll(docs.filter($"doc_id" < 5)
          .select(($"doc_id" + 3000000L).as("doc_id"),
            concat(lit("junk prefix tokens before the borrowed span "),
              $"text", lit(" junk suffix after")).as("text")))
      val v1 = graft.operators.Materialize.eager(
        TextDedup.dedupAgainstCdcIndex(probes, sink.read(s),
          "doc_id", "text", nibbles = 2))
      sink.compactByDoc(s, "doc_id")
      val v2 = TextDedup.dedupAgainstCdcIndex(probes, sink.read(s),
        "doc_id", "text", nibbles = 2)
      v1.select(lit(1L).as("batch"), $"doc_id", $"kept", $"dup_src")
        .unionAll(v2.select(lit(2L).as("batch"), $"doc_id", $"kept",
          $"dup_src"))
        .orderBy($"batch", $"doc_id")
    })
  )

  // the t80/t81 replay CTEs (winnow / CDC index screens over corpus +
  // two probe batches), shared with the sink-loop forms t82/t83 which
  // must land on identical verdicts with batch 1 asserted twice
  private val t80ReplayCtes: String =
    """WITH allt AS (
          SELECT doc_id, text, 0 AS grp FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id < 5
          UNION ALL
          SELECT doc_id + 2000000, reverse(text), 1
          FROM documents WHERE doc_id >= 40 AND doc_id < 45
          UNION ALL
          SELECT doc_id + 3000000,
            'fresh head junk of the second batch ' || reverse(text) ||
              ' second tail junk', 2
          FROM documents WHERE doc_id >= 40 AND doc_id < 45),
        w AS (SELECT doc_id, grp, string_split(text, ' ') AS tk FROM allt),
        g AS (SELECT doc_id, grp, list_transform(range(1, greatest(len(tk)-3,0)+1),
            i -> md5(tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3])) AS gs
          FROM w),
        sel AS (SELECT doc_id, grp, gs,
          CASE WHEN len(gs) = 0 THEN CAST([] AS BIGINT[])
            WHEN len(gs) <= 5 THEN
              [len(gs) + 1 - list_position(list_reverse(gs), list_min(gs))]
            ELSE list_distinct(list_transform(range(1, len(gs)-5+2),
              j -> j + 5 - list_position(
                list_reverse(list_slice(gs, j, j+4)),
                list_min(list_slice(gs, j, j+4)))))
          END AS ps FROM g),
        fpd AS (SELECT DISTINCT doc_id, grp, gs[u.p] AS fp
          FROM sel, unnest(ps) u(p)),
        s1 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.grp = 1 AND b.grp = 0
          GROUP BY 1, 2),
        v1 AS (SELECT f.doc_id, MIN(s1.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 1) f
          LEFT JOIN s1 ON s1.pid = f.doc_id AND s1.c >= 3
          GROUP BY 1),
        idx1 AS (SELECT doc_id, fp FROM fpd WHERE grp = 0
          UNION ALL
          SELECT doc_id, fp FROM fpd WHERE grp = 1 AND doc_id IN
            (SELECT doc_id FROM v1 WHERE dup_src IS NULL)),
        s2 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN idx1 b ON a.fp = b.fp AND a.grp = 2
          GROUP BY 1, 2),
        v2 AS (SELECT f.doc_id, MIN(s2.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 2) f
          LEFT JOIN s2 ON s2.pid = f.doc_id AND s2.c >= 3
          GROUP BY 1)
"""

  private val t81ReplayCtes: String =
    """WITH allt AS (
          SELECT doc_id, text, 0 AS grp FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id < 5
          UNION ALL
          SELECT doc_id + 2000000, reverse(text), 1
          FROM documents WHERE doc_id >= 40 AND doc_id < 45
          UNION ALL
          SELECT doc_id + 3000000,
            'fresh head junk of the second batch ' || reverse(text) ||
              ' second tail junk', 2
          FROM documents WHERE doc_id >= 40 AND doc_id < 45),
        w AS (SELECT doc_id, grp, string_split(text, ' ') AS tk FROM allt),
        bp AS (SELECT doc_id, grp, tk, list_filter(range(4, len(tk)+1),
            i -> substr(md5(tk[i-3]||' '||tk[i-2]||' '||tk[i-1]||' '||tk[i]),
              32, 1) IN ('0', '1')) AS bs
          FROM w),
        ed AS (SELECT doc_id, grp, tk,
            list_concat(list_concat([CAST(0 AS BIGINT)], bs),
              CASE WHEN len(bs) > 0 AND bs[-1] = len(tk)
                THEN CAST([] AS BIGINT[])
                ELSE [CAST(len(tk) AS BIGINT)] END) AS es
          FROM bp),
        ch0 AS (SELECT doc_id, grp,
            list_filter(list_transform(range(1, len(es)),
              j -> CASE WHEN es[j+1] - es[j] >= 4
                THEN md5(array_to_string(
                  list_slice(tk, es[j]+1, es[j+1]), ' '))
                ELSE NULL END), x -> x IS NOT NULL) AS hs
          FROM ed),
        fpd AS (SELECT DISTINCT doc_id, grp, u.h AS fp
          FROM ch0, unnest(hs) u(h)),
        s1 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.grp = 1 AND b.grp = 0
          GROUP BY 1, 2),
        v1 AS (SELECT f.doc_id, MIN(s1.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 1) f
          LEFT JOIN s1 ON s1.pid = f.doc_id AND s1.c >= 2
          GROUP BY 1),
        idx1 AS (SELECT doc_id, fp FROM fpd WHERE grp = 0
          UNION ALL
          SELECT doc_id, fp FROM fpd WHERE grp = 1 AND doc_id IN
            (SELECT doc_id FROM v1 WHERE dup_src IS NULL)),
        s2 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN idx1 b ON a.fp = b.fp AND a.grp = 2
          GROUP BY 1, 2),
        v2 AS (SELECT f.doc_id, MIN(s2.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 2) f
          LEFT JOIN s2 ON s2.pid = f.doc_id AND s2.c >= 2
          GROUP BY 1)
"""

  // the t84/t85 replay CTEs (index UPDATE leg): grp 0 = corpus
  // originals, grp 3 = edited versions of docs 10-14 (same doc_ids,
  // disjoint content), grp 1 = probes (retired text / current text /
  // unedited control). v1 screens vs the stale+fresh union (what
  // key-wise LWW leaves behind), v2 vs the delete-by-doc result.
  private val t84ReplayCtes: String =
    """WITH allt AS (
          SELECT doc_id, text, 0 AS grp FROM documents
          UNION ALL
          SELECT doc_id, 'edited replacement body ' || reverse(text), 3
          FROM documents WHERE doc_id >= 10 AND doc_id < 15
          UNION ALL
          SELECT doc_id + 1000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id >= 10 AND doc_id < 15
          UNION ALL
          SELECT doc_id + 2000000,
            'junk prefix tokens before the borrowed span ' ||
              'edited replacement body ' || reverse(text) ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id >= 10 AND doc_id < 15
          UNION ALL
          SELECT doc_id + 3000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id < 5),
        w AS (SELECT doc_id, grp, string_split(text, ' ') AS tk FROM allt),
        g AS (SELECT doc_id, grp, list_transform(range(1, greatest(len(tk)-3,0)+1),
            i -> md5(tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3])) AS gs
          FROM w),
        sel AS (SELECT doc_id, grp, gs,
          CASE WHEN len(gs) = 0 THEN CAST([] AS BIGINT[])
            WHEN len(gs) <= 5 THEN
              [len(gs) + 1 - list_position(list_reverse(gs), list_min(gs))]
            ELSE list_distinct(list_transform(range(1, len(gs)-5+2),
              j -> j + 5 - list_position(
                list_reverse(list_slice(gs, j, j+4)),
                list_min(list_slice(gs, j, j+4)))))
          END AS ps FROM g),
        fpd AS (SELECT DISTINCT doc_id, grp, gs[u.p] AS fp
          FROM sel, unnest(ps) u(p)),
        idxs AS (SELECT DISTINCT doc_id, fp FROM fpd WHERE grp IN (0, 3)),
        idxp AS (SELECT doc_id, fp FROM fpd
          WHERE grp = 3 OR (grp = 0 AND (doc_id < 10 OR doc_id >= 15))),
        s1 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN idxs b ON a.fp = b.fp AND a.grp = 1
          GROUP BY 1, 2),
        v1 AS (SELECT f.doc_id, MIN(s1.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 1) f
          LEFT JOIN s1 ON s1.pid = f.doc_id AND s1.c >= 3
          GROUP BY 1),
        s2 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN idxp b ON a.fp = b.fp AND a.grp = 1
          GROUP BY 1, 2),
        v2 AS (SELECT f.doc_id, MIN(s2.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 1) f
          LEFT JOIN s2 ON s2.pid = f.doc_id AND s2.c >= 3
          GROUP BY 1)
"""

  private val t85ReplayCtes: String =
    """WITH allt AS (
          SELECT doc_id, text, 0 AS grp FROM documents
          UNION ALL
          SELECT doc_id, 'edited replacement body ' || reverse(text), 3
          FROM documents WHERE doc_id >= 10 AND doc_id < 15
          UNION ALL
          SELECT doc_id + 1000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id >= 10 AND doc_id < 15
          UNION ALL
          SELECT doc_id + 2000000,
            'junk prefix tokens before the borrowed span ' ||
              'edited replacement body ' || reverse(text) ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id >= 10 AND doc_id < 15
          UNION ALL
          SELECT doc_id + 3000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after', 1
          FROM documents WHERE doc_id < 5),
        w AS (SELECT doc_id, grp, string_split(text, ' ') AS tk FROM allt),
        bp AS (SELECT doc_id, grp, tk, list_filter(range(4, len(tk)+1),
            i -> substr(md5(tk[i-3]||' '||tk[i-2]||' '||tk[i-1]||' '||tk[i]),
              32, 1) IN ('0', '1')) AS bs
          FROM w),
        ed AS (SELECT doc_id, grp, tk,
            list_concat(list_concat([CAST(0 AS BIGINT)], bs),
              CASE WHEN len(bs) > 0 AND bs[-1] = len(tk)
                THEN CAST([] AS BIGINT[])
                ELSE [CAST(len(tk) AS BIGINT)] END) AS es
          FROM bp),
        ch0 AS (SELECT doc_id, grp,
            list_filter(list_transform(range(1, len(es)),
              j -> CASE WHEN es[j+1] - es[j] >= 4
                THEN md5(array_to_string(
                  list_slice(tk, es[j]+1, es[j+1]), ' '))
                ELSE NULL END), x -> x IS NOT NULL) AS hs
          FROM ed),
        fpd AS (SELECT DISTINCT doc_id, grp, u.h AS fp
          FROM ch0, unnest(hs) u(h)),
        idxs AS (SELECT DISTINCT doc_id, fp FROM fpd WHERE grp IN (0, 3)),
        idxp AS (SELECT doc_id, fp FROM fpd
          WHERE grp = 3 OR (grp = 0 AND (doc_id < 10 OR doc_id >= 15))),
        s1 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN idxs b ON a.fp = b.fp AND a.grp = 1
          GROUP BY 1, 2),
        v1 AS (SELECT f.doc_id, MIN(s1.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 1) f
          LEFT JOIN s1 ON s1.pid = f.doc_id AND s1.c >= 2
          GROUP BY 1),
        s2 AS (SELECT a.doc_id AS pid, b.doc_id AS src, COUNT(*) AS c
          FROM fpd a JOIN idxp b ON a.fp = b.fp AND a.grp = 1
          GROUP BY 1, 2),
        v2 AS (SELECT f.doc_id, MIN(s2.src) AS dup_src
          FROM (SELECT DISTINCT doc_id FROM fpd WHERE grp = 1) f
          LEFT JOIN s2 ON s2.pid = f.doc_id AND s2.c >= 2
          GROUP BY 1)
"""

  // the t72 two-phase replay (index update + ingest screens) as CTEs,
  // shared with t73 — which runs the SAME phases through the parquet
  // SinkTable and must land on the identical verdicts
  private val t72ReplayCtes: String =
    """WITH idx1 AS (SELECT doc_id, text FROM documents WHERE doc_id >= 5
          UNION ALL SELECT doc_id, reverse(text) FROM documents WHERE doc_id < 5),
        p1 AS (SELECT doc_id + 1000000 AS doc_id, text || ' ingestdup tail' AS text
            FROM documents WHERE doc_id < 5
          UNION ALL SELECT doc_id + 1100000, reverse(text) || ' ingestdup tail'
            FROM documents WHERE doc_id < 5),
        all1 AS (SELECT * FROM idx1 UNION ALL SELECT * FROM p1),
        w1 AS (SELECT doc_id, string_split(text, ' ') AS w FROM all1),
        sh1 AS (SELECT doc_id, list_transform(range(1, greatest(len(w)-2,0)+1),
          i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS shingles FROM w1),
        sg1 AS (SELECT doc_id, list_transform(range(0,16),
          i -> list_aggregate(list_transform(shingles,
            s -> md5(CAST(i AS VARCHAR)||':'||s)), 'min')) AS sig FROM sh1),
        bd1 AS (SELECT doc_id, b, md5(sig[b*2+1]||'|'||sig[b*2+2]) AS band_key
          FROM sg1, range(0,8) t(b)),
        dup1 AS (SELECT l.doc_id, MIN(e.doc_id) AS dup_src
          FROM bd1 l
          JOIN bd1 e ON l.b = e.b AND l.band_key = e.band_key
            AND e.doc_id < 1000000 AND l.doc_id >= 1000000
          JOIN sg1 sl ON sl.doc_id = l.doc_id
          JOIN sg1 se ON se.doc_id = e.doc_id
          WHERE len(list_filter(range(1, 17), i ->
            sl.sig[i] IS NOT NULL AND sl.sig[i] = se.sig[i])) >= 8
          GROUP BY l.doc_id),
        v1 AS (SELECT p.doc_id, d.dup_src IS NULL AS kept, d.dup_src
          FROM p1 p LEFT JOIN dup1 d ON d.doc_id = p.doc_id),
        kept1 AS (SELECT p.doc_id, p.text FROM p1 p
          JOIN v1 ON v1.doc_id = p.doc_id AND v1.kept),
        idx2 AS (SELECT * FROM idx1 UNION ALL SELECT * FROM kept1),
        p2 AS (SELECT doc_id + 3000000 AS doc_id,
            text || ' ingestdup tail moretail' AS text
          FROM documents WHERE doc_id < 5),
        all2 AS (SELECT * FROM idx2 UNION ALL SELECT * FROM p2),
        w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM all2),
        sh2 AS (SELECT doc_id, list_transform(range(1, greatest(len(w)-2,0)+1),
          i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS shingles FROM w2),
        sg2 AS (SELECT doc_id, list_transform(range(0,16),
          i -> list_aggregate(list_transform(shingles,
            s -> md5(CAST(i AS VARCHAR)||':'||s)), 'min')) AS sig FROM sh2),
        bd2 AS (SELECT doc_id, b, md5(sig[b*2+1]||'|'||sig[b*2+2]) AS band_key
          FROM sg2, range(0,8) t(b)),
        dup2 AS (SELECT l.doc_id, MIN(e.doc_id) AS dup_src
          FROM bd2 l
          JOIN bd2 e ON l.b = e.b AND l.band_key = e.band_key
            AND e.doc_id < 3000000 AND l.doc_id >= 3000000
          JOIN sg2 sl ON sl.doc_id = l.doc_id
          JOIN sg2 se ON se.doc_id = e.doc_id
          WHERE len(list_filter(range(1, 17), i ->
            sl.sig[i] IS NOT NULL AND sl.sig[i] = se.sig[i])) >= 8
          GROUP BY l.doc_id),
        v2 AS (SELECT p.doc_id, d.dup_src IS NULL AS kept, d.dup_src
          FROM p2 p LEFT JOIN dup2 d ON d.doc_id = p.doc_id)"""

  def oracleSql: Map[String, String] = Map(
    "t31_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY text_hash""",
    "t32_token_stats" ->
      """SELECT doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        CAST(list_sum(list_transform(string_split(text, ' '),
          x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subtokens,
        length(text) AS n_chars
        FROM documents ORDER BY doc_id""",
    "t33_quality_score" ->
      """SELECT doc_id,
        CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
        CAST(len(list_filter(string_split(text, ' '),
          x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
          / len(string_split(text, ' ')) AS stopword_ratio,
        CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
          / len(string_split(text, ' ')) AS mean_token_len
        FROM documents ORDER BY doc_id""",
    "t38_minhash_lsh_pairs" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_transform(range(1, greatest(len(w)-2,0)+1),
          i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS shingles FROM words),
        sigs AS (SELECT doc_id, list_transform(range(0,16),
          i -> list_aggregate(list_transform(shingles,
            s -> md5(CAST(i AS VARCHAR)||':'||s)), 'min')) AS sig FROM sh),
        bands AS (SELECT doc_id, b, md5(sig[b*2+1]||'|'||sig[b*2+2]) AS band_key
          FROM sigs, range(0,8) t(b)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
          FROM bands a JOIN bands b2 ON a.b = b2.b AND a.band_key = b2.band_key
            AND a.doc_id < b2.doc_id),
        d AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        jac AS (SELECT common.doc_a, common.doc_b,
            CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
          FROM common
          JOIN cand ON common.doc_a = cand.doc_a AND common.doc_b = cand.doc_b
          JOIN sizes sa ON common.doc_a = sa.doc_id
          JOIN sizes sb ON common.doc_b = sb.doc_id)
        SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
        ORDER BY doc_a, doc_b""",
    "t39_simhash_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sims AS (SELECT doc_id,
          list_sum(list_transform(range(0,64), b ->
            CASE WHEN list_sum(list_transform(tk, t ->
                CASE WHEN (CAST('0x'||substr(md5(t),1,16) AS UBIGINT) >> b) & 1 = 1
                THEN 1 ELSE -1 END)) > 0
            THEN (CAST(1 AS UBIGINT) << b) ELSE CAST(0 AS UBIGINT) END)) AS sim
          FROM toks),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(bit_count(xor(CAST(a.sim AS UBIGINT), CAST(b.sim AS UBIGINT)))
              AS INTEGER) AS hamming
          FROM sims a JOIN sims b ON a.doc_id < b.doc_id
          WHERE ((CAST(a.sim AS UBIGINT) >> 0) & 65535) = ((CAST(b.sim AS UBIGINT) >> 0) & 65535)
             OR ((CAST(a.sim AS UBIGINT) >> 16) & 65535) = ((CAST(b.sim AS UBIGINT) >> 16) & 65535)
             OR ((CAST(a.sim AS UBIGINT) >> 32) & 65535) = ((CAST(b.sim AS UBIGINT) >> 32) & 65535)
             OR ((CAST(a.sim AS UBIGINT) >> 48) & 65535) = ((CAST(b.sim AS UBIGINT) >> 48) & 65535))
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6
        ORDER BY doc_a, doc_b""",
    "t40_rolling_fingerprint" ->
      """SELECT doc_id,
        list_reduce(
          list_prepend(CAST(17 AS BIGINT), list_transform(string_split(text,' '),
            tk -> CAST(list_sum(list_transform(range(1, length(tk)+1),
                    i -> ascii(tk[i]))) AS BIGINT))),
          (acc, x) -> (acc * 31 + x) % 2147483648) AS rolling_hash
        FROM documents ORDER BY doc_id""",
    "t34_langid" ->
      """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS wl
          FROM documents),
        langs(lang, marks) AS (VALUES
          ('en', ['the','a','of','and','to','is','in','it']),
          ('de', ['der','die','das','und','ist','nicht','ein']),
          ('es', ['el','la','de','que','y','es','un']),
          ('fr', ['le','la','les','et','est','un','une']),
          ('zh', ['de5','shi4','le5','zai4','he2'])),
        scores AS (SELECT doc_id, lang, len(list_intersect(wl, marks)) AS score
          FROM w, langs),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM scores)
        SELECT doc_id, lang AS predicted_lang, CAST(score AS INTEGER) AS marker_hits
        FROM ranked WHERE rn = 1 ORDER BY doc_id""",
    "t35_fingerprint" ->
      """SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
        FROM documents ORDER BY doc_id""",
    "t36_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle FROM words),
        d AS (SELECT DISTINCT doc_id, shingle FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        ORDER BY doc_a, doc_b""",
    "t41_dedup_clusters" ->
      """WITH RECURSIVE pairs AS (
          WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle FROM words),
          d AS (SELECT DISTINCT doc_id, shingle FROM sh),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
          common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
          SELECT doc_a, doc_b FROM common
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        ),
        nodes AS (SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs),
        edges AS (SELECT doc_a AS x, doc_b AS y FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(id, lab) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT e.x, r.lab FROM edges e JOIN reach r ON r.id = e.y
        )
        SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
        ORDER BY doc_id""",
    "t42_dedup_resolve" ->
      """WITH RECURSIVE pairs AS (
          WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle FROM words),
          d AS (SELECT DISTINCT doc_id, shingle FROM sh),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
          common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
          SELECT doc_a, doc_b FROM common
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        ),
        nodes AS (SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs),
        edges AS (SELECT doc_a AS x, doc_b AS y FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(id, lab) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT e.x, r.lab FROM edges e JOIN reach r ON r.id = e.y
        ),
        comp AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars,
          row_number() OVER (PARTITION BY COALESCE(c.cluster_id, d.doc_id)
            ORDER BY d.n_chars DESC, d.doc_id ASC) = 1 AS keep
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        ORDER BY d.doc_id""",
    "t43_split" ->
      """SELECT doc_id,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bucket,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 80 THEN 'train'
             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""",
    "t37_minhash_sig" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 2, 0) + 1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shingles FROM words)
        SELECT doc_id,
          array_to_string(list_transform(range(0, 16), i ->
            list_aggregate(list_transform(shingles,
              s -> md5(CAST(i AS VARCHAR) || ':' || s)), 'min')), ',') AS sig
        FROM sh ORDER BY doc_id""",
    // hashUniform = first 52 bits of md5('seed:id') / 2^52 — every step
    // exact in doubles, so the filter replays bit-identically
    "t44_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        WHERE CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 13) AS UBIGINT)
                / 4503599627370496.0
              < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                          WHEN 'es' THEN 0.1 ELSE 0.05 END
        ORDER BY doc_id""",
    // the oracle's single global window IS the semantic spec; the Spark
    // side computes the same prefix sum distributed
    "t45_pack_sequences" ->
      """WITH n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - n_tokens AS BIGINT) AS start_token FROM n)
        SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, start_token,
          CAST(start_token // 512 AS BIGINT) AS chunk_id,
          CAST(start_token % 512 AS BIGINT) AS chunk_offset
        FROM c ORDER BY doc_id""",
    // same explode → count → max/sum shape as the Spark side: linear in
    // corpus tokens (a per-row list-mode computation is quadratic+)
    "t46_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        c1 AS (SELECT doc_id, g, count(*) AS c FROM (
            SELECT doc_id, unnest(tk) AS g FROM w) GROUP BY doc_id, g),
        s1 AS (SELECT doc_id, max(c) AS top, sum(c) AS n FROM c1 GROUP BY doc_id),
        c2 AS (SELECT doc_id, g, count(*) AS c FROM (
            SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-1,0)+1),
              i -> tk[i] || ' ' || tk[i+1])) AS g FROM w) GROUP BY doc_id, g),
        s2 AS (SELECT doc_id, max(c) AS top, sum(c) AS n FROM c2 GROUP BY doc_id),
        c3 AS (SELECT doc_id, g, count(*) AS c FROM (
            SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM w)
            GROUP BY doc_id, g),
        s3 AS (SELECT doc_id, max(c) AS top, sum(c) AS n, count(*) AS ndist
          FROM c3 GROUP BY doc_id)
        SELECT w.doc_id,
          COALESCE(CAST(s1.top AS DOUBLE) / s1.n, 0.0) AS top_token_fraction,
          COALESCE(CAST(s2.top AS DOUBLE) / s2.n, 0.0) AS top_bigram_fraction,
          COALESCE(CAST(s3.n - s3.ndist AS DOUBLE) / s3.n, 0.0) AS dup_trigram_fraction
        FROM w LEFT JOIN s1 ON w.doc_id = s1.doc_id
          LEFT JOIN s2 ON w.doc_id = s2.doc_id
          LEFT JOIN s3 ON w.doc_id = s3.doc_id
        ORDER BY w.doc_id""",
    // same replay over documents + the five spoofed rows, which carry
    // their ORIGINAL text here (normalization round-trips the spoof
    // exactly; the Spark side exercises the real spoofed bytes)
    "t75_decontaminate_confusables" ->
      """WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 5),
        w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
        sh AS (SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM w)),
        probe AS (SELECT DISTINCT g FROM (
            SELECT unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
            FROM w WHERE doc_id < 5)),
        per AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
        hit AS (SELECT s.doc_id, count(*) AS n_contaminated
          FROM sh s JOIN probe p ON s.g = p.g GROUP BY s.doc_id)
        SELECT per.doc_id, per.n_shingles,
          COALESCE(hit.n_contaminated, 0) AS n_contaminated,
          CAST(COALESCE(hit.n_contaminated, 0) AS DOUBLE) / per.n_shingles
            AS contaminated_fraction
        FROM per LEFT JOIN hit ON per.doc_id = hit.doc_id
        ORDER BY per.doc_id""",
    // the winnowing selection replayed: k=4 gram md5s, window w=5,
    // rightmost-min via list_position over the reversed slice
    "t76_winnow_fingerprints" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        g AS (SELECT doc_id, list_transform(range(1, greatest(len(tk)-3,0)+1),
            i -> md5(tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3])) AS gs
          FROM w),
        sel AS (SELECT doc_id,
          CASE WHEN len(gs) = 0 THEN CAST([] AS BIGINT[])
            WHEN len(gs) <= 5 THEN
              [len(gs) + 1 - list_position(list_reverse(gs), list_min(gs))]
            ELSE list_distinct(list_transform(range(1, len(gs)-5+2),
              j -> j + 5 - list_position(
                list_reverse(list_slice(gs, j, j+4)),
                list_min(list_slice(gs, j, j+4)))))
          END AS ps FROM g)
        SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_fp,
          CAST(list_min(ps) AS INTEGER) AS first_pos,
          CAST(list_max(ps) AS INTEGER) AS last_pos
        FROM sel WHERE len(ps) > 0 ORDER BY doc_id""",
    // same selection over documents + the five junk-embedded splices,
    // then distinct-fingerprint posting lists -> pairs (df <= 64,
    // shared >= 3)
    "t77_winnow_overlap" ->
      """WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after'
          FROM documents WHERE doc_id < 5),
        w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
        g AS (SELECT doc_id, list_transform(range(1, greatest(len(tk)-3,0)+1),
            i -> md5(tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3])) AS gs
          FROM w),
        sel AS (SELECT doc_id, gs,
          CASE WHEN len(gs) = 0 THEN CAST([] AS BIGINT[])
            WHEN len(gs) <= 5 THEN
              [len(gs) + 1 - list_position(list_reverse(gs), list_min(gs))]
            ELSE list_distinct(list_transform(range(1, len(gs)-5+2),
              j -> j + 5 - list_position(
                list_reverse(list_slice(gs, j, j+4)),
                list_min(list_slice(gs, j, j+4)))))
          END AS ps FROM g),
        fpd AS (SELECT DISTINCT doc_id, gs[u.p] AS fp
          FROM sel, unnest(ps) u(p)),
        ok AS (SELECT fp FROM fpd GROUP BY fp
          HAVING COUNT(DISTINCT doc_id) <= 64)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          COUNT(*) AS n_shared
        FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN ok ON ok.fp = a.fp
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
        ORDER BY doc_a, doc_b""",
    // CDC replayed: boundary after token i iff the 4-token window
    // md5's last hex digit is 0 or 1 (nibbles=2); spans under 4
    // tokens drop; shared
    // distinct chunk hashes >= 2 under the df <= 64 cap
    "t78_cdc_overlap" ->
      """WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
            'junk prefix tokens before the borrowed span ' || text ||
              ' junk suffix after'
          FROM documents WHERE doc_id < 5),
        w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
        bp AS (SELECT doc_id, tk, list_filter(range(4, len(tk)+1),
            i -> substr(md5(tk[i-3]||' '||tk[i-2]||' '||tk[i-1]||' '||tk[i]),
              32, 1) IN ('0', '1')) AS bs
          FROM w),
        ed AS (SELECT doc_id, tk,
            list_concat(list_concat([CAST(0 AS BIGINT)], bs),
              CASE WHEN len(bs) > 0 AND bs[-1] = len(tk)
                THEN CAST([] AS BIGINT[])
                ELSE [CAST(len(tk) AS BIGINT)] END) AS es
          FROM bp),
        ch0 AS (SELECT doc_id,
            list_filter(list_transform(range(1, len(es)),
              j -> CASE WHEN es[j+1] - es[j] >= 4
                THEN md5(array_to_string(
                  list_slice(tk, es[j]+1, es[j+1]), ' '))
                ELSE NULL END), x -> x IS NOT NULL) AS hs
          FROM ed),
        fpd AS (SELECT DISTINCT doc_id, u.h AS ch
          FROM ch0, unnest(hs) u(h)),
        ok AS (SELECT ch FROM fpd GROUP BY ch
          HAVING COUNT(DISTINCT doc_id) <= 64)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          COUNT(*) AS n_shared
        FROM fpd a JOIN fpd b ON a.ch = b.ch AND a.doc_id < b.doc_id
        JOIN ok ON ok.ch = a.ch
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ORDER BY doc_a, doc_b""",
    // t80: the t76/t77 winnow selection replayed over corpus (grp 0),
    // batch-1 probes (grp 1: splices + reversed fresh), batch-2
    // probes (grp 2); screen 1 vs grp 0, append = grp-1 keeps' fps,
    // screen 2 vs grp 0 + appended — the full t72-shaped loop derived
    // from first principles. CTEs shared with t82, which runs the
    // SAME phases through the parquet SinkTable and must land on the
    // identical verdicts (batch 1 asserted twice, pre/post compact).
    "t80_winnow_index" -> (t80ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id,
            dup_src IS NULL AS kept, dup_src FROM v1
          UNION ALL
          SELECT CAST(2 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v2)
        ORDER BY doc_id"""),
    "t82_winnow_sink_loop" -> (t80ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id,
            dup_src IS NULL AS kept, dup_src FROM v1
          UNION ALL
          SELECT CAST(11 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v1
          UNION ALL
          SELECT CAST(2 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v2)
        ORDER BY batch, doc_id"""),
    // t81: the t78 CDC chunking replayed over the same three groups;
    // screens count shared distinct chunk hashes >= 2. CTEs shared
    // with t83 (the sink-loop form; batch 1 asserted twice).
    "t81_cdc_index" -> (t81ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id,
            dup_src IS NULL AS kept, dup_src FROM v1
          UNION ALL
          SELECT CAST(2 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v2)
        ORDER BY doc_id"""),
    "t83_cdc_sink_loop" -> (t81ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id,
            dup_src IS NULL AS kept, dup_src FROM v1
          UNION ALL
          SELECT CAST(11 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v1
          UNION ALL
          SELECT CAST(2 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v2)
        ORDER BY batch, doc_id"""),
    // t84: the t80 winnowing replayed over originals (grp 0) + edited
    // versions (grp 3, same doc_ids) + probes (grp 1). Batch 1
    // screens vs the stale+fresh UNION (key-wise LWW can't retire
    // hash-keyed rows), batch 2 vs the post-compactByDoc index
    // (edited docs keep ONLY their grp-3 rows).
    "t84_winnow_update_loop" -> (t84ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id,
            dup_src IS NULL AS kept, dup_src FROM v1
          UNION ALL
          SELECT CAST(2 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v2)
        ORDER BY batch, doc_id"""),
    // t85: the CDC sibling — t81's chunking over the same three
    // groups, shared distinct chunk hashes >= 2.
    "t85_cdc_update_loop" -> (t85ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id,
            dup_src IS NULL AS kept, dup_src FROM v1
          UNION ALL
          SELECT CAST(2 AS BIGINT), doc_id, dup_src IS NULL, dup_src
          FROM v2)
        ORDER BY batch, doc_id"""),
    "t48_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM w)),
        probe AS (SELECT DISTINCT g FROM (
            SELECT unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
            FROM w WHERE doc_id < 5)),
        per AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
        hit AS (SELECT s.doc_id, count(*) AS n_contaminated
          FROM sh s JOIN probe p ON s.g = p.g GROUP BY s.doc_id)
        SELECT per.doc_id, per.n_shingles,
          COALESCE(hit.n_contaminated, 0) AS n_contaminated,
          CAST(COALESCE(hit.n_contaminated, 0) AS DOUBLE) / per.n_shingles
            AS contaminated_fraction
        FROM per LEFT JOIN hit ON per.doc_id = hit.doc_id
        ORDER BY per.doc_id""",
    "t47_quality_gate" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        sig AS (SELECT doc_id,
          len(tk) BETWEEN 10 AND 100000 AS ok_token_count,
          CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk)
            BETWEEN 2.0 AND 6.0 AS ok_mean_token_len,
          len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) >= 1
            AS ok_stopwords,
          CAST(length(regexp_replace(text, '[^#…|<>{}]', '', 'g')) AS DOUBLE)
            / length(text) <= 0.1 AS ok_symbol_ratio
          FROM w)
        SELECT doc_id, ok_token_count, ok_mean_token_len, ok_stopwords,
          ok_symbol_ratio,
          ok_token_count AND ok_mean_token_len AND ok_stopwords
            AND ok_symbol_ratio AS keep
        FROM sig ORDER BY doc_id""",
    "t49_unigram_rarity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents),
        td AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
        wt AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY token) AS tf FROM td)
        SELECT doc_id,
          CAST(sum(c) AS BIGINT) AS n_tokens,
          CAST(CAST(sum(c * tf) AS BIGINT) AS DOUBLE) / CAST(sum(c) AS BIGINT)
            AS avg_tf,
          CAST(CAST(sum(CASE WHEN tf = 1 THEN c ELSE 0 END) AS BIGINT) AS DOUBLE)
            / CAST(sum(c) AS BIGINT) AS hapax_frac,
          CAST(min(tf) AS BIGINT) AS min_tf
        FROM wt GROUP BY doc_id ORDER BY doc_id""",
    "t50_tfidf_topterms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents),
        td AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
        wt AS (SELECT doc_id, token, c,
            CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df FROM td),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (SELECT doc_id, token, c AS tf_doc, df,
            CAST(c * n_docs AS DOUBLE) / df AS score FROM wt, n),
        ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, token) AS INTEGER) AS rank FROM scored)
        SELECT doc_id, token, tf_doc, df, score, rank
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",
    // t51: the oracle keys windows by the window STRING where Spark uses
    // xxhash64 of it — identical counts barring 64-bit collisions (the
    // same portability trick t48's oracle uses for shingles)
    "t51_dup_substring" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        win AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS start,
            array_to_string(tk[i:i+7], ' ') AS g
          FROM w, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS i)),
        dup AS (SELECT doc_id, start FROM (
          SELECT doc_id, start, count(*) OVER (PARTITION BY g) AS cnt FROM win)
          WHERE cnt >= 2),
        cov AS (SELECT doc_id, greatest(0, (start + 8) - greatest(start,
            coalesce(max(start + 8) OVER (PARTITION BY doc_id ORDER BY start
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))) AS adds
          FROM dup),
        agg AS (SELECT doc_id, CAST(sum(adds) AS BIGINT) AS covered_tokens
          FROM cov GROUP BY doc_id)
        SELECT w.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
          COALESCE(agg.covered_tokens, 0) AS covered_tokens,
          CAST(COALESCE(agg.covered_tokens, 0) AS DOUBLE) / len(tk)
            AS dup_coverage
        FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id ORDER BY w.doc_id""",
    // independent token-level reformulation: a token survives iff NO
    // duplicated window covers its index (the Spark side folds the
    // island complement instead — agreement checks both formulations)
    "t56_dup_substring_remove" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        win AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS start,
            array_to_string(tk[i:i+7], ' ') AS g
          FROM w, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS i)),
        dup AS (SELECT doc_id, start FROM (
          SELECT doc_id, start, count(*) OVER (PARTITION BY g) AS cnt FROM win)
          WHERE cnt >= 2),
        tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, tk[i] AS tok
          FROM w, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)),
        keep AS (SELECT t.doc_id, t.idx, t.tok FROM tok t
          WHERE NOT EXISTS (SELECT 1 FROM dup d
            WHERE d.doc_id = t.doc_id AND d.start <= t.idx AND t.idx < d.start + 8)),
        ka AS (SELECT doc_id, count(*) AS kept_tokens,
            string_agg(tok, ' ' ORDER BY idx) AS kept_text
          FROM keep GROUP BY doc_id)
        SELECT w.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
          CAST(COALESCE(ka.kept_tokens, 0) AS BIGINT) AS kept_tokens,
          COALESCE(ka.kept_text, '') AS kept_text
        FROM w LEFT JOIN ka ON w.doc_id = ka.doc_id ORDER BY w.doc_id""",
    // first-occurrence keep rule replayed with one window over
    // md5(block) — the same hash key the Spark side partitions on
    "t61_paragraph_dedup" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents),
        blk AS (SELECT doc_id, UNNEST(range(0, (len(toks) + 15) // 16)) AS i,
            toks FROM tk),
        b2 AS (SELECT doc_id, i,
            array_to_string(list_slice(toks, i * 16 + 1, i * 16 + 16), ' ') AS block
          FROM blk),
        r AS (SELECT doc_id, i, block,
            row_number() OVER (PARTITION BY md5(block)
              ORDER BY doc_id, i) AS rn
          FROM b2)
        SELECT doc_id,
          COUNT(*) AS n_blocks,
          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          COALESCE(string_agg(CASE WHEN rn = 1 THEN block END, ' '
            ORDER BY i), '') AS kept_text
        FROM r GROUP BY doc_id ORDER BY doc_id""",
    // constants stay UNFOLDED ((1.2 + 1), (1 - 0.75)) so both engines
    // run the same IEEE folds; term contributions add left-to-right
    "t60_bm25" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        d AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl,
            CAST(len(list_filter(tk, x -> x = 'hash')) AS DOUBLE) AS tf0,
            CAST(len(list_filter(tk, x -> x = 'join')) AS DOUBLE) AS tf1,
            CAST(len(list_filter(tk, x -> x = 'spark')) AS DOUBLE) AS tf2,
            CAST(len(list_filter(tk, x -> x = 'window')) AS DOUBLE) AS tf3
          FROM w),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl,
            CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
            CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
            CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
            CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
          FROM d)
        SELECT doc_id, round(
          ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1) * (tf0 * (1.2 + 1)) /
            (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
          + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1) * (tf1 * (1.2 + 1)) /
            (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
          + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1) * (tf2 * (1.2 + 1)) /
            (tf2 + 1.2 * (1 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
          + ln((n_docs - df3 + 0.5) / (df3 + 0.5) + 1) * (tf3 * (1.2 + 1)) /
            (tf3 + 1.2 * (1 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
          , 6) AS bm25
        FROM d, s ORDER BY doc_id""",
    // the oracle IS the semantic definition: order by (quality DESC,
    // id), select while the running token total fits — the binned
    // execution must land on exactly this set
    "t59_token_budget" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        q AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
            CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is')))
              AS DOUBLE) / len(tk) AS quality
          FROM w),
        c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum FROM q)
        SELECT doc_id, n_tokens, quality, (cum <= 15000) AS selected
        FROM c ORDER BY doc_id""",
    // t58 composes the proven fragments across TABLES: t31's min-id
    // text dedup, s46's SRP near-dup drop over embeddings (bits derived
    // from the embedding count), st66's Gopher gate signals.
    "t58_joint_curation" ->
      """WITH keep_text AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
        nb AS (
          SELECT GREATEST(6, LEAST(48,
              CASE WHEN m <= 1 THEN 6 ELSE length(bin(m - 1)) END)) AS bits
          FROM (SELECT (count(*) + 7) // 8 AS m FROM embeddings)),
        planes AS (
          SELECT s, j, list_transform(range(0, 64), i ->
            2.0 * ((CAST('0x' || substr(md5('srp:' || s || ':' || j || ':' || i), 1, 16) AS UBIGINT) >> 11)
                   / 9007199254740992.0) - 1.0) AS p
          FROM range(42, 46) ts(s), range(0, 48) t(j), nb WHERE t.j < nb.bits),
        sgn AS (SELECT e.vec_id, pl.s, pl.j,
            CASE WHEN list_sum(list_transform(range(1, 65), i ->
                CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN (CAST(1 AS BIGINT) << pl.j) ELSE 0 END AS bit
          FROM embeddings e, planes pl),
        buckets AS (SELECT vec_id, s, CAST(SUM(bit) AS BIGINT) AS bucket
          FROM sgn GROUP BY vec_id, s),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM buckets a JOIN buckets b
            ON a.s = b.s AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        dot AS (SELECT cand.id_a, cand.id_b,
            round(list_sum(list_transform(range(1, 65), i ->
                CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(range(1, 65), i ->
                  CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(range(1, 65), i ->
                  CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))))
              , 6) AS cos_sim
          FROM cand
          JOIN embeddings x ON x.vec_id = cand.id_a
          JOIN embeddings y ON y.vec_id = cand.id_b),
        drop_emb AS (SELECT DISTINCT id_b AS doc_id FROM dot WHERE cos_sim >= 0.4),
        w AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        gated AS (SELECT doc_id FROM w
          WHERE len(tk) BETWEEN 10 AND 100000
            AND CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk)
                BETWEEN 2.0 AND 6.0
            AND len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) >= 1
            AND CAST(length(regexp_replace(text, '[^#…|<>{}]', '', 'g')) AS DOUBLE)
                / length(text) <= 0.1)
        SELECT d.doc_id, d.source, d.lang
        FROM documents d
        JOIN keep_text USING (doc_id)
        JOIN gated USING (doc_id)
        WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_emb)
        ORDER BY d.doc_id""",
    // bigram LM replay: same MLE counts, ln of the same double divide,
    // per-doc sum over a position-ORDERED list so fold order matches
    "t57_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        inst AS (SELECT doc_id, i AS pos, tk[i] AS a, tk[i+1] AS b
          FROM w, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 0) + 1)) AS i)),
        cab AS (SELECT a, b, count(*) AS cab FROM inst GROUP BY a, b),
        ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM cab GROUP BY a),
        model AS (SELECT cab.a, cab.b,
            ln(CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE)) AS lnp
          FROM cab JOIN ca ON cab.a = ca.a),
        perdoc AS (SELECT i.doc_id, count(*) AS n_bigrams,
            list_sum(list(m.lnp ORDER BY i.pos)) AS sumln
          FROM inst i JOIN model m ON m.a = i.a AND m.b = i.b
          GROUP BY i.doc_id)
        SELECT w.doc_id, CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
          round(-(p.sumln / p.n_bigrams), 6) AS cross_entropy
        FROM w LEFT JOIN perdoc p ON w.doc_id = p.doc_id ORDER BY w.doc_id""",
    "t52_bpe_pretokens" ->
      """WITH p AS (SELECT doc_id,
          regexp_extract_all(text,
            '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +') AS toks
        FROM documents)
        SELECT doc_id,
          len(toks) AS n_pretokens,
          len(list_distinct(toks)) AS n_distinct_pretokens,
          CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / len(toks) AS mean_pretoken_len
        FROM p ORDER BY doc_id""",
    // the oracle rebuilds the same messy URLs, then replays the
    // canonicalizer rule-for-rule (the regexes are in the Java/RE2
    // common subset) and the per-domain cap with the same
    // hash-ordered row_number
    "t86_url_domain_cap" ->
      """WITH u AS (SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
          (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
          'Docs.' || source ||
          (CASE WHEN doc_id % 11 = 0 THEN '.COM:8080'
                WHEN doc_id % 2 = 0 THEN '.COM:443' ELSE '.com:80' END) ||
          '/Wiki/Page-' || CAST(doc_id AS VARCHAR) ||
          (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
          '?utm_source=feed&z=' || CAST(doc_id % 7 AS VARCHAR) ||
          '&a=' || CAST(doc_id % 3 AS VARCHAR) ||
          (CASE WHEN doc_id % 5 = 0 THEN '&utm_campaign=x' ELSE '' END) ||
          (CASE WHEN doc_id % 6 = 0 THEN '#sec-' || CAST(doc_id % 4 AS VARCHAR)
                ELSE '' END) AS url
        FROM documents),
        c AS (SELECT doc_id,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          regexp_replace(lower(regexp_extract(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^:]*)', 1)),
            '^www\.([^.]+\..*)', '\1') AS host,
          regexp_extract(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':([0-9]+)$', 1) AS port,
          regexp_extract(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '^([^?]*)', 1) AS path0,
          regexp_extract(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '\?(.*)$', 1) AS query
        FROM u),
        k AS (SELECT doc_id, scheme || '://' || host ||
          (CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
                OR (scheme = 'http' AND port = '80'))
            THEN ':' || port ELSE '' END) ||
          (CASE WHEN path0 = '' THEN '/'
            ELSE regexp_replace(path0, '(.)/$', '\1') END) ||
          (CASE WHEN q <> '' THEN '?' || q ELSE '' END) AS url_canon
        FROM (SELECT *, array_to_string(list_sort(list_filter(
            string_split(query, '&'),
            p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q FROM c)),
        d AS (SELECT doc_id, url_canon,
          regexp_extract(regexp_extract(regexp_extract(url_canon,
            '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1), '^([^:]*)', 1),
            '([^.]+\.[^.]+)$', 1) AS domain
        FROM k),
        r AS (SELECT doc_id, url_canon, domain,
          CAST(row_number() OVER (PARTITION BY domain
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS domain_rank
        FROM d)
        SELECT doc_id, url_canon, domain, domain_rank,
          domain_rank <= 10 AS kept
        FROM r ORDER BY doc_id""",
    // the oracle's suffix table is GENERATED from the same Scala Seq
    // (publicSuffixesValuesSql) — the two engines share one list by
    // construction; the rest replays host canonicalization, the
    // longest-suffix registration rule, and both hash-ordered caps
    "t87_url_domain_psl" ->
      s"""WITH u AS (SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 'News.' || source || '.co.uk'
                WHEN doc_id % 5 = 1 THEN 'blog.' || source || '.com.au'
                WHEN doc_id % 5 = 2 THEN source || '.co.jp'
                WHEN doc_id % 5 = 3 THEN 'www.' || source || '.com'
                ELSE 'cdn.' || source || '.org' END) AS rawhost
        FROM documents),
        h AS (SELECT doc_id,
          regexp_replace(lower(rawhost), '^www\\.([^.]+\\..*)', '\\1') AS host
        FROM u),
        d AS (SELECT doc_id,
          'http://' || host || '/p-' || CAST(doc_id AS VARCHAR) AS url_canon,
          regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS last2,
          regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) AS last3
        FROM h),
        psl(suffix) AS (VALUES ${graft.operators.TextAnalysis.publicSuffixesValuesSql}),
        j AS (SELECT doc_id, url_canon,
          CASE WHEN suffix IS NOT NULL AND last3 <> '' THEN last3
               ELSE last2 END AS domain,
          last2 AS domain_h
        FROM d LEFT JOIN psl ON last2 = suffix),
        r AS (SELECT doc_id, url_canon, domain, domain_h,
          CAST(row_number() OVER (PARTITION BY domain
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS domain_rank,
          CAST(row_number() OVER (PARTITION BY domain_h
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rank_h
        FROM j)
        SELECT doc_id, url_canon, domain, domain_rank,
          domain_rank <= 4 AS kept, domain_h, rank_h, rank_h <= 4 AS kept_h
        FROM r ORDER BY doc_id""",
    // FULL-PSL oracle: the rule table (key, kind, ps_len) is GENERATED
    // from the SAME published ~9.5k-row file the Spark side broadcasts
    // (and the subset table from the same curated Seq), and the
    // published algorithm — exception wins, else longest match, else
    // the implicit `*` — is replayed as the same exploded-tail
    // equi-join + per-doc max the Spark plan runs
    "t88_url_domain_psl_full" ->
      s"""WITH u AS (SELECT doc_id,
          (CASE WHEN doc_id % 8 = 0 THEN 'shop.' || source || '.ck'
                WHEN doc_id % 8 = 1 THEN 'a.www.ck'
                WHEN doc_id % 8 = 2 THEN source || '.pref.aichi.jp'
                WHEN doc_id % 8 = 3 THEN 'news.' || source || '.co.uk'
                WHEN doc_id % 8 = 4 THEN 'www.' || source || '.com'
                WHEN doc_id % 8 = 5 THEN source || '.ck'
                WHEN doc_id % 8 = 6 THEN source || '.github.io'
                ELSE 'b.city.kobe.jp' END) AS rawhost
        FROM documents),
        h AS (SELECT doc_id,
          regexp_replace(rawhost, '^www\\.([^.]+\\..*)', '\\1') AS host
        FROM u),
        d AS (SELECT doc_id,
          'http://' || host || '/p-' || CAST(doc_id AS VARCHAR) AS url_canon,
          host, string_split(host, '.') AS labels,
          len(string_split(host, '.')) AS n
        FROM h),
        rules(key, kind, ps_len) AS (VALUES ${
          graft.operators.TextAnalysis.suffixRulesValuesSql(
            graft.operators.TextAnalysis.publishedSuffixRules)}),
        cand AS (SELECT doc_id, n,
          array_to_string(list_slice(labels, n - j + 1, n), '.') AS tail
        FROM d, LATERAL (SELECT unnest(range(1, least(n, ${
          graft.operators.TextAnalysis.suffixMaxTail(
            graft.operators.TextAnalysis.publishedSuffixRules)}) + 1)) AS j) t(j)),
        m AS (SELECT doc_id,
          max(CASE WHEN kind = 'e' THEN ps_len END) AS e_len,
          max(CASE WHEN kind <> 'e' AND (kind <> 'w' OR n >= ps_len)
              THEN ps_len END) AS m_len
        FROM cand JOIN rules ON tail = key GROUP BY doc_id),
        p AS (SELECT d.doc_id AS doc_id, url_canon, host, labels, n,
          COALESCE(e_len, m_len, 1) AS ps_len,
          regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS last2,
          regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) AS last3
        FROM d LEFT JOIN m ON d.doc_id = m.doc_id),
        psl(suffix) AS (VALUES ${
          graft.operators.TextAnalysis.publicSuffixesValuesSql}),
        q AS (SELECT doc_id, url_canon,
          CASE WHEN n > ps_len
               THEN array_to_string(list_slice(labels, n - ps_len, n), '.')
               ELSE host END AS domain,
          CASE WHEN suffix IS NOT NULL AND last3 <> '' THEN last3
               ELSE last2 END AS domain_sub
        FROM p LEFT JOIN psl ON last2 = suffix),
        r AS (SELECT doc_id, url_canon, domain, domain_sub,
          CAST(row_number() OVER (PARTITION BY domain
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
            AS domain_rank,
          CAST(row_number() OVER (PARTITION BY domain_sub
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
            AS rank_sub
        FROM q)
        SELECT doc_id, url_canon, domain, domain_rank,
          domain_rank <= 3 AS kept, domain_sub, rank_sub,
          rank_sub <= 3 AS kept_sub
        FROM r ORDER BY doc_id""",
    // the oracle rebuilds the same injected-PII text, then replays the
    // two-stage redaction (emails first) with RE2 'g' replaces — the
    // patterns are restricted to the Java-regex/RE2 common subset
    "t54_pii_scrub" ->
      """WITH pii AS (SELECT doc_id,
          text ||
          CASE WHEN doc_id % 3 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
               ELSE '' END ||
          CASE WHEN doc_id % 4 = 0
               THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7'
               ELSE '' END AS text
          FROM documents),
        r AS (SELECT doc_id, text,
          regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS red
          FROM pii)
        SELECT doc_id,
          len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
          len(regexp_extract_all(text,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
          length(red) AS n_chars_redacted,
          md5(red) AS redacted_hash
        FROM r ORDER BY doc_id""",
    // budget B = min_s floor(100*n_s/w_s), quota_s = floor(w_s*B/100) —
    // integer // end to end; rank order = (md5('42:'||id), id)
    // three unrolled count→argmax→rewrite rounds; merge application is
    // the same space-padded leftmost replace on both engines
    "t64_bpe_merges" ->
      """WITH t0 AS (SELECT text FROM documents),
        p1 AS (SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n
          FROM (SELECT string_split(text, ' ') AS tk FROM t0),
            LATERAL (SELECT unnest(range(1, len(tk))) AS i) u(i)
          GROUP BY 1, 2),
        m1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
        t1 AS (SELECT trim(replace(' ' || text || ' ',
            (SELECT ' ' || a || ' ' || b || ' ' FROM m1),
            (SELECT ' ' || a || '_' || b || ' ' FROM m1))) AS text FROM t0),
        p2 AS (SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n
          FROM (SELECT string_split(text, ' ') AS tk FROM t1),
            LATERAL (SELECT unnest(range(1, len(tk))) AS i) u(i)
          GROUP BY 1, 2),
        m2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
        t2 AS (SELECT trim(replace(' ' || text || ' ',
            (SELECT ' ' || a || ' ' || b || ' ' FROM m2),
            (SELECT ' ' || a || '_' || b || ' ' FROM m2))) AS text FROM t1),
        p3 AS (SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n
          FROM (SELECT string_split(text, ' ') AS tk FROM t2),
            LATERAL (SELECT unnest(range(1, len(tk))) AS i) u(i)
          GROUP BY 1, 2),
        m3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1)
        SELECT * FROM (
          SELECT 1 AS iter, a AS tok_a, b AS tok_b, n AS pair_count FROM m1
          UNION ALL SELECT 2, a, b, n FROM m2
          UNION ALL SELECT 3, a, b, n FROM m3)
        ORDER BY iter""",
    // t64's induction unrolled with doc_id carried through the
    // rewrites, then the final (3rd) merge applied too — the encoded
    // corpus, gated per-doc by token count, merged-token count, and an
    // md5 of the full encoded text
    "t65_bpe_encode" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        p1 AS (SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n
          FROM (SELECT string_split(text, ' ') AS tk FROM d0),
            LATERAL (SELECT unnest(range(1, len(tk))) AS i) u(i)
          GROUP BY 1, 2),
        m1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
        d1 AS (SELECT doc_id, trim(replace(' ' || text || ' ',
            (SELECT ' ' || a || ' ' || b || ' ' FROM m1),
            (SELECT ' ' || a || '_' || b || ' ' FROM m1))) AS text FROM d0),
        p2 AS (SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n
          FROM (SELECT string_split(text, ' ') AS tk FROM d1),
            LATERAL (SELECT unnest(range(1, len(tk))) AS i) u(i)
          GROUP BY 1, 2),
        m2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
        d2 AS (SELECT doc_id, trim(replace(' ' || text || ' ',
            (SELECT ' ' || a || ' ' || b || ' ' FROM m2),
            (SELECT ' ' || a || '_' || b || ' ' FROM m2))) AS text FROM d1),
        p3 AS (SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n
          FROM (SELECT string_split(text, ' ') AS tk FROM d2),
            LATERAL (SELECT unnest(range(1, len(tk))) AS i) u(i)
          GROUP BY 1, 2),
        m3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1),
        d3 AS (SELECT doc_id, trim(replace(' ' || text || ' ',
            (SELECT ' ' || a || ' ' || b || ' ' FROM m3),
            (SELECT ' ' || a || '_' || b || ' ' FROM m3))) AS text FROM d2)
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(string_split(text, ' '),
            x -> contains(x, '_'))) AS BIGINT) AS n_merged,
          md5(text) AS enc_hash
        FROM d3 ORDER BY doc_id""",
    // t38's replay restricted to corpus x probe (doc_id < 50) bands —
    // same shingle/signature/band derivation, cross candidates, exact
    // cross-Jaccard verify
    "t66_cross_neardup" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_transform(range(1, greatest(len(w)-2,0)+1),
          i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS shingles FROM words),
        sigs AS (SELECT doc_id, list_transform(range(0,16),
          i -> list_aggregate(list_transform(shingles,
            s -> md5(CAST(i AS VARCHAR)||':'||s)), 'min')) AS sig FROM sh),
        bands AS (SELECT doc_id, b, md5(sig[b*2+1]||'|'||sig[b*2+2]) AS band_key
          FROM sigs, range(0,8) t(b)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, p.doc_id AS doc_b
          FROM bands a JOIN bands p ON a.b = p.b AND a.band_key = p.band_key
          WHERE p.doc_id < 50 AND a.doc_id <> p.doc_id),
        d AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM d a JOIN d b ON a.shingle = b.shingle
          WHERE b.doc_id < 50 AND a.doc_id <> b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        jac AS (SELECT common.doc_a, common.doc_b,
            CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
          FROM common
          JOIN cand ON common.doc_a = cand.doc_a AND common.doc_b = cand.doc_b
          JOIN sizes sa ON common.doc_a = sa.doc_id
          JOIN sizes sb ON common.doc_b = sb.doc_id)
        SELECT doc_a AS doc_id, doc_b AS probe_id, jaccard FROM jac
        WHERE jaccard >= 0.5 ORDER BY doc_id, probe_id""",
    // per-char counts -> -p*ln(p) terms folded in ascending char order
    // (binary collation == the kernel's TreeMap walk on ASCII), round 6
    "t67_char_entropy" ->
      """WITH chars AS (SELECT doc_id,
            unnest(list_transform(range(1, length(text)+1),
              i -> text[CAST(i AS INTEGER)])) AS c
          FROM documents),
        counts AS (SELECT doc_id, c, count(*) AS n FROM chars GROUP BY doc_id, c),
        tot AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS tot,
            count(*) AS nd FROM counts GROUP BY doc_id),
        terms AS (SELECT counts.doc_id, c,
            (CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot) AS term
          FROM counts JOIN tot ON tot.doc_id = counts.doc_id),
        ent AS (SELECT doc_id,
            round(-list_sum(list(term ORDER BY c)), 6) AS char_entropy
          FROM terms GROUP BY doc_id)
        SELECT e.doc_id, char_entropy,
          CAST(nd AS INTEGER) AS n_distinct_chars,
          round(CAST(nd AS DOUBLE) / tot, 6) AS distinct_char_ratio
        FROM ent e JOIN tot ON tot.doc_id = e.doc_id ORDER BY e.doc_id""",
    // same deletion-neighborhood generation + levenshtein verify (an
    // integer DP, engine-independent); DISTINCT because equal or
    // near-equal keys share several variants
    "t63_fuzzy_keys" ->
      """WITH keyed AS (SELECT doc_id,
            CASE WHEN doc_id % 5 = 0 THEN
              substr(md5(CAST(doc_id - 1 AS VARCHAR)), 1, 2) ||
              substr(md5(CAST(doc_id - 1 AS VARCHAR)), 4, 5)
            ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) END AS key
          FROM documents),
        v AS (SELECT doc_id, key,
            UNNEST(list_transform(range(0, length(key) + 1), i ->
              CASE WHEN i = 0 THEN key
                   ELSE substr(key, 1, CAST(i - 1 AS INTEGER)) ||
                        substr(key, CAST(i + 1 AS INTEGER), length(key))
              END)) AS var
          FROM keyed),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
            x.key AS key_a, y.key AS key_b
          FROM v x JOIN v y ON x.var = y.var AND x.doc_id < y.doc_id)
        SELECT id_a, id_b, key_a, key_b,
          CAST(levenshtein(key_a, key_b) AS INTEGER) AS dist
        FROM cand WHERE levenshtein(key_a, key_b) <= 1
        ORDER BY id_a, id_b""",
    // sqrt weights, source-name-ordered weight fold, floor quotas —
    // every float op pinned (sqrt and the one multiply/divide chain)
    "t62_temperature_mix" ->
      """WITH counts AS (SELECT source, count(*) AS n_src FROM documents
          GROUP BY source),
        w AS (SELECT source, sqrt(CAST(n_src AS DOUBLE)) AS w FROM counts),
        sw AS (SELECT list_sum(list(w ORDER BY source)) AS sumw FROM w),
        quotas AS (SELECT source, CAST(floor(300.0 * w / sumw) AS BIGINT) AS quota
          FROM w, sw),
        ranked AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source
              ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
          FROM documents)
        SELECT r.doc_id, r.source, CAST(r.sample_rank AS INTEGER) AS sample_rank
        FROM ranked r JOIN quotas q ON r.source = q.source
        WHERE r.sample_rank <= q.quota
        ORDER BY r.source, r.sample_rank""",
    "t55_source_mix" ->
      """WITH w(src, wt) AS (VALUES ('src0', 10), ('src1', 8), ('src2', 6)),
        counts AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        caps AS (SELECT c.source, COALESCE(w.wt, 4) AS wt,
            (100 * n_src) // COALESCE(w.wt, 4) AS cap
          FROM counts c LEFT JOIN w ON c.source = w.src),
        b AS (SELECT min(cap) AS budget FROM caps),
        quotas AS (SELECT source, (wt * budget) // 100 AS quota FROM caps, b),
        ranked AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source
              ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
          FROM documents)
        SELECT r.doc_id, r.source, CAST(r.sample_rank AS INTEGER) AS sample_rank
        FROM ranked r JOIN quotas q ON r.source = q.source
        WHERE r.sample_rank <= q.quota
        ORDER BY r.source, r.sample_rank""",
    "t53_curate_pipeline" ->
      """WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        d AS (SELECT doc_id, text FROM documents
          WHERE doc_id IN (SELECT doc_id FROM keep)),
        w AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM d),
        sh AS (SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM w)),
        probe AS (SELECT DISTINCT g FROM (
          SELECT unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
          FROM (SELECT string_split(text, ' ') AS tk FROM documents WHERE doc_id < 5))),
        per AS (SELECT s.doc_id, count(*) AS n_sh, count(p.g) AS n_hit
          FROM sh s LEFT JOIN probe p ON s.g = p.g GROUP BY s.doc_id),
        clean AS (SELECT doc_id FROM per WHERE CAST(n_hit AS DOUBLE)/n_sh <= 0.5),
        q AS (SELECT doc_id FROM (SELECT doc_id,
            len(tk) BETWEEN 10 AND 100000 AS ok1,
            CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)/len(tk)
              BETWEEN 2.0 AND 6.0 AS ok2,
            len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) >= 1 AS ok3,
            CAST(length(regexp_replace(text, '[^#…|<>{}]', '', 'g')) AS DOUBLE)
              / length(text) <= 0.1 AS ok4
          FROM w) WHERE ok1 AND ok2 AND ok3 AND ok4),
        surv AS (SELECT w.doc_id, w.tk FROM w
          JOIN clean ON w.doc_id = clean.doc_id
          JOIN q ON w.doc_id = q.doc_id)
        SELECT doc_id,
          CASE WHEN bucket < 80 THEN 'train'
               WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
          len(tk) AS n_tokens
        FROM (SELECT doc_id, tk,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
            AS bucket FROM surv)
        ORDER BY doc_id""",
    // replays the corpus index (t37/t38 signature + band machinery)
    // and the probe batch, then the estimator rule: a probe is a dup
    // of the LOWEST corpus doc sharing a band bucket with >= 8/16
    // non-null signature components agreeing
    "t69_index_dedup" ->
      """WITH probes AS (
          SELECT doc_id + 1000000 AS doc_id, text || ' ingestdup tail' AS text
          FROM documents WHERE doc_id < 40
          UNION ALL
          SELECT doc_id + 2000000 AS doc_id, reverse(text) AS text
          FROM documents WHERE doc_id >= 40 AND doc_id < 50),
        all_docs AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM probes),
        words AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
        sh AS (SELECT doc_id, list_transform(range(1, greatest(len(w)-2,0)+1),
          i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS shingles FROM words),
        sigs AS (SELECT doc_id, list_transform(range(0,16),
          i -> list_aggregate(list_transform(shingles,
            s -> md5(CAST(i AS VARCHAR)||':'||s)), 'min')) AS sig FROM sh),
        bands AS (SELECT doc_id, b, md5(sig[b*2+1]||'|'||sig[b*2+2]) AS band_key
          FROM sigs, range(0,8) t(b)),
        dup AS (SELECT l.doc_id, MIN(e.doc_id) AS dup_src
          FROM bands l
          JOIN bands e ON l.b = e.b AND l.band_key = e.band_key
            AND e.doc_id < 1000000 AND l.doc_id >= 1000000
          JOIN sigs sl ON sl.doc_id = l.doc_id
          JOIN sigs se ON se.doc_id = e.doc_id
          WHERE len(list_filter(range(1, 17), i ->
            sl.sig[i] IS NOT NULL AND sl.sig[i] = se.sig[i])) >= 8
          GROUP BY l.doc_id)
        SELECT p.doc_id, d.dup_src IS NULL AS kept, d.dup_src
        FROM probes p LEFT JOIN dup d ON d.doc_id = p.doc_id
        ORDER BY p.doc_id""",
    // spoof construction and normalization replayed with the same
    // translate/replace chain; chr() literals keep the invisibles out
    // of the source text
    "t74_confusable_dedup" ->
      """WITH spoof AS (
          SELECT doc_id + 1000000 AS doc_id,
            replace(translate(text, 'aeocpxy', '\u0430\u0435\u043e\u0441\u0440\u0445\u0443'),
              ' ', chr(8203) || ' ') AS text
          FROM documents WHERE doc_id < 5),
        corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM spoof),
        norm AS (SELECT doc_id,
          regexp_replace(
            translate(text, '\u0430\u0435\u043e\u0441\u0440\u0445\u0443' || chr(160), 'aeocpxy '),
            chr(8203)||'|'||chr(8204)||'|'||chr(8205)||'|'||chr(65279)||'|'||chr(173),
            '', 'g') AS n
          FROM corpus)
        SELECT md5(n) AS text_hash, MIN(doc_id) AS keep_id,
          COUNT(*) AS n_copies
        FROM norm GROUP BY md5(n) ORDER BY text_hash""",
    // the round-trip property IS the oracle: decode(encode(corpus))
    // must hash-match the untouched table
    "t70_bpe_roundtrip" ->
      """SELECT doc_id, text FROM documents ORDER BY doc_id""",
    // both phases replayed from first principles: phase 1 against the
    // post-update doc set (0-4 replaced by their reversed text — the
    // LWW contract), phase 2 against that set plus phase 1's keeps
    "t72_index_append" -> (t72ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id, kept, dup_src FROM v1
          UNION ALL SELECT CAST(2 AS BIGINT), doc_id, kept, dup_src FROM v2)
        ORDER BY doc_id"""),
    // t73 = the t72 phases driven through the parquet SinkTable
    // (append-only files + LWW read + physical compaction), so the
    // replay is t72's verbatim with batch-1 verdicts asserted TWICE:
    // batch 11 is the post-compaction re-screen, which must equal the
    // pre-compaction one row for row
    "t73_index_sink_loop" -> (t72ReplayCtes + """
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS batch, doc_id, kept, dup_src FROM v1
          UNION ALL SELECT CAST(11 AS BIGINT), doc_id, kept, dup_src FROM v1
          UNION ALL SELECT CAST(2 AS BIGINT), doc_id, kept, dup_src FROM v2)
        ORDER BY batch, doc_id"""),
    // the decode must return the arithmetic reconstruction unchanged;
    // n_merged = completed pairs (odd j with (doc_id+j) % 3 == 0) —
    // rule pairs are position-disjoint, so every completed pair merges
    "t71_bpe_vocab4k" ->
      """SELECT doc_id,
        array_to_string(list_transform(range(0, 64), j ->
          't' || CAST(CASE
            WHEN j % 2 = 0 THEN 2 * ((doc_id * 7 + (j // 2) * 53) % 4096)
            WHEN (doc_id + j) % 3 = 0
              THEN 2 * ((doc_id * 7 + (j // 2) * 53) % 4096) + 1
            ELSE (2 * ((doc_id * 7 + (j // 2) * 53) % 4096) + 2) % 8192
          END AS VARCHAR)), ' ') AS text,
        CAST(len(list_filter(range(0, 64),
          j -> j % 2 = 1 AND (doc_id + j) % 3 = 0)) AS BIGINT) AS n_merged
        FROM documents ORDER BY doc_id"""
  )
}
