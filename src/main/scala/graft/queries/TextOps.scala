package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextDedup}
import Util._

/** LLM-training-data text operators over the `documents` table: exact
  * and near dedup (n-gram Jaccard, MinHash+LSH, SimHash), token stats,
  * quality scoring, language ID, fingerprints. Oracle SQL is provided
  * wherever DuckDB can express the same deterministic computation;
  * md5-based hashing keeps signatures engine-portable.
  */
object TextOps extends QueryPack {

  /** t36/t41/t42 share the exact near-dup pair set — materialize it once
    * per data dir (a cached common subexpression; recomputing a 12M-row
    * pair join three times, concurrently, is pure waste). */
  private val pairsCache =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]

  private def jaccardPairs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    pairsCache.synchronized {
      pairsCache.getOrElseUpdate(dir, {
        val df = TextDedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize under the lock so peers reuse, not recompute
        df
      })
    }

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

    // LSH recall < 1 by construction — rows-only check (cross-validated
    // against t36 in the ScalaTest suite).
    "t38_minhash_lsh_pairs" -> ((s, dir) => {
      import s.implicits._
      TextDedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text", 0.5)
        .orderBy($"doc_a", $"doc_b")
    }),

    // UDF-based fingerprint — rows-only check.
    "t39_simhash_pairs" -> ((s, dir) => {
      import s.implicits._
      TextDedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text", 6)
        .orderBy($"doc_a", $"doc_b")
    }),

    // Fold-based hash (no DuckDB fold primitive) — rows-only check.
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
    })
  )

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
        FROM sh ORDER BY doc_id"""
  )
}
