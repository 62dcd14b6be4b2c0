package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import Util._

/** Vector-similarity operators over the `embeddings` table (64-dim
  * float vectors): brute-force cosine top-k (baseline), embedding
  * near-dup pairs, and SRP-LSH bucketed ANN (the scale path).
  *
  * Oracle note: DuckDB's list_cosine_similarity accumulates in float32
  * (~1e-7 off a double fold), so oracles spell out the same
  * left-to-right double fold our operators use; emitted cosines round
  * to 6 decimals on both sides.
  */
object SimilarityOps extends QueryPack {

  private val dim = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s41_knn_brute" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.knnBrute(emb, emb.filter($"vec_id" < 10), k = 5)
        .orderBy($"qid", $"rank")
    }),

    "s42_cosine_dup_pairs" -> ((s, dir) => {
      import s.implicits._
      Similarity.cosineDupPairs(t(s, dir, "embeddings"), 0.4)
        .orderBy($"id_a", $"id_b")
    }),

    // LSH with md5-derived hyperplanes: fully deterministic, so the
    // oracle replays the plane derivation + bucket join in SQL (recall
    // vs s41 is additionally measured in the ScalaTest suite).
    "s43_knn_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.knnLsh(emb, emb.filter($"vec_id" < 10), k = 5, dim = dim)
        .orderBy($"qid", $"rank")
    }),

    // corpus-x-corpus near-dup via SRP buckets — the scale companion of
    // s42; deterministic md5 planes, so the oracle replays it exactly.
    "s46_cosine_dup_lsh" -> ((s, dir) => {
      import s.implicits._
      // single-partition sort: the pair set is tiny, and a global
      // orderBy's range sampling would re-execute the whole candidate
      // pipeline just to pick boundaries for a handful of rows
      Similarity.cosineDupPairsLsh(t(s, dir, "embeddings"), 0.4, dim)
        .repartition(1).sortWithinPartitions($"id_a", $"id_b")
    }),

    // IVF coarse quantization: every vector → nearest of 8 centroids.
    "s44_ivf_assign" -> ((s, dir) => {
      import s.implicits._
      Similarity.ivfAssign(t(s, dir, "embeddings"), k = 8)
        .orderBy($"vec_id")
    }),

    // IVF probe search (sub-linear ANN; fully deterministic, so the
    // oracle replays the probe ladder in SQL).
    "s45_ivf_search" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfSearch(emb, emb.filter($"vec_id" < 10), k = 5)
        .orderBy($"qid", $"rank")
    }),

    // SemDeDup: IVF-cluster then within-cluster cosine pairs (published
    // semantic-dedup recipe; per-cluster quadratic, corpus-linear).
    "s48_semantic_dedup" -> ((s, dir) => {
      import s.implicits._
      Similarity.semanticDupPairs(t(s, dir, "embeddings"), 0.3)
        .orderBy($"id_a", $"id_b")
    }),

    // diversity-aware subset selection (the D4 prototypicality-pruning
    // recipe): per semantic cluster, keep the farthest-from-centroid
    // half, drop the redundant core. Assignment replays s48's seed
    // centroids; ranks and quota are integer-exact.
    "s54_diversity_select" -> ((s, dir) => {
      import s.implicits._
      Similarity.diversitySelect(t(s, dir, "embeddings"), keepFrac = 0.5)
        .orderBy($"vec_id")
    }),

    // int8 scalar quantization (4 bytes → 1 byte per dim): codegen'd
    // column expressions, deterministic round-half-up, replayed exactly
    // by the oracle. qvec serialized to a scalar for the comparator.
    "s47_quantize_int8" -> ((s, dir) => {
      import s.implicits._
      Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .select($"vec_id", $"scale",
          array_join(transform($"qvec", x => x.cast("string")), ",").as("q_str"),
          $"max_abs_err")
        .orderBy($"vec_id")
    }),

    // top-k over int8-QUANTIZED vectors — the search side of the s47
    // storage path. Per-vector scales cancel in the cosine, so scoring
    // is integer dot products (exact) through one sqrt/divide; the
    // oracle replays quantization + integer scoring bit-for-bit.
    "s50_quantized_knn" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.knnQuantized(emb, emb.filter($"vec_id" < 10), k = 5)
        .orderBy($"qid", $"rank")
    }),

    // IVF probe search over int8 codes (FAISS IVF+SQ8 shape): the s45
    // probe ladder scoring s47's integer codes — probed lists scan
    // 1 byte/dim. Fully deterministic; the oracle replays assignment,
    // probes, quantization, and integer scoring.
    "s51_ivf_quantized" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfSearchQuantized(emb, emb.filter($"vec_id" < 10), k = 5)
        .orderBy($"qid", $"rank")
    }),

    // Product quantization + asymmetric-distance search (FAISS PQ/ADC):
    // 8 subspaces x 16-entry codebooks, codes are 8 bytes per vector;
    // scoring reconstructs dot products from codebook lookups with
    // ordered folds the oracle replays bit-for-bit.
    "s52_pq_adc" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.knnPq(emb, emb.filter($"vec_id" < 10), k = 5)
        .orderBy($"qid", $"rank")
    }),

    // IVF + PQ (FAISS IVFPQ): coarse probe routing over 8-byte ADC
    // codes — the full billion-vector index shape, end of the ANN
    // storage ladder (brute → SRP → IVF → SQ8 → IVF+SQ8 → PQ → IVFPQ).
    "s53_ivf_pq" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfSearchPq(emb, emb.filter($"vec_id" < 10), k = 5)
        .orderBy($"qid", $"rank")
    }),

    // IVFPQ + exact refine (FAISS IndexRefineFlat): s53's ADC ordering
    // picks a 20-candidate pool, the float vectors exact-rescore just
    // that pool, top-5 by true cosine survive — the recall-recovery
    // stage that completes the recipe.
    "s55_ivf_pq_rerank" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfSearchPqRerank(emb, emb.filter($"vec_id" < 10),
          k = 5, candK = 20)
        .orderBy($"qid", $"rank")
    }),

    // The embedding-side curation composition (the s-series analog of
    // t53): exact dedup on identical vectors → near-dup removal via
    // the SCALE path (SRP-LSH with bits derived from the DEDUPED
    // count — the oracle replays the derivation from the same set) →
    // int8 quantization of the survivors. Drop policy: the higher id
    // of every near-dup pair, the standard keep-first resolve.
    "s49_embed_curate" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val keep = emb.groupBy($"embedding").agg(min($"vec_id").as("vec_id"))
        .select($"vec_id")
      val deduped = emb.join(keep, Seq("vec_id"), "left_semi")
      val drops = Similarity.cosineDupPairsLsh(deduped, 0.4, dim)
        .select($"id_b".as("vec_id")).distinct()
      val survivors = deduped.join(drops, Seq("vec_id"), "left_anti")
      Similarity.quantizeInt8(survivors)
        .select($"vec_id", $"scale",
          array_join(transform($"qvec", x => x.cast("string")), ",").as("q_str"))
        .orderBy($"vec_id")
    }),

    // Incremental embedding dedup vs a PERSISTED SRP index (the t69
    // contract, embedding-side): index the corpus once, screen an
    // ingest batch of 30 re-scaled re-uploads (x1.25 — same direction,
    // same buckets, cosine 1) against it. Exact-in-IEEE754 scaling
    // (float -> double, x1.25 adds 2 mantissa bits, cast back), so the
    // oracle regenerates probes bit-identically.
    "s56_index_dedup" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val bits = Similarity.deriveSrpBits(emb.count())
      val index = Similarity.srpBucketIndex(emb, dim, bits)
      val probes = emb.filter($"vec_id" < 30)
        .select(($"vec_id" + 1000000).as("vec_id"),
          transform($"embedding",
            x => (x.cast("double") * 1.25).cast("float")).as("embedding"))
      Similarity.dedupAgainstSrpIndex(probes, index, 0.4, dim, bits)
        .orderBy($"vec_id")
    })
  )

  private val dot =
    """list_sum(list_transform(range(1, 65), i ->
      CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"""

  private def cosSql(a: String, b: String): String =
    s"round(${dot.format(a, b)} / (sqrt(${dot.format(a, a)}) * sqrt(${dot.format(b, b)})), 6)"

  def oracleSql: Map[String, String] = Map(
    "s43_knn_lsh" ->
      s"""WITH planes AS (
          SELECT j, list_transform(range(0, 64), i ->
            2.0 * ((CAST('0x' || substr(md5('srp:42:' || j || ':' || i), 1, 16) AS UBIGINT) >> 11)
                   / 9007199254740992.0) - 1.0) AS p
          FROM range(0, 8) t(j)),
        sgn AS (SELECT e.vec_id, pl.j,
            CASE WHEN list_sum(list_transform(range(1, 65), i ->
                CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN (CAST(1 AS BIGINT) << pl.j) ELSE 0 END AS bit
          FROM embeddings e, planes pl),
        buckets AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bucket
          FROM sgn GROUP BY vec_id),
        q AS (SELECT b.vec_id AS qid, e.embedding AS qv, b.bucket
          FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
          WHERE b.vec_id < 10),
        scored AS (SELECT q.qid, cb.vec_id, ${cosSql("q.qv", "c.embedding")} AS cos_sim
          FROM q JOIN buckets cb ON cb.bucket = q.bucket AND cb.vec_id <> q.qid
          JOIN embeddings c ON c.vec_id = cb.vec_id),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    // nb replays Similarity.deriveSrpBits exactly: m = ceil(n/8) in
    // integer arithmetic, bits = position of m-1's highest set bit
    // (length of its binary form), clamped to [6, 48]
    "s46_cosine_dup_lsh" ->
      s"""WITH nb AS (
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
        scored AS (SELECT cand.id_a, cand.id_b,
            ${cosSql("x.embedding", "y.embedding")} AS cos_sim
          FROM cand
          JOIN embeddings x ON x.vec_id = cand.id_a
          JOIN embeddings y ON y.vec_id = cand.id_b)
        SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.4
        ORDER BY id_a, id_b""",
    "s41_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        scored AS (SELECT qid, vec_id, ${cosSql("qv", "embedding")} AS cos_sim
          FROM q, embeddings WHERE vec_id <> qid),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    "s42_cosine_dup_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ${cosSql("a.embedding", "b.embedding")} AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4
        ORDER BY id_a, id_b""",
    "s44_ivf_assign" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        dists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, cents c),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM dists)
        SELECT vec_id, cid AS centroid_id, d AS dist_sq
        FROM ranked WHERE rn = 1 ORDER BY vec_id""",
    "s45_ivf_search" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        dists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, cents c),
        assigned AS (SELECT vec_id, cid AS centroid_id FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM dists) WHERE rn = 1),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        qd AS (SELECT q.qid, q.qv, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS cd
          FROM q, cents c),
        probes AS (SELECT qid, qv, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cd, cid) AS pr
           FROM qd) WHERE pr <= 2),
        scored AS (SELECT p.qid, a.vec_id,
            ${cosSql("p.qv", "e.embedding")} AS cos_sim
          FROM probes p
          JOIN assigned a ON a.centroid_id = p.cid
          JOIN embeddings e ON e.vec_id = a.vec_id
          WHERE a.vec_id <> p.qid),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    "s48_semantic_dedup" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        dists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, cents c),
        assigned AS (SELECT vec_id, cid AS centroid_id FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM dists) WHERE rn = 1),
        sides AS (SELECT a.vec_id, a.centroid_id, e.embedding
          FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id),
        pairs AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
            x.centroid_id,
            ${cosSql("x.embedding", "y.embedding")} AS cos_sim
          FROM sides x JOIN sides y
            ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id)
        SELECT id_a, id_b, centroid_id, cos_sim FROM pairs
        WHERE cos_sim >= 0.3 ORDER BY id_a, id_b""",
    // the s48 assignment fragment + per-cluster descending-distance
    // window; quota = ceil(0.5 * cluster size), same IEEE fold
    "s54_diversity_select" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        dists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, cents c),
        assigned AS (SELECT vec_id, cid AS centroid_id, d AS dist_sq FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM dists) WHERE rn = 1),
        rk AS (SELECT vec_id, centroid_id, dist_sq,
            row_number() OVER (PARTITION BY centroid_id
              ORDER BY dist_sq DESC, vec_id) AS rank,
            COUNT(*) OVER (PARTITION BY centroid_id) AS n
          FROM assigned)
        SELECT vec_id, centroid_id, dist_sq,
          CAST(rank AS BIGINT) AS rank,
          rank <= CAST(ceil(0.5 * n) AS BIGINT) AS kept
        FROM rk ORDER BY vec_id""",
    // scale = max|x|/127; q_i = floor(x/scale + 0.5) — every op a single
    // exact double step, so values are bit-identical across engines
    "s47_quantize_int8" ->
      """WITH q AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings)
        SELECT vec_id, scale,
          array_to_string(list_transform(embedding, x ->
            CAST(CASE WHEN scale = 0 THEN 0
                 ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS INTEGER)), ',') AS q_str,
          list_max(list_transform(embedding, x ->
            abs(CAST(x AS DOUBLE) -
              CAST(CASE WHEN scale = 0 THEN 0
                   ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS INTEGER) * scale)))
            AS max_abs_err
        FROM q ORDER BY vec_id""",
    // quantize (the s47 fragment, q as BIGINT list), then score with
    // integer dots; denominator multiplied corpus-norm-first to mirror
    // the Spark operand order (IEEE multiply is commutative, so the
    // order is cosmetic — kept identical anyway)
    "s50_quantized_knn" ->
      """WITH q0 AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings),
        qz AS (SELECT vec_id, list_transform(embedding, x ->
            CAST(CASE WHEN scale = 0 THEN 0
                 ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS BIGINT)) AS q
          FROM q0),
        n AS (SELECT vec_id, q,
            sqrt(CAST(list_sum(list_transform(range(1, 65), i -> q[i] * q[i]))
              AS DOUBLE)) AS nrm
          FROM qz),
        scored AS (SELECT a.vec_id AS qid, b.vec_id,
            CASE WHEN b.nrm * a.nrm = 0 THEN 0.0
              ELSE round(CAST(list_sum(list_transform(range(1, 65),
                  i -> a.q[i] * b.q[i])) AS DOUBLE) / (b.nrm * a.nrm), 6)
              END AS qcos_sim
          FROM n a JOIN n b ON b.vec_id <> a.vec_id
          WHERE a.vec_id < 10),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY qcos_sim DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, qcos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    // s51 composes the s45 probe fragments (float assignment + probe
    // ladder) with the s47/s50 quantized-integer scoring
    "s51_ivf_quantized" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        dists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, cents c),
        assigned AS (SELECT vec_id, cid AS centroid_id FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM dists) WHERE rn = 1),
        q0 AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings),
        qz AS (SELECT vec_id, list_transform(embedding, x ->
            CAST(CASE WHEN scale = 0 THEN 0
                 ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS BIGINT)) AS q
          FROM q0),
        n AS (SELECT vec_id, q,
            sqrt(CAST(list_sum(list_transform(range(1, 65), i -> q[i] * q[i]))
              AS DOUBLE)) AS nrm
          FROM qz),
        qf AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        qd AS (SELECT qf.qid, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(qf.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(qf.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS cd
          FROM qf, cents c),
        probes AS (SELECT qid, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cd, cid) AS pr
           FROM qd) WHERE pr <= 2),
        scored AS (SELECT p.qid, a.vec_id,
            CASE WHEN cn.nrm * qn.nrm = 0 THEN 0.0
              ELSE round(CAST(list_sum(list_transform(range(1, 65),
                  i -> qn.q[i] * cn.q[i])) AS DOUBLE) / (cn.nrm * qn.nrm), 6)
              END AS qcos_sim
          FROM probes p
          JOIN assigned a ON a.centroid_id = p.cid
          JOIN n cn ON cn.vec_id = a.vec_id
          JOIN n qn ON qn.vec_id = p.qid
          WHERE a.vec_id <> p.qid),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY qcos_sim DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, qcos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    // s52 replays PQ end-to-end: codebooks = sub-vectors of the 16
    // lowest-id embeddings (entry index = id rank), per-subspace
    // nearest-entry encode (rounded L2, tie to lower entry), ADC
    // scoring as ORDERED per-subspace folds (list(x ORDER BY s) →
    // list_sum) so double summation order matches the Scala kernel.
    "s52_pq_adc" ->
      s"""WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ord,
            embedding AS cv
          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        cb AS (SELECT s, ord, list_transform(range(1, 9), j ->
            CAST(cv[s*8+j] AS DOUBLE)) AS sub
          FROM cents, range(0, 8) t(s)),
        dists AS (SELECT e.vec_id, cb.s, cb.ord,
            round(list_sum(list_transform(range(1, 9), j ->
              (CAST(e.embedding[cb.s*8+j] AS DOUBLE) - cb.sub[j]) *
              (CAST(e.embedding[cb.s*8+j] AS DOUBLE) - cb.sub[j]))), 6) AS d
          FROM embeddings e, cb),
        codes AS (SELECT vec_id, s, ord FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, ord) AS rn
           FROM dists) WHERE rn = 1),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        contribs AS (SELECT q.qid, c.vec_id, c.s,
            list_sum(list_transform(range(1, 9), j ->
              CAST(q.qv[c.s*8+j] AS DOUBLE) * cb.sub[j])) AS dotc,
            list_sum(list_transform(range(1, 9), j -> cb.sub[j] * cb.sub[j])) AS csq
          FROM q, codes c JOIN cb ON cb.s = c.s AND cb.ord = c.ord
          WHERE c.vec_id <> q.qid),
        agg AS (SELECT qid, vec_id,
            list_sum(list(dotc ORDER BY s)) AS adc,
            list_sum(list(csq ORDER BY s)) AS nsq
          FROM contribs GROUP BY qid, vec_id),
        qn AS (SELECT qid, sqrt(list_sum(list_transform(range(1, 65), i ->
            CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS qnrm FROM q),
        scored AS (SELECT agg.qid, agg.vec_id,
            CASE WHEN qn.qnrm * sqrt(agg.nsq) = 0 THEN 0.0
              ELSE round(agg.adc / (qn.qnrm * sqrt(agg.nsq)), 6) END AS adc_cos
          FROM agg JOIN qn ON qn.qid = agg.qid),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY adc_cos DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, adc_cos, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    // s53 composes s45's probe fragments with s52's ADC scoring,
    // restricted to the probed lists
    "s53_ivf_pq" ->
      s"""WITH icents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        idists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, icents c),
        assigned AS (SELECT vec_id, cid AS centroid_id FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM idists) WHERE rn = 1),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        qd AS (SELECT q.qid, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS cd
          FROM q, icents c),
        probes AS (SELECT qid, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cd, cid) AS pr
           FROM qd) WHERE pr <= 2),
        pcents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ord,
            embedding AS cv
          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        cb AS (SELECT s, ord, list_transform(range(1, 9), j ->
            CAST(cv[s*8+j] AS DOUBLE)) AS sub
          FROM pcents, range(0, 8) t(s)),
        pdists AS (SELECT e.vec_id, cb.s, cb.ord,
            round(list_sum(list_transform(range(1, 9), j ->
              (CAST(e.embedding[cb.s*8+j] AS DOUBLE) - cb.sub[j]) *
              (CAST(e.embedding[cb.s*8+j] AS DOUBLE) - cb.sub[j]))), 6) AS d
          FROM embeddings e, cb),
        codes AS (SELECT vec_id, s, ord FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, ord) AS rn
           FROM pdists) WHERE rn = 1),
        contribs AS (SELECT p.qid, a.vec_id, c.s,
            list_sum(list_transform(range(1, 9), j ->
              CAST(q.qv[c.s*8+j] AS DOUBLE) * cb.sub[j])) AS dotc,
            list_sum(list_transform(range(1, 9), j -> cb.sub[j] * cb.sub[j])) AS csq
          FROM probes p
          JOIN q ON q.qid = p.qid
          JOIN assigned a ON a.centroid_id = p.cid
          JOIN codes c ON c.vec_id = a.vec_id
          JOIN cb ON cb.s = c.s AND cb.ord = c.ord
          WHERE a.vec_id <> p.qid),
        agg AS (SELECT qid, vec_id,
            list_sum(list(dotc ORDER BY s)) AS adc,
            list_sum(list(csq ORDER BY s)) AS nsq
          FROM contribs GROUP BY qid, vec_id),
        qn AS (SELECT qid, sqrt(list_sum(list_transform(range(1, 65), i ->
            CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS qnrm FROM q),
        scored AS (SELECT agg.qid, agg.vec_id,
            CASE WHEN qn.qnrm * sqrt(agg.nsq) = 0 THEN 0.0
              ELSE round(agg.adc / (qn.qnrm * sqrt(agg.nsq)), 6) END AS adc_cos
          FROM agg JOIN qn ON qn.qid = agg.qid),
        ranked AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY adc_cos DESC, vec_id) AS rank FROM scored)
        SELECT qid, vec_id, adc_cos, rank FROM ranked WHERE rank <= 5
        ORDER BY qid, rank""",
    // s55 = the s53 pipeline widened to a 20-candidate ADC pool, then
    // exact-cosine rescored (the cosSql fold, same as s41) and
    // re-ranked — only the pool changes engine-side state, so the
    // replay is s53's CTE chain + a 3-CTE refine tail
    "s55_ivf_pq_rerank" ->
      s"""WITH icents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        idists AS (SELECT e.vec_id, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS d
          FROM embeddings e, icents c),
        assigned AS (SELECT vec_id, cid AS centroid_id FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM idists) WHERE rn = 1),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        qd AS (SELECT q.qid, c.cid,
          round(list_sum(list_transform(range(1, 65), i ->
            (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
            (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 6) AS cd
          FROM q, icents c),
        probes AS (SELECT qid, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cd, cid) AS pr
           FROM qd) WHERE pr <= 2),
        pcents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ord,
            embedding AS cv
          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        cb AS (SELECT s, ord, list_transform(range(1, 9), j ->
            CAST(cv[s*8+j] AS DOUBLE)) AS sub
          FROM pcents, range(0, 8) t(s)),
        pdists AS (SELECT e.vec_id, cb.s, cb.ord,
            round(list_sum(list_transform(range(1, 9), j ->
              (CAST(e.embedding[cb.s*8+j] AS DOUBLE) - cb.sub[j]) *
              (CAST(e.embedding[cb.s*8+j] AS DOUBLE) - cb.sub[j]))), 6) AS d
          FROM embeddings e, cb),
        codes AS (SELECT vec_id, s, ord FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, ord) AS rn
           FROM pdists) WHERE rn = 1),
        contribs AS (SELECT p.qid, a.vec_id, c.s,
            list_sum(list_transform(range(1, 9), j ->
              CAST(q.qv[c.s*8+j] AS DOUBLE) * cb.sub[j])) AS dotc,
            list_sum(list_transform(range(1, 9), j -> cb.sub[j] * cb.sub[j])) AS csq
          FROM probes p
          JOIN q ON q.qid = p.qid
          JOIN assigned a ON a.centroid_id = p.cid
          JOIN codes c ON c.vec_id = a.vec_id
          JOIN cb ON cb.s = c.s AND cb.ord = c.ord
          WHERE a.vec_id <> p.qid),
        agg AS (SELECT qid, vec_id,
            list_sum(list(dotc ORDER BY s)) AS adc,
            list_sum(list(csq ORDER BY s)) AS nsq
          FROM contribs GROUP BY qid, vec_id),
        qn AS (SELECT qid, sqrt(list_sum(list_transform(range(1, 65), i ->
            CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS qnrm FROM q),
        adcscored AS (SELECT agg.qid, agg.vec_id,
            CASE WHEN qn.qnrm * sqrt(agg.nsq) = 0 THEN 0.0
              ELSE round(agg.adc / (qn.qnrm * sqrt(agg.nsq)), 6) END AS adc_cos
          FROM agg JOIN qn ON qn.qid = agg.qid),
        pool AS (SELECT qid, vec_id FROM
          (SELECT *, row_number() OVER
            (PARTITION BY qid ORDER BY adc_cos DESC, vec_id) AS rank
           FROM adcscored) WHERE rank <= 20),
        exact AS (SELECT pool.qid, pool.vec_id,
            ${cosSql("q.qv", "e.embedding")} AS cos_sim
          FROM pool
          JOIN q ON q.qid = pool.qid
          JOIN embeddings e ON e.vec_id = pool.vec_id),
        rr AS (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank FROM exact)
        SELECT qid, vec_id, cos_sim, rank FROM rr WHERE rank <= 5
        ORDER BY qid, rank""",
    // s49 composes the proven fragments: identical-vector dedup, the
    // s46 SRP replay with nb/sgn derived from the DEDUPED set d, the
    // keep-first drop, and the s47 quantization of survivors.
    "s49_embed_curate" ->
      s"""WITH keep AS (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY embedding),
        d AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id IN (SELECT vec_id FROM keep)),
        nb AS (
          SELECT GREATEST(6, LEAST(48,
              CASE WHEN m <= 1 THEN 6 ELSE length(bin(m - 1)) END)) AS bits
          FROM (SELECT (count(*) + 7) // 8 AS m FROM d)),
        planes AS (
          SELECT s, j, list_transform(range(0, 64), i ->
            2.0 * ((CAST('0x' || substr(md5('srp:' || s || ':' || j || ':' || i), 1, 16) AS UBIGINT) >> 11)
                   / 9007199254740992.0) - 1.0) AS p
          FROM range(42, 46) ts(s), range(0, 48) t(j), nb WHERE t.j < nb.bits),
        sgn AS (SELECT e.vec_id, pl.s, pl.j,
            CASE WHEN list_sum(list_transform(range(1, 65), i ->
                CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN (CAST(1 AS BIGINT) << pl.j) ELSE 0 END AS bit
          FROM d e, planes pl),
        buckets AS (SELECT vec_id, s, CAST(SUM(bit) AS BIGINT) AS bucket
          FROM sgn GROUP BY vec_id, s),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM buckets a JOIN buckets b
            ON a.s = b.s AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        drops AS (SELECT DISTINCT cand.id_b AS vec_id FROM cand
          JOIN d x ON x.vec_id = cand.id_a
          JOIN d y ON y.vec_id = cand.id_b
          WHERE ${cosSql("x.embedding", "y.embedding")} >= 0.4),
        surv AS (SELECT vec_id, embedding FROM d
          WHERE vec_id NOT IN (SELECT vec_id FROM drops)),
        q AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM surv)
        SELECT vec_id, scale,
          array_to_string(list_transform(embedding, x ->
            CAST(CASE WHEN scale = 0 THEN 0
                 ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS INTEGER)), ',') AS q_str
        FROM q ORDER BY vec_id""",
    // s46's SRP derivation over corpus + regenerated probes; dup rule:
    // probe is a dup of the lowest corpus vector sharing a bucket in
    // any table with verified cosine >= 0.4
    "s56_index_dedup" ->
      s"""WITH nb AS (
          SELECT GREATEST(6, LEAST(48,
              CASE WHEN m <= 1 THEN 6 ELSE length(bin(m - 1)) END)) AS bits
          FROM (SELECT (count(*) + 7) // 8 AS m FROM embeddings)),
        probes AS (SELECT vec_id + 1000000 AS vec_id,
            list_transform(embedding, x ->
              CAST(CAST(x AS DOUBLE) * 1.25 AS FLOAT)) AS embedding
          FROM embeddings WHERE vec_id < 30),
        alle AS (SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id, embedding FROM probes),
        planes AS (
          SELECT s, j, list_transform(range(0, 64), i ->
            2.0 * ((CAST('0x' || substr(md5('srp:' || s || ':' || j || ':' || i), 1, 16) AS UBIGINT) >> 11)
                   / 9007199254740992.0) - 1.0) AS p
          FROM range(42, 46) ts(s), range(0, 48) t(j), nb WHERE t.j < nb.bits),
        sgn AS (SELECT e.vec_id, pl.s, pl.j,
            CASE WHEN list_sum(list_transform(range(1, 65), i ->
                CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN (CAST(1 AS BIGINT) << pl.j) ELSE 0 END AS bit
          FROM alle e, planes pl),
        buckets AS (SELECT vec_id, s, CAST(SUM(bit) AS BIGINT) AS bucket
          FROM sgn GROUP BY vec_id, s),
        cand AS (SELECT DISTINCT l.vec_id AS pid, e.vec_id AS src
          FROM buckets l JOIN buckets e
            ON l.s = e.s AND l.bucket = e.bucket
            AND l.vec_id >= 1000000 AND e.vec_id < 1000000),
        scored AS (SELECT cand.pid, cand.src,
            ${cosSql("x.embedding", "y.embedding")} AS cs
          FROM cand
          JOIN alle x ON x.vec_id = cand.pid
          JOIN alle y ON y.vec_id = cand.src),
        dup AS (SELECT pid, MIN(src) AS dup_src FROM scored
          WHERE cs >= 0.4 GROUP BY pid)
        SELECT p.vec_id, d.dup_src IS NULL AS kept, d.dup_src
        FROM probes p LEFT JOIN dup d ON d.pid = p.vec_id
        ORDER BY p.vec_id"""
  )
}
