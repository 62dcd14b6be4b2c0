package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token stats,
  * quality scoring, language ID, fingerprinting. All expression-based
  * (whole-stage codegen, no UDFs on the hot path) except where noted.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token statistics: whitespace tokens, distinct tokens, a cheap
    * BPE-ish subtoken estimate (ceil(len/4) pieces per token). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      size(w).as("n_tokens"),
      size(array_distinct(w)).as("n_distinct_tokens"),
      aggregate(transform(w, x => ceil(length(x) / lit(4.0))), lit(0L),
        (acc, x) => acc + x).as("n_subtokens"),
      length(col(textCol)).as("n_chars"))
  }

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality signals: punctuation ratio, stopword ratio, mean token
    * length. All ratios are exact integer counts divided as doubles, so
    * results are bit-stable across engines. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = tokens(col(textCol))
    val nTok = size(w)
    docs.select(col(idCol).as("doc_id"),
      (length(regexp_replace(col(textCol), "[^.!?,;]", "")).cast("double") /
        length(col(textCol))).as("punct_ratio"),
      (size(filter(w, x => x.isin(stopwords: _*))).cast("double") / nTok)
        .as("stopword_ratio"),
      (aggregate(transform(w, x => length(x)), lit(0), (acc, x) => acc + x).cast("double") / nTok)
        .as("mean_token_len"))
  }

  /** Tiny n-gram/stopword language-ID heuristic: score each candidate
    * language by overlap between the document's tokens and a per-language
    * marker list; argmax via lexicographic struct comparison (score, then
    * language code — deterministic tie-break). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val profiles = Map(
      "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
      "es" -> Seq("el", "la", "de", "que", "y", "es", "un"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
      "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))
    val w = array_distinct(tokens(col(textCol)))
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, marks) =>
      struct(size(array_intersect(w, array(marks.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    docs.select(col(idCol).as("doc_id"),
      greatest(scored: _*).getField("lang").as("predicted_lang"),
      greatest(scored: _*).getField("score").as("marker_hits"))
  }

  /** Deterministic train/val/test assignment: bucket = first 4 hex
    * digits of md5(id) mod 100 — a pure function of the id, so the split
    * is stable across runs, engines, cluster sizes, and data order (the
    * property random() sampling lacks). Weights are integer percents. */
  def deterministicSplit(docs: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int") % 100).as("bucket")
    docs.select(col(idCol), bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Content-defined document fingerprint: md5 over the sorted distinct
    * token set — stable under token reordering, engine-portable. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      md5(array_join(array_sort(array_distinct(tokens(col(textCol)))), " "))
        .as("fingerprint"))

  /** Rolling polynomial hash of the token stream (order-sensitive
    * fingerprint; the sliding-window shape used for exact substring
    * dedup). Kept below 2^31 so the fold never overflows a long under
    * Spark's default ANSI arithmetic: acc' = (acc*31 + byteSum) mod 2^31. */
  def rollingFingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      aggregate(tokens(col(textCol)), lit(17L),
        (acc, tk) => pmod(acc * lit(31L) +
          aggregate(transform(split(tk, ""), c => ascii(c)), lit(0), (a, x) => a + x),
          lit(2147483648L)))
        .as("rolling_hash"))
}
