package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, batch-shaped decode/feature/frame operators via typed
  * `mapPartitions` (the Scala analog of arrow-batched Python UDFs — one
  * iterator pass per partition, no per-row task overhead).
  *
  * The actual media DECODE is a clearly-marked deterministic stub (no
  * codec libraries in this environment); everything around it — schema,
  * partitioning, batch iteration, output shape — is real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double,
      byte_entropy: Double, distinct_bytes: Int)
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Attach a binary payload + typed metadata to a text/media column —
    * the ingest shape for media tables (payload column stays opaque). */
  def asMedia(docs: DataFrame, idCol: String, contentCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(contentCol).cast("binary").as("payload"),
      struct(
        length(col(contentCol).cast("binary")).as("n_bytes"),
        lit("text/plain").as("mime"),
        md5(col(contentCol).cast("binary")).as("content_hash")).as("media_meta"))

  /** STUB DECODE: a real implementation would decode image/audio bytes
    * here (pixel tensor / PCM). This deterministic fake derives features
    * from the raw bytes so the distributed plumbing is fully exercised. */
  private def stubDecodeFeatures(r: MediaRow): MediaFeatures = {
    val counts = new Array[Long](256)
    r.payload.foreach(b => counts(b & 0xff) += 1)
    val n = r.payload.length
    val mean = if (n == 0) 0.0 else r.payload.map(b => (b & 0xff).toLong).sum.toDouble / n
    var entropy = 0.0
    var distinct = 0
    counts.foreach { c =>
      if (c > 0) {
        distinct += 1
        val p = c.toDouble / n
        entropy -= p * math.log(p) / math.log(2)
      }
    }
    MediaFeatures(r.doc_id, n, mean, entropy, distinct)
  }

  /** Feature extraction: one partition = one batch, client state (here
    * the histogram buffer) amortized across the partition. */
  def extractFeatures(media: DataFrame)(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(rows => rows.map(stubDecodeFeatures))
  }

  case class Resized(doc_id: Long, payload: Array[Byte], n_bytes: Int,
      orig_bytes: Int, factor: Int)

  /** STUB RESIZE: a real implementation would decode, downscale
    * (bilinear/area), and re-encode. This deterministic fake keeps every
    * `factor`-th byte — same contract shape: payload shrinks ~1/factor,
    * output is a pure function of the input, metadata carries both
    * sizes. The batch iteration, schema, and partition alignment are the
    * real thing a codec-backed version would inherit unchanged. */
  def resize(media: DataFrame, factor: Int = 4)
      (implicit s: SparkSession): Dataset[Resized] = {
    import s.implicits._
    require(factor >= 1, "resize factor must be >= 1")
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(rows => rows.map { r =>
        val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        Resized(r.doc_id, out, out.length, r.payload.length, factor)
      })
  }

  /** Frame sampling: treat the payload as fixed-size frames, emit every
    * `stride`-th one — the video keyframe-sampling shape (explodes rows,
    * so output partitioning stays aligned with input). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 4)
      (implicit s: SparkSession): Dataset[Frame] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(rows => rows.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          Frame(r.doc_id, i,
            java.util.Arrays.copyOfRange(r.payload, i * frameBytes, (i + 1) * frameBytes))
        }
      })
  }
}
