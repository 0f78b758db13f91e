package graft.operators

import graft.functions.Codecs
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata — the
  * multimodal column convention (image/audio/video bytes ride as
  * `binary`, metadata as plain columns so pruning/filtering stays
  * columnar).
  */
case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    width: Int,
    height: Int,
    format: String)

/** Features produced by the per-partition decode stage. */
case class MediaFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    n_bytes: Long,
    first_byte: Int,
    checksum: Long)

/** Multimodal-column plumbing: schema, partition-wise batch decode,
  * feature extraction. The decode itself is a STUB (this container has
  * no image/audio codecs) — deterministic byte-level features stand in
  * for pixel decoding — but the Spark-side shape is real: binary
  * payloads partition-pruned by metadata, decoded inside
  * `mapPartitions` so a real codec would amortize per-partition init
  * (model load, JNI context) exactly here.
  */
object Multimodal {

  /** Derive a deterministic media table from `documents` (payload =
    * text bytes standing in for encoded media). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      ((col("doc_id") * 37) % 480).cast("int").as("height"),
      when(col("source") === "src0", "png").otherwise("jpeg").as("format"))

  /** STUB decoder: in production this is the image/audio codec call.
    * Deterministic byte-level features keep the pipeline testable.
    */
  private def decodeStub(r: MediaRecord): MediaFeatures =
    MediaFeatures(
      doc_id = r.doc_id,
      width = r.width,
      height = r.height,
      n_bytes = r.payload.length.toLong,
      first_byte = if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
      checksum = Codecs.murmur64a(r.payload))

  /** Uniform frame sampling for video-ish payloads: `k` frame rows per
    * media object with deterministic byte offsets (`floor(i·n/k)`). The
    * index math is pure expression (explode of a sequence — codegen'd,
    * no UDF), so sampling a trillion-frame corpus is one narrow
    * projection; a real decoder would seek `payload[byte_offset]`
    * inside the same `mapPartitions` stage as [[extractFeatures]]'s
    * stub.
    */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    media.select(col("doc_id"), length(col("payload")).as("n_bytes"),
        explode(sequence(lit(0), lit(k - 1))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // long math: frame_idx * n_bytes as int*int overflows (ANSI
        // throws) once payloads pass ~2^31/(k-1) bytes — video-scale
        // objects are exactly where that happens
        floor(col("frame_idx").cast("long") * col("n_bytes").cast("long") / lit(k))
          .cast("long").as("byte_offset"))
  }

  /** Exact byte-level payload statistics — the cheap corrupt/truncated-
    * file screen that runs BEFORE the expensive decode of a multimodal
    * ingest (zero-padded, truncated, or wrong-format payloads show up
    * as degenerate byte distributions). One native codegen histogram
    * per payload ([[graft.functions.ByteHistogram]] — a tight loop, no
    * per-byte explode); every statistic derives from the 256 bins in
    * plain column arithmetic. Integer outputs (n_bytes, byte_sum,
    * zero_count, distinct_bytes) are oracle-exact; `entropy_bits`
    * (Shannon, base 2) folds 256 fixed-order doubles — deterministic
    * in-engine, excluded from the cross-engine gate.
    */
  def byteStats(media: DataFrame): DataFrame = {
    import graft.functions.cellfunctions.byte_histogram
    val idx = sequence(lit(0), lit(255))
    media
      .select(col("doc_id"), col("payload"),
        byte_histogram(col("payload")).as("_h"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        aggregate(transform(idx, i => element_at(col("_h"), i + 1) * i),
          lit(0L), (acc, x) => acc + x).as("byte_sum"),
        element_at(col("_h"), 1).as("zero_count"),
        size(filter(col("_h"), x => x > 0)).cast("long").as("distinct_bytes"),
        aggregate(
          filter(col("_h"), x => x > 0),
          lit(0.0),
          (acc, x) => acc - (x.cast("double") / length(col("payload"))) *
            log2(x.cast("double") / length(col("payload"))))
          .as("entropy_bits"))
  }

  /** Partition-wise decode + feature extraction. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition init for a real codec would go here
      it.map(decodeStub)
    }
  }
}
