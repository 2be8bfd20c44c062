package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction as per-partition batch functions.
  *
  * The reference's whole data model is opaque blobs handed to user code
  * (one chunk string per map task, yamr mapper.py:74-84); this module is
  * the typed, columnar version of that contract: payloads stay opaque
  * `BinaryType` columns, metadata rides in typed columns, and the only
  * imperative step (the media decoder) runs as `mapPartitions` over a
  * `Dataset` — Spark's per-partition batch boundary, the Scala analog of
  * `mapInPandas`.
  *
  * The decoder itself is STUBBED (no image/audio libs in this
  * environment): `decodeStub` derives deterministic fake features from the
  * payload bytes. The Spark-side plumbing — schema, binary columns,
  * partitioning, batch shape — is real and oracle-tested.
  */
object Multimodal {

  /** A multimodal record: payload is an opaque byte blob. */
  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features (decode stub output). */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, head_byte: Int, checksum: Long)

  /** STUB decoder: a real implementation would decode the image/audio
    * payload here (e.g. JPEG → pixels → embedding). Deterministic fake:
    * byte length, first byte, and a little-endian additive checksum.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val sum = r.payload.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 1000000007L)
    MediaFeatures(r.doc_id, r.mime,
      r.payload.length.toLong,
      if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
      sum)
  }

  /** The per-partition decode pipeline: batch-shaped like mapInPandas —
    * one iterator in, one iterator out, no per-row task overhead.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeStub))
  }

  /** Builds a media table from `documents`: payload = UTF-8 bytes of the
    * text (the deterministic stand-in for real image bytes).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** One sampled "frame" of a media payload. A real implementation would
    * decode video and emit every k-th frame; the stub slices the payload
    * into fixed windows so the 1-record→N-frames dataflow (flatMap), frame
    * metadata, and downstream partitioning are all real.
    */
  final case class Frame(doc_id: Long, frame_no: Int, offset: Long, frame: Array[Byte])

  /** Frame sampling: emits every `stride`-th `frameBytes`-sized window of
    * the payload — the mapInPandas-shaped 1→N expansion for video/audio.
    */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (win, i) => Frame(r.doc_id, i, i.toLong * frameBytes, win) }
    }
  }

  /** "Resize" stub: a real decoder would scale pixels; the stub truncates
    * or zero-pads the payload to `targetBytes`, preserving the
    * fixed-output-size contract real resize has.
    */
  def resizeStub(r: MediaRecord, targetBytes: Int): MediaRecord =
    r.copy(payload = r.payload.padTo(targetBytes, 0.toByte).take(targetBytes))

  // ---------------------------------------------------------------- q42
  // Full multimodal path: binary column → repartitioned decode batches →
  // typed features, oracle-mirrored via byte arithmetic on the UTF-8
  // payload in DuckDB.
  private val q42 = GraftQuery(
    "q42_multimodal_features",
    (s, dir) => {
      val features = extractFeatures(mediaTable(s, dir))
      features.toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          col("head_byte"), col("checksum"))
        .orderBy(col("doc_id"))
    },
    Some("""
      -- byte-exact: fold over the hex pairs of the UTF-8 encoding, so
      -- multi-byte characters and empty payloads match the byte-level
      -- stub (per-character ascii() would diverge on non-ASCII text)
      WITH b AS (SELECT doc_id, hex(encode(text)) AS h FROM documents)
      SELECT doc_id, 'text/plain' AS mime,
             CAST(length(h) // 2 AS BIGINT) AS n_bytes,
             CAST(CASE WHEN length(h) = 0 THEN -1
                       ELSE ('0x' || substr(h, 1, 2))::BIGINT END AS INT) AS head_byte,
             CAST(list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(range(1, length(h) // 2 + 1),
                   i -> ('0x' || substr(h, CAST(i*2-1 AS INT), 2))::BIGINT)),
               (a, b) -> (a + b) % 1000000007) AS BIGINT) AS checksum
      FROM b
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q43b
  // Frame sampling over the media table: every 2nd 64-byte window, with
  // per-frame metadata — oracle mirrors the slicing arithmetic on the
  // UTF-8 text (ASCII corpus ⇒ byte == char).
  private val q43b = GraftQuery(
    "q42b_multimodal_frames",
    (s, dir) =>
      sampleFrames(mediaTable(s, dir), frameBytes = 64, stride = 2).toDF()
        .select(col("doc_id"), col("frame_no"), col("offset"),
          length(col("frame")).as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_no")),
    Some("""
      SELECT doc_id,
             CAST(i AS INT) AS frame_no,
             CAST(i * 64 AS BIGINT) AS offset,
             CAST(least(64, n - i * 64) AS INT) AS frame_bytes
      FROM (SELECT doc_id, octet_length(encode(text)) AS n,
                   unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS i
            FROM documents) t
      WHERE i % 2 = 0
      ORDER BY doc_id, frame_no"""))

  val all: Seq[GraftQuery] = Seq(q42, q43b)
}
