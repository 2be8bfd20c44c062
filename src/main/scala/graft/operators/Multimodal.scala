package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.ImageHeader
import graft.sources.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with a REAL dependency-free container decoder.
  *
  * The reference's whole data model is opaque blobs handed to user code
  * (one chunk string per map task, yamr mapper.py:74-84) and cannot
  * represent binary at all (SURVEY §1.2 — JSON-encodable types only);
  * this module is the typed, columnar version of that contract: payloads
  * stay opaque `BinaryType` columns, metadata rides in typed columns, and
  * decoding runs two ways —
  *
  *   - as a native codegen'd scalar ([[graft.functions.ImageHeader]],
  *     also SQL-registered as `image_header`) for header-only extraction
  *     that stays inside whole-stage codegen (q108), and
  *   - as `mapPartitions` over a typed `Dataset` — Spark's per-partition
  *     batch boundary, the Scala analog of `mapInPandas`, the shape a
  *     real pixel decoder (heavyweight per-batch library init) would use
  *     (q42).
  *
  * Both share one kernel: `ImageHeader.compute`, which parses PNG IHDR /
  * JPEG SOF / GIF logical-screen headers from raw bytes (pure
  * public-spec byte arithmetic — no image library exists in this
  * environment and none is needed for header decode; a PIXEL decoder
  * would slot into `extractFeatures`'s mapPartitions body). The test
  * corpus embeds real spec-conformant headers built from the documents
  * table, so the oracle can replay both the construction arithmetic and
  * the parse offsets byte for byte.
  */
object Multimodal {

  /** A multimodal record: payload is an opaque byte blob. */
  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded features: container format + parsed dimensions + size. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      format: String, width: Int, height: Int, valid: Boolean)

  /** The per-partition decode pipeline: batch-shaped like mapInPandas —
    * one iterator in, one iterator out, no per-row task overhead. Calls
    * the same parse kernel the codegen'd expression uses.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (fmt, w, h, ok) = ImageHeader.parse(r.payload)
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, fmt, w, h, ok)
    })
  }

  // ------------------------------------------------------- synthetic corpus
  // Real spec-conformant image headers, built deterministically from
  // documents: dims from doc_id arithmetic, a body from the text's first
  // bytes, format cycling png/jpeg/gif/raw, and a truncation case that
  // exercises every decoder bail-out path. Construction goes through a
  // HEX string (lpad(hex(n))) so DuckDB can rebuild the identical layout
  // and parse the dims back out of the hex at the public-spec byte
  // offsets — the construction and the parse pin each other.
  //
  // Per-format layout (all offsets are the container specs'):
  //   png  = sig(8) | len=13(4BE) | "IHDR" | w(4BE) | h(4BE) |
  //          depth8 color6 comp0 filt0 inter0 | crc(4, zeros) | body
  //   jpeg = SOI | COM(len=2+k, k 'A's) | SOF0(len=17, prec8, h(2BE),
  //          w(2BE), 3 components) | EOI | body
  //   gif  = "GIF89a" | w(2LE) | h(2LE) | packed F7, bg 0, aspect 0 | body
  //   raw  = 0x00 | body                      (no magic → "unknown")
  // Truncation (doc_id % 13 == 0): payload cut to 7 bytes — shorter than
  // the PNG signature (format falls to "unknown"), mid-COM for JPEG,
  // mid-screen-descriptor for GIF; every case must decode as invalid.

  private def hexW4(c: Column) = lpad(hex(c), 4, "0")
  private def hexW8(c: Column) = lpad(hex(c), 8, "0")
  private def le16(hex4: Column): Column =
    concat(substring(hex4, 3, 2), substring(hex4, 1, 2))

  /** documents → (doc_id, mime, payload) with real embedded headers. */
  def imageTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .withColumn("fmt", pmod(col("doc_id"), lit(4)).cast("int"))
      .withColumn("w", (pmod(col("doc_id"), lit(1021)) + 1).cast("int"))
      .withColumn("h", (pmod(col("doc_id"), lit(763)) + 1).cast("int"))
      .withColumn("k", pmod(col("doc_id"), lit(7)).cast("int"))
      .withColumn("bodyhex", hex(substring(col("text").cast("binary"), 1, 32)))
    val pngHex = concat(
      lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      hexW8(col("w")), hexW8(col("h")), lit("0806000000"), lit("00000000"),
      col("bodyhex"))
    val jpegHex = concat(
      lit("FFD8"), lit("FFFE"), hexW4(col("k") + 2), expr("repeat('41', k)"),
      lit("FFC0"), lit("0011"), lit("08"), hexW4(col("h")), hexW4(col("w")),
      lit("03"), lit("011100"), lit("021101"), lit("031101"),
      lit("FFD9"), col("bodyhex"))
    val gifHex = concat(
      lit("474946383961"), le16(hexW4(col("w"))), le16(hexW4(col("h"))),
      lit("F70000"), col("bodyhex"))
    val rawHex = concat(lit("00"), col("bodyhex"))
    val full = unhex(
      when(col("fmt") === 0, pngHex)
        .when(col("fmt") === 1, jpegHex)
        .when(col("fmt") === 2, gifHex)
        .otherwise(rawHex))
    d.select(col("doc_id"),
        when(col("fmt") === 0, lit("image/png"))
          .when(col("fmt") === 1, lit("image/jpeg"))
          .when(col("fmt") === 2, lit("image/gif"))
          .otherwise(lit("application/octet-stream")).as("mime"),
        when(pmod(col("doc_id"), lit(13)) === 0, substring(full, 1, 7))
          .otherwise(full).as("payload"))
      .as[MediaRecord]
  }

  /** The shared oracle truth table: rebuilds the header hex in DuckDB and
    * parses width/height back out of it at the SPEC byte offsets (PNG
    * w at bytes 16–19 BE → hex chars 33–40; JPEG SOF height at byte
    * 11+k BE → chars 23+2k; GIF w at bytes 6–7 LE → chars 13–16
    * byte-swapped), so a decoder reading the wrong offsets or endianness
    * cannot hash-match. `cols` picks the projected output columns.
    */
  private def oracleSql(cols: String): String =
    s"""
      WITH base AS (
        SELECT doc_id,
               CAST(doc_id % 4 AS INT) AS fmt,
               CAST(doc_id % 1021 + 1 AS INT) AS w,
               CAST(doc_id % 763 + 1 AS INT) AS h,
               CAST(doc_id % 7 AS INT) AS k,
               (doc_id % 13 = 0) AS trunc,
               least(32, octet_length(encode(text))) AS body_n
        FROM documents),
      hx AS (
        SELECT *,
               '89504E470D0A1A0A' || '0000000D' || '49484452' ||
                 lpad(hex(w), 8, '0') || lpad(hex(h), 8, '0') ||
                 '0806000000' || '00000000' AS png_hex,
               'FFD8' || 'FFFE' || lpad(hex(k + 2), 4, '0') || repeat('41', k) ||
                 'FFC0' || '0011' || '08' || lpad(hex(h), 4, '0') ||
                 lpad(hex(w), 4, '0') ||
                 '03' || '011100' || '021101' || '031101' || 'FFD9' AS jpeg_hex,
               '474946383961' ||
                 substr(lpad(hex(w), 4, '0'), 3, 2) || substr(lpad(hex(w), 4, '0'), 1, 2) ||
                 substr(lpad(hex(h), 4, '0'), 3, 2) || substr(lpad(hex(h), 4, '0'), 1, 2) ||
                 'F70000' AS gif_hex
        FROM base),
      parsed AS (
        SELECT *,
               CASE fmt
                 WHEN 0 THEN ('0x' || substr(png_hex, 33, 8))::BIGINT
                 WHEN 1 THEN ('0x' || substr(jpeg_hex, 27 + 2*k, 4))::BIGINT
                 WHEN 2 THEN ('0x' || substr(gif_hex, 15, 2) || substr(gif_hex, 13, 2))::BIGINT
               END AS pw,
               CASE fmt
                 WHEN 0 THEN ('0x' || substr(png_hex, 41, 8))::BIGINT
                 WHEN 1 THEN ('0x' || substr(jpeg_hex, 23 + 2*k, 4))::BIGINT
                 WHEN 2 THEN ('0x' || substr(gif_hex, 19, 2) || substr(gif_hex, 17, 2))::BIGINT
               END AS ph
        FROM hx),
      o AS (
        SELECT doc_id,
               CASE WHEN fmt = 0 THEN 'image/png' WHEN fmt = 1 THEN 'image/jpeg'
                    WHEN fmt = 2 THEN 'image/gif'
                    ELSE 'application/octet-stream' END AS mime,
               CASE WHEN trunc THEN least(CASE fmt WHEN 0 THEN 33 + body_n
                                                   WHEN 1 THEN 27 + k + body_n
                                                   WHEN 2 THEN 13 + body_n
                                                   ELSE 1 + body_n END, 7)
                    ELSE CASE fmt WHEN 0 THEN 33 + body_n
                                  WHEN 1 THEN 27 + k + body_n
                                  WHEN 2 THEN 13 + body_n
                                  ELSE 1 + body_n END
               END AS n_bytes,
               -- a 7-byte truncation beheads the 8-byte PNG signature, so
               -- the decoder can only call it "unknown"; JPEG/GIF magics
               -- survive 7 bytes and keep their format label
               CASE WHEN fmt = 3 OR (trunc AND fmt = 0) THEN 'unknown'
                    WHEN fmt = 0 THEN 'png' WHEN fmt = 1 THEN 'jpeg'
                    ELSE 'gif' END AS format,
               CAST(CASE WHEN trunc OR fmt = 3 THEN -1 ELSE pw END AS INT) AS width,
               CAST(CASE WHEN trunc OR fmt = 3 THEN -1 ELSE ph END AS INT) AS height,
               (NOT trunc AND fmt <> 3) AS valid
        FROM parsed)
      SELECT $cols FROM o ORDER BY doc_id"""

  // ---------------------------------------------------------------- q108
  // The codegen'd-expression decode path: image_header(payload) as a
  // single projected scalar — header extraction over a 100 TB binary
  // column as one WholeStageCodegen'd scan, no UDF, no partition-batch
  // boundary. The oracle rebuilds every header per spec and re-parses it
  // from the hex at the spec offsets (construction ⊗ parse cross-pin).
  private val q108 = GraftQuery(
    "q108_image_header",
    (s, dir) =>
      imageTable(s, dir).toDF()
        .select(col("doc_id"), ImageHeader(col("payload")).as("ih"),
          length(col("payload")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("ih.format").as("format"),
          col("ih.width").as("width"), col("ih.height").as("height"),
          col("ih.valid").as("valid"), col("n_bytes"))
        .orderBy(col("doc_id")),
    Some(oracleSql("doc_id, format, width, height, valid, CAST(n_bytes AS BIGINT) AS n_bytes")))

  // ---------------------------------------------------------------- q42
  // The typed mapPartitions decode path (the mapInPandas analog a pixel
  // decoder would use), same kernel, plus the mime metadata column —
  // migrated off the old deterministic stub to the real decoder (r10).
  private val q42 = GraftQuery(
    "q42_multimodal_features",
    (s, dir) => {
      extractFeatures(imageTable(s, dir)).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          col("format"), col("width"), col("height"), col("valid"))
        .orderBy(col("doc_id"))
    },
    Some(oracleSql(
      "doc_id, mime, CAST(n_bytes AS BIGINT) AS n_bytes, format, width, height, valid")))

  /** One sampled "frame" of a media payload: every `stride`-th
    * `frameBytes`-sized window — the 1-record→N-frames dataflow (flatMap)
    * for video/audio, with per-frame metadata and downstream
    * partitioning all real. (A codec would replace `grouped` with real
    * frame boundaries; the dataflow shape is identical.)
    */
  final case class Frame(doc_id: Long, frame_no: Int, offset: Long, frame: Array[Byte])

  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (win, i) => Frame(r.doc_id, i, i.toLong * frameBytes, win) }
    }
  }

  // ---------------------------------------------------------------- q42b
  // Frame sampling over the image corpus: every 2nd 64-byte window with
  // per-frame metadata — the oracle derives each payload's exact byte
  // length from the construction arithmetic and replays the slicing.
  private val q42b = GraftQuery(
    "q42b_multimodal_frames",
    (s, dir) =>
      sampleFrames(imageTable(s, dir), frameBytes = 64, stride = 2).toDF()
        .select(col("doc_id"), col("frame_no"), col("offset"),
          length(col("frame")).as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_no")),
    Some("""
      WITH base AS (
        SELECT doc_id,
               CAST(doc_id % 4 AS INT) AS fmt,
               CAST(doc_id % 7 AS INT) AS k,
               (doc_id % 13 = 0) AS trunc,
               least(32, octet_length(encode(text))) AS body_n
        FROM documents),
      sized AS (
        SELECT doc_id,
               CASE WHEN trunc
                    THEN least(CASE fmt WHEN 0 THEN 33 + body_n
                                        WHEN 1 THEN 27 + k + body_n
                                        WHEN 2 THEN 13 + body_n
                                        ELSE 1 + body_n END, 7)
                    ELSE CASE fmt WHEN 0 THEN 33 + body_n
                                  WHEN 1 THEN 27 + k + body_n
                                  WHEN 2 THEN 13 + body_n
                                  ELSE 1 + body_n END
               END AS n
        FROM base)
      SELECT doc_id,
             CAST(i AS INT) AS frame_no,
             CAST(i * 64 AS BIGINT) AS offset,
             CAST(least(64, n - i * 64) AS INT) AS frame_bytes
      FROM (SELECT doc_id, n, unnest(range(0, (n + 63) // 64)) AS i FROM sized) t
      WHERE i % 2 = 0
      ORDER BY doc_id, frame_no"""))

  /** "Resize" to a fixed output size: truncate or zero-pad the payload to
    * `targetBytes` — the fixed-output-size contract real resize has (a
    * pixel implementation would scale instead of pad; same column shape).
    */
  def resizeFixed(r: MediaRecord, targetBytes: Int): MediaRecord =
    r.copy(payload = r.payload.padTo(targetBytes, 0.toByte).take(targetBytes))

  // ---------------------------------------------------------------- q131
  // Audio/video container decode — the WAV (RIFF fmt-chunk walk) and MP4
  // (ISO BMFF ftyp box) siblings of q108's image decoder, completing the
  // §2.14 multimodal mandate across all three modalities with REAL
  // public-spec parsers. Corpus synthesized in-plan with real headers
  // (sample rate / channel / brand fields from doc arithmetic, a 9-byte
  // truncation case that stops each parser at a different bail-out);
  // the oracle recomputes every expected field from the same
  // construction arithmetic — a wrong construction or a wrong parse
  // both break the match.
  //
  // Per-format layout (spec offsets):
  //   wav = "RIFF" | sz(4LE)=36+body | "WAVE" | "fmt " | 16(4LE) |
  //         pcm=1(2LE) | channels(2LE) | rate(4LE) | byte_rate(4LE) |
  //         block_align(2LE) | bits=16(2LE) | "data" | body_n(4LE) | body
  //   mp4 = size=20(4BE) | "ftyp" | brand(4) | minor=0(4) | "isom" | body
  //   raw = 0x00 | body                              (no magic → unknown)
  // Truncation (doc_id % 13 == 0): 9 bytes — RIFF present but "WAVE"
  // missing (→ unknown), ftyp present but brand cut (→ mp4, invalid).

  private def le32(hex8: Column): Column =
    concat(substring(hex8, 7, 2), substring(hex8, 5, 2),
      substring(hex8, 3, 2), substring(hex8, 1, 2))

  /** documents → (doc_id, mime, payload) with real WAV/MP4 headers. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .withColumn("fmt", pmod(col("doc_id"), lit(3)).cast("int"))
      .withColumn("ch", (pmod(col("doc_id"), lit(2)) + 1).cast("int"))
      .withColumn("rate", (lit(8000) + pmod(col("doc_id"), lit(8)) * lit(4000)).cast("int"))
      .withColumn("bodyhex", hex(substring(col("text").cast("binary"), 1, 32)))
      .withColumn("body_n", (length(col("bodyhex")) / 2).cast("int"))
    val wavHex = concat(
      lit("52494646"), le32(hexW8(col("body_n") + 36)), lit("57415645"),
      lit("666D7420"), lit("10000000"), lit("0100"),
      le16(hexW4(col("ch"))), le32(hexW8(col("rate"))),
      le32(hexW8(col("rate") * col("ch") * 2)), le16(hexW4(col("ch") * 2)),
      lit("1000"), lit("64617461"), le32(hexW8(col("body_n"))),
      col("bodyhex"))
    val mp4Hex = concat(
      lit("00000014"), lit("66747970"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("69736F6D"))
        .otherwise(lit("6D703432")),
      lit("00000000"), lit("69736F6D"), col("bodyhex"))
    val rawHex = concat(lit("00"), col("bodyhex"))
    val full = unhex(
      when(col("fmt") === 0, wavHex)
        .when(col("fmt") === 1, mp4Hex)
        .otherwise(rawHex))
    d.select(col("doc_id"),
        when(col("fmt") === 0, lit("audio/wav"))
          .when(col("fmt") === 1, lit("video/mp4"))
          .otherwise(lit("application/octet-stream")).as("mime"),
        when(pmod(col("doc_id"), lit(13)) === 0, substring(full, 1, 9))
          .otherwise(full).as("payload"))
      .as[MediaRecord]
  }

  private val q131 = GraftQuery(
    "q131_media_header",
    (s, dir) =>
      mediaTable(s, dir).toDF()
        .select(col("doc_id"),
          graft.functions.MediaHeader(col("payload")).as("mh"),
          length(col("payload")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("mh.format").as("format"),
          col("mh.sample_rate").as("sample_rate"),
          col("mh.channels").as("channels"), col("mh.bits").as("bits"),
          col("mh.brand").as("brand"),
          col("mh.duration_ms").as("duration_ms"),
          col("mh.n_samples").as("n_samples"),
          col("mh.valid").as("valid"),
          col("n_bytes"))
        .orderBy(col("doc_id")),
    Some("""
      WITH base AS (
        SELECT doc_id,
               CAST(doc_id % 3 AS INT) AS fmt,
               (doc_id % 13 = 0) AS trunc,
               CAST(doc_id % 2 + 1 AS INT) AS ch,
               CAST(8000 + (doc_id % 8) * 4000 AS INT) AS rate,
               least(32, octet_length(encode(text))) AS body_n
        FROM documents),
      sized AS (
        SELECT *, CASE fmt WHEN 0 THEN 44 + body_n
                           WHEN 1 THEN 20 + body_n
                           ELSE 1 + body_n END AS sz
        FROM base)
      SELECT doc_id,
             CASE WHEN fmt = 1 THEN 'mp4'
                  WHEN fmt = 0 AND NOT trunc THEN 'wav'
                  ELSE 'unknown' END AS format,
             CASE WHEN fmt = 0 AND NOT trunc THEN rate ELSE -1 END AS sample_rate,
             CASE WHEN fmt = 0 AND NOT trunc THEN ch ELSE -1 END AS channels,
             CASE WHEN fmt = 0 AND NOT trunc THEN 16 ELSE -1 END AS bits,
             CASE WHEN fmt = 1 AND NOT trunc
                  THEN (CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END)
                  ELSE '' END AS brand,
             CAST(CASE WHEN fmt = 0 AND NOT trunc
                  THEN (body_n * 1000) // (rate * ch * 2) ELSE -1 END AS BIGINT) AS duration_ms,
             CAST(CASE WHEN fmt = 0 AND NOT trunc
                  THEN body_n // (ch * 2) ELSE -1 END AS BIGINT) AS n_samples,
             (NOT trunc AND fmt IN (0, 1)) AS valid,
             CAST(CASE WHEN trunc THEN least(sz, 9) ELSE sz END AS BIGINT) AS n_bytes
      FROM sized
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q42, q42b, q108, q131)
}
