package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.{GraftIO, Tables}

/** WARC record parsing (ISO 28500 — the WARC/1.0 web-archive format
  * every real crawl pipeline starts from; VERDICT r14 next #1), pushing
  * the engine's ingestion frontier one stage upstream of HTML
  * ([[Extraction.htmlText]] consumes what this emits).
  *
  * A WARC record is:
  * {{{
  *   WARC/1.0<CRLF>
  *   <header-field>: <value><CRLF>   (any number, names case-insensitive)
  *   <CRLF>
  *   <body: Content-Length octets><CRLF><CRLF>
  * }}}
  *
  * [[warcParse]] takes ONE RECORD PER ROW in a string column (the
  * record-splitting of a raw `.warc` stream is a framing concern the
  * source layer handles; see scaladoc there) and is the q171
  * discipline end to end: every field is a codegen'd
  * `regexp_extract`/`substring_index`/`instr` column — zero UDFs, one
  * stateless scan projection, no shuffle, trivially linear at 100 TB —
  * and the body is pinned as (length, md5), never materialized into
  * the result (the q66 redaction-proof convention).
  *
  * Refusal semantics (never-throws, crawl-grade): a record missing the
  * version line, the blank-line separator, a parseable `Content-Length`
  * (≤ 18 digits), or a `WARC-Type` is `valid = false` with every field
  * that DID parse still emitted — a malformed-record triage query needs
  * the partial fields. In [[warcParse]] the body is taken as
  * `Content-Length` CHARS after the first blank line (a STRING column;
  * char = octet only for ASCII transport — the in-plan fixture domain);
  * a declared length past the record end truncates to what is present
  * rather than failing.
  *
  * BYTE-TRUE path (`Content-Length` is OCTETS per ISO 28500 §5.3, and
  * most of the web is multi-byte UTF-8): [[warcParseBytes]] takes a
  * BINARY record column ([[graft.sources.WarcSource.readWarcRecordsBinary]])
  * and slices the body by BYTES via the ISO-8859-1 transport decode —
  * latin-1 is a bijection byte↔char, so every char position IS a byte
  * position and the whole char machinery above becomes byte-exact, all
  * still codegen'd (zero UDFs). The body re-encodes to its exact bytes
  * for (byte length, md5); the UTF-8 text view is an EXPLICIT stage
  * with refusal (`body_is_utf8 = false`, `n_chars = NULL` for invalid
  * sequences — binary payloads stay bytes, never mojibake).
  */
object Warc {

  private val CRLF = "\r\n"

  /** `(?mi)` header-field extractor: line-anchored, case-insensitive
    * (RFC-style field names), value = rest of line (CR excluded by the
    * char class), NULL when the field is absent. */
  private[operators] def field(hdr: Column, name: String): Column =
    when(regexp_extract(hdr, s"(?mi)^$name:[ \\t]*([^\\r\\n]*)", 1) === "",
      lit(null).cast("string"))
      .otherwise(regexp_extract(hdr, s"(?mi)^$name:[ \\t]*([^\\r\\n]*)", 1))

  /** The shared parse columns: (version, sep, hdr, content_length,
    * body) — every consumer derives from these five. */
  private def parsed(rec: Column): (Column, Column, Column, Column, Column) = {
    val version0 = regexp_extract(rec, "^WARC/([0-9]+\\.[0-9]+)\\r\\n", 1)
    val version = when(version0 === "", lit(null).cast("string"))
      .otherwise(version0)
    val sep = instr(rec, CRLF + CRLF) // 1-based char pos; 0 = absent
    val hdr = substring_index(rec, CRLF + CRLF, 1)
    val clRaw = field(hdr, "Content-Length")
    // branch-guarded cast (ANSI-safe): only digit runs reach the cast
    val contentLength = when(clRaw.rlike("^[0-9]{1,18}$"), clRaw.cast("long"))
    val bodyRaw = when(sep >= 1, rec.substr(sep + lit(4), length(rec)))
    val body = when(contentLength.isNotNull,
      bodyRaw.substr(lit(1),
        least(contentLength, length(bodyRaw).cast("long")).cast("int")))
    (version, sep, hdr, contentLength, body)
  }

  /** Parse one WARC record per row of `recCol`; emits
    * `(idCol, warc_version, warc_type, target_uri, record_id,
    * content_length, n_headers, body_len, body_md5, valid)`. */
  def warcParse(records: DataFrame, idCol: String, recCol: String): DataFrame = {
    val rec = col(recCol)
    val (version, sep, hdr, contentLength, body) = parsed(rec)
    records.select(col(idCol),
      version.as("warc_version"),
      field(hdr, "WARC-Type").as("warc_type"),
      field(hdr, "WARC-Target-URI").as("target_uri"),
      field(hdr, "WARC-Record-ID").as("record_id"),
      contentLength.as("content_length"),
      when(sep >= 1, (size(split(hdr, CRLF)) - 1).cast("long"))
        .as("n_headers"),
      length(body).cast("long").as("body_len"),
      md5(body).as("body_md5"),
      (version.isNotNull && sep >= 1 &&
        field(hdr, "WARC-Type").isNotNull && contentLength.isNotNull)
        .as("valid"))
  }

  /** Byte-true parse of one BINARY WARC record per row of `recCol`
    * (see the module scaladoc): emits
    * `(idCol, warc_version, warc_type, target_uri, record_id,
    * content_length, n_headers, body_len, n_chars, body_md5,
    * body_is_utf8, valid)` — `body_len`/`body_md5` over the exact
    * BYTES, `n_chars` the code-point count of the UTF-8 text view
    * (NULL when the body is not valid UTF-8: binary payloads refuse
    * the text stage instead of decoding to mojibake). */
  def warcParseBytes(records: DataFrame, idCol: String,
      recCol: String): DataFrame = {
    // BYTE-domain parse (round 17 hot-path rework; measured 19 MB/s as
    // decode-whole-record → string ops → re-encode): the separator is
    // found in the raw bytes ([[graft.functions.BytesIndexOf]] — char
    // position == byte position under the latin-1 transport, so this
    // is the old `instr` verbatim), ONLY the header region decodes
    // through the transport (it is small and ASCII-shaped; when the
    // separator is absent the whole record is the header, the
    // substring_index fallback semantics), and the body is a BINARY
    // slice — md5/length/UTF-8 validation run on bytes directly with
    // no encode() round trip. Field/version regexes see byte-identical
    // inputs to the transport-string form, so every oracle pin holds.
    val recB = col(recCol)
    val sep = graft.functions.BytesIndexOf(recB, CRLF + CRLF)
    val hdr = when(sep >= 1,
        decode(substring(recB, lit(1), sep - 1), "ISO-8859-1"))
      .otherwise(decode(recB, "ISO-8859-1"))
    // the version pattern requires its own CRLF: bytes 1..sep+1 are
    // hdr + "\r\n" exactly, covering the empty-header-section edge
    // ("WARC/1.0\r\n\r\n…") where the version line's CRLF IS the
    // separator's first half; with no separator the whole record is
    // the source, as before
    val vsrc = when(sep >= 1,
        decode(substring(recB, lit(1), sep + 1), "ISO-8859-1"))
      .otherwise(decode(recB, "ISO-8859-1"))
    val version0 = regexp_extract(vsrc, "^WARC/([0-9]+\\.[0-9]+)\\r\\n", 1)
    val version = when(version0 === "", lit(null).cast("string"))
      .otherwise(version0)
    val clRaw = field(hdr, "Content-Length")
    val contentLength = when(clRaw.rlike("^[0-9]{1,18}$"), clRaw.cast("long"))
    // body = min(declared, available) octets after the separator (the
    // transport form's least() slice, in bytes); NULL when the length
    // is missing/unparseable or there is no separator — as before
    val bytes = when(contentLength.isNotNull && sep >= 1,
      substring(recB, sep + lit(4),
        least(contentLength,
          length(recB).cast("long") - sep - lit(3)).cast("int")))
    // cast BINARY->STRING is a byte reinterpret (no transcode): validate,
    // then expose as text only when the bytes ARE UTF-8
    val text = when(is_valid_utf8(bytes.cast("string")), bytes.cast("string"))
    records.select(col(idCol),
      version.as("warc_version"),
      field(hdr, "WARC-Type").as("warc_type"),
      field(hdr, "WARC-Target-URI").as("target_uri"),
      field(hdr, "WARC-Record-ID").as("record_id"),
      contentLength.as("content_length"),
      when(sep >= 1, (size(split(hdr, CRLF)) - 1).cast("long"))
        .as("n_headers"),
      length(bytes).cast("long").as("body_len"), // length(BINARY) = octets
      length(text).cast("long").as("n_chars"),
      md5(bytes).as("body_md5"),
      when(bytes.isNotNull, text.isNotNull).as("body_is_utf8"),
      (version.isNotNull && sep >= 1 &&
        field(hdr, "WARC-Type").isNotNull && contentLength.isNotNull)
        .as("valid"))
  }

  /** The chain-ingest form ([[graft.operators.CurationChain]] q93c):
    * VALID `response` records only, with the body TEXT itself (the one
    * consumer allowed to materialize bodies — it feeds them straight
    * into [[Extraction.htmlText]]), as
    * `(idCol, target_uri, body)`. Same stateless projection as
    * [[warcParse]] plus the validity filter — still zero UDFs, no
    * shuffle. */
  def warcBodies(records: DataFrame, idCol: String, recCol: String,
      keep: Seq[String] = Nil): DataFrame =
    bodiesFrom(records, idCol, col(recCol), keep)

  /** [[warcBodies]] on a BINARY record column: the record decodes
    * through the latin-1 transport (module scaladoc) so the
    * Content-Length slice is byte-exact, and the body comes back as
    * the TRANSPORT string — each char one original byte, ready for
    * [[Http]] (whose header grammar is ASCII) and then
    * [[Http.transcode]] to real text. */
  def warcBodiesBytes(records: DataFrame, idCol: String, recCol: String,
      keep: Seq[String] = Nil): DataFrame =
    bodiesFrom(records, idCol, decode(col(recCol), "ISO-8859-1"), keep)

  private def bodiesFrom(records: DataFrame, idCol: String, rec: Column,
      keep: Seq[String]): DataFrame = {
    val (version, sep, hdr, contentLength, body) = parsed(rec)
    val kept = keep.map(col)
    records.select((col(idCol) +: kept) ++ Seq(
        field(hdr, "WARC-Target-URI").as("target_uri"),
        body.as("body"),
        (version.isNotNull && sep >= 1 && contentLength.isNotNull &&
          field(hdr, "WARC-Type") === "response").as("__keep")): _*)
      .filter(col("__keep"))
      .select((col(idCol) +: kept) ++
        Seq(col("target_uri"), col("body")): _*)
  }

  // ------------------------------------------- q93c crawl-corpus builder
  /** The q93c crawl fixture: every record is a `response` whose body is
    * an HTML wrap of the document text exercising the downstream
    * extract/normalize stages (script kill, numeric + named entities,
    * a DECOMPOSED `cafe`+U+0301 so NFC visibly composes), with the
    * q177 malformed rotation (%13 truncated → no separator, %11 HTTP
    * prefix → version anchor fails) and a path rotation (%7 → `/ads/`)
    * for the path-prefix gate. The q93c oracle reconstructs the
    * SURVIVING parse state from this arithmetic (the q131
    * construction⊗parse convention). */
  private[operators] def crawlHtml(): Column =
    concat(
      lit("<html><head><script>var x = '<b>no</b>';</script>" +
        "<STYLE>p{}</STYLE></head><body><p>"),
      col("text"),
      lit("</p><div>cafe\u0301 &#65;&amp;B</div></body></html>"))

  private[operators] val crawlHtmlSql: String =
    "'<html><head><script>var x = ''<b>no</b>'';</script>" +
      "<STYLE>p{}</STYLE></head><body><p>' || text || " +
      "'</p><div>cafe' || chr(769) || ' &#65;&amp;B</div></body></html>'"

  private[operators] def crawlRecord(): Column = {
    val html = crawlHtml()
    val uri = concat(lit("http://"), col("source"), lit(".example.com"),
      when(pmod(col("doc_id"), lit(7)) === 0, lit("/ads/"))
        .otherwise(lit("/doc/")),
      col("doc_id").cast("string"))
    val full = concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: response" + CRLF),
      lit("WARC-Target-URI: "), uri, lit(CRLF),
      lit("Content-Length: "), length(html).cast("string"),
      lit(CRLF + CRLF),
      html, lit(CRLF + CRLF))
    malformedRotation(full)
  }

  /** The shared malformed-record rotation (%13 truncation kills the
    * blank line, %11 HTTP prefix kills the version anchor) — one
    * definition for the q177 and q93c fixtures (code-review r15). */
  private def malformedRotation(full: Column): Column =
    when(pmod(col("doc_id"), lit(13)) === 0, substring(full, 1, 20))
      .when(pmod(col("doc_id"), lit(11)) === 0,
        concat(lit("HTTP/1.1 200 OK" + CRLF), full))
      .otherwise(full)

  // ---------------------------------------------------------------- q177
  // In-plan-synthesized WARC corpus over the documents fixture (the q131
  // construction⊗parse convention — the oracle recomputes every expected
  // field from the same arithmetic, so a wrong build or a wrong parse
  // both break the hash): response/request/metadata rotation, a
  // lowercase `content-length` variant exercising case-insensitive field
  // names, and two bail-outs — a 20-char truncation (no blank line) and
  // a non-WARC HTTP prefix (version anchor fails).
  // ONE header template ([[cleanRecord]]) + the shared malformed
  // rotation — q177 and q177b can no longer drift (code-review r15)
  private def warcRecord(): Column = malformedRotation(cleanRecord())

  private val q177 = GraftQuery(
    "q177_warc_parse",
    (s, dir) => warcParse(
        Tables.documents(s, dir).withColumn("rec", warcRecord()),
        "doc_id", "rec")
      .orderBy(col("doc_id")),
    Some("""
      WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN substr(whole, 1, 20)
                    WHEN doc_id % 11 = 0 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10) || whole
                    ELSE whole END AS rec
        FROM (SELECT doc_id,
                     'WARC/1.0' || chr(13) || chr(10) ||
                     'WARC-Type: ' || (CASE CAST(doc_id % 3 AS INT)
                         WHEN 0 THEN 'response' WHEN 1 THEN 'request'
                         ELSE 'metadata' END) || chr(13) || chr(10) ||
                     'WARC-Record-ID: <urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' || chr(13) || chr(10) ||
                     'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10) ||
                     'WARC-Target-URI: http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ||
                     (CASE WHEN doc_id % 5 = 0 THEN 'content-length' ELSE 'Content-Length' END) ||
                     ': ' || CAST(strlen(text) AS VARCHAR) || chr(13) || chr(10) || chr(13) || chr(10) ||
                     text || chr(13) || chr(10) || chr(13) || chr(10) AS whole
              FROM documents)),
      p AS (
        SELECT doc_id, rec,
               NULLIF(regexp_extract(rec, '^WARC/([0-9]+\.[0-9]+)\r\n', 1), '') AS warc_version,
               strpos(rec, chr(13)||chr(10)||chr(13)||chr(10)) AS sep,
               split_part(rec, chr(13)||chr(10)||chr(13)||chr(10), 1) AS hdr
        FROM raw),
      f AS (
        SELECT doc_id, rec, warc_version, sep, hdr,
               NULLIF(regexp_extract(hdr, '(?mi)^WARC-Type:[ \t]*([^\r\n]*)', 1), '') AS warc_type,
               NULLIF(regexp_extract(hdr, '(?mi)^WARC-Target-URI:[ \t]*([^\r\n]*)', 1), '') AS target_uri,
               NULLIF(regexp_extract(hdr, '(?mi)^WARC-Record-ID:[ \t]*([^\r\n]*)', 1), '') AS record_id,
               NULLIF(regexp_extract(hdr, '(?mi)^Content-Length:[ \t]*([^\r\n]*)', 1), '') AS cl_raw
        FROM p),
      g AS (
        SELECT doc_id, warc_version, warc_type, target_uri, record_id, sep, hdr,
               CASE WHEN regexp_full_match(cl_raw, '[0-9]{1,18}')
                    THEN TRY_CAST(cl_raw AS BIGINT) END AS content_length,
               CASE WHEN sep >= 1 THEN substr(rec, sep + 4) END AS body_raw
        FROM f),
      h AS (
        SELECT doc_id, warc_version, warc_type, target_uri, record_id,
               content_length, sep, hdr,
               CASE WHEN content_length IS NOT NULL
                    THEN substr(body_raw, 1, CAST(least(content_length, len(body_raw)) AS INT)) END AS body
        FROM g)
      SELECT doc_id, warc_version, warc_type, target_uri, record_id,
             content_length,
             CASE WHEN sep >= 1
                  THEN CAST(len(string_split(hdr, chr(13)||chr(10))) - 1 AS BIGINT) END AS n_headers,
             CAST(len(body) AS BIGINT) AS body_len,
             md5(body) AS body_md5,
             (warc_version IS NOT NULL AND sep >= 1 AND
              warc_type IS NOT NULL AND content_length IS NOT NULL) AS valid
      FROM h
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q177b
  // FILE round-trip through the source layer: the same per-doc records
  // as q177 but WELL-FORMED (framing fidelity is this query's subject;
  // malformed handling is q177's), written as `.warc` part files,
  // re-read via the BYTE-TRUE path
  // ([[graft.sources.WarcSource.readWarcRecordsBinary]] +
  // [[warcParseBytes]] — files are bytes, so the file form of this
  // query is the byte form), and re-keyed by the doc id carried in
  // WARC-Record-ID. The oracle reconstructs every field from the
  // construction arithmetic — a framing bug (lost/merged/split record)
  // breaks the row count or a hash; a parse bug breaks the fields.
  private def cleanRecord(): Column = {
    val m3 = pmod(col("doc_id"), lit(3))
    val wtype = when(m3 === 0, lit("response"))
      .when(m3 === 1, lit("request")).otherwise(lit("metadata"))
    val clName = when(pmod(col("doc_id"), lit(5)) === 0,
      lit("content-length")).otherwise(lit("Content-Length"))
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: "), wtype, lit(CRLF),
      lit("WARC-Record-ID: <urn:uuid:"), col("doc_id").cast("string"),
      lit(">" + CRLF),
      lit("WARC-Date: 2026-01-01T00:00:00Z" + CRLF),
      lit("WARC-Target-URI: http://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"), lit(CRLF),
      // OCTET framing (ISO 28500 §5.3): the splitter jumps bytes, so a
      // char-count here would misframe any non-ASCII body (ADVICE r16)
      clName, lit(": "), length(encode(col("text"), "UTF-8")).cast("string"),
      lit(CRLF + CRLF),
      col("text"), lit(CRLF + CRLF))
  }

  private val q177b = GraftQuery(
    "q177b_warc_file_roundtrip",
    (s, dir) => {
      // fixture boundary: write the synthesized crawl as real .warc
      // files (a SET of part files, natural partitioning — the
      // production shape: framing parallelism is per FILE, and a
      // single coalesced file measurably degenerated the x100 decade
      // probe to one framing task); text-writer row separators ('\n')
      // between records are exactly the inter-record noise the
      // splitter's resync-skip is specified to ignore. Run-unique dir
      // (GraftIO.roundTrip): the r15 fixed-path overwrite race class.
      GraftIO.roundTrip("warc_q177b") { out =>
        Tables.documents(s, dir).withColumn("rec", cleanRecord())
          .select(col("rec"))
          .write.mode("overwrite").text(out)
        warcParseBytes(graft.sources.WarcSource.readWarcRecordsBinary(s, out),
            "rec_no", "rec_bin")
          .withColumn("doc_id",
            regexp_extract(col("record_id"), "uuid:([0-9]+)", 1).cast("long"))
          .select(col("doc_id"), col("warc_version"), col("warc_type"),
            col("target_uri"), col("record_id"), col("content_length"),
            col("n_headers"), col("body_len"), col("n_chars"),
            col("body_md5"), col("body_is_utf8"), col("valid"))
          .orderBy(col("doc_id"))
      }
    },
    Some("""
      SELECT doc_id,
             '1.0' AS warc_version,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'response'
                  WHEN 1 THEN 'request' ELSE 'metadata' END AS warc_type,
             'http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
             '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
             CAST(strlen(text) AS BIGINT) AS content_length,
             CAST(5 AS BIGINT) AS n_headers,
             CAST(strlen(text) AS BIGINT) AS body_len,
             CAST(len(text) AS BIGINT) AS n_chars,
             md5(text) AS body_md5,
             TRUE AS body_is_utf8,
             TRUE AS valid
      FROM documents
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q195
  /** WARC record BUILDER — the sink side of this module (ISO 28500
    * writing, the Common Crawl WET shape: `conversion` records carry
    * extracted text): one codegen concat per record, Content-Length
    * framed as the body's UTF-8 OCTET count (§5.3 — a char count here
    * misframes every non-ASCII body once written to disk; ADVICE r16).
    * What [[warcParseBytes]] reads, this writes — q195 pins the full
    * write → file → frame → parse loop. */
  def warcRecord(wtype: Column, recordId: Column, date: Column,
      uri: Column, body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: "), wtype, lit(CRLF),
      lit("WARC-Record-ID: <urn:uuid:"), recordId, lit(">" + CRLF),
      lit("WARC-Date: "), date, lit(CRLF),
      lit("WARC-Target-URI: "), uri, lit(CRLF),
      lit("Content-Length: "), length(encode(body, "UTF-8")).cast("string"),
      lit(CRLF + CRLF),
      body, lit(CRLF + CRLF))

  /** The q195/q203 round-trip body: write `docs`' per-doc `conversion`
    * records as `.warc` part files (optionally gzip part members), read
    * back BYTE-TRUE, parse, re-key by the carried record id. */
  private def sinkRoundTrip(docs: DataFrame, prefix: String,
      gzip: Boolean): DataFrame = {
    val s = docs.sparkSession
    GraftIO.roundTrip(prefix) { out =>
      val w = docs
        .select(warcRecord(lit("conversion"),
          col("doc_id").cast("string"),
          lit("2026-02-02T00:00:00Z"),
          concat(lit("http://"), col("source"), lit(".example.com/doc/"),
            col("doc_id").cast("string")),
          col("text")).as("rec"))
        .write.mode("overwrite")
      (if (gzip) w.option("compression", "gzip") else w).text(out)
      warcParseBytes(graft.sources.WarcSource.readWarcRecordsBinary(s, out),
          "rec_no", "rec_bin")
        .withColumn("doc_id",
          regexp_extract(col("record_id"), "uuid:([0-9]+)", 1).cast("long"))
        .select(col("doc_id"), col("warc_type"), col("target_uri"),
          col("content_length"), col("body_len"), col("n_chars"),
          col("body_md5"), col("body_is_utf8"), col("valid"))
        .orderBy(col("doc_id"))
    }
  }

  private def sinkOracle(textExpr: String): String = s"""
      SELECT doc_id,
             'conversion' AS warc_type,
             'http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
             CAST(strlen($textExpr) AS BIGINT) AS content_length,
             CAST(strlen($textExpr) AS BIGINT) AS body_len,
             CAST(len($textExpr) AS BIGINT) AS n_chars,
             md5($textExpr) AS body_md5,
             TRUE AS body_is_utf8,
             TRUE AS valid
      FROM documents
      ORDER BY doc_id"""

  private val q195 = GraftQuery(
    "q195_warc_sink_roundtrip",
    // the WET-production shape: extracted text out as conversion
    // records, natural part files (framing parallelism is per FILE —
    // the q177b lesson), byte-true both ways — raw corpus text may
    // carry any UTF-8
    (s, dir) => sinkRoundTrip(Tables.documents(s, dir), "warc_q195",
      gzip = false),
    Some(sinkOracle("text")))

  // ---------------------------------------------------------------- q203
  // Byte-true framing under PLANTED multi-byte UTF-8 (VERDICT r15 next
  // #2): every body gains a decoration spanning the encoder widths —
  // 2-byte é, 3-byte U+4E2D, 4-byte U+1F600 — so content_length (bytes)
  // and n_chars (code points) must DIFFER by exactly 6 per row; a
  // char-framed writer, a char-sliced reader, or a codepoint-counted
  // length would each break a different column. q203b runs the same
  // loop through `.warc.gz` part members (the Common Crawl shipping
  // format) — gzip framing fidelity is its only added subject.
  private def decorated(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    Tables.documents(s, dir).withColumn("text",
      concat(col("text"), lit(" é中😀")))

  private val decoratedSql =
    "text || ' ' || chr(233) || chr(20013) || chr(128512)"

  private val q203 = GraftQuery(
    "q203_warc_utf8_roundtrip",
    (s, dir) => sinkRoundTrip(decorated(s, dir), "warc_q203", gzip = false),
    Some(sinkOracle(decoratedSql)))

  private val q203b = GraftQuery(
    "q203b_warc_gz_roundtrip",
    (s, dir) => sinkRoundTrip(decorated(s, dir), "warc_q203b", gzip = true),
    Some(sinkOracle(decoratedSql)))

  val all: Seq[GraftQuery] = Seq(q177, q177b, q195, q203, q203b)
}
