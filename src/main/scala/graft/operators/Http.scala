package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** HTTP/1.x response-message parsing — the layer INSIDE a WARC
  * `response` record's body (RFC 9112): a real crawl pipeline must
  * split status line / headers / payload, gate on status and media
  * type, and read the charset before any text stage trusts the bytes.
  * [[Warc.warcParse]] stops at WARC framing; this parses what it
  * emits, completing the ingest stack WARC → HTTP → HTML → text.
  *
  * Same discipline as [[Warc]] (q177): every field a codegen'd
  * `regexp_extract`/`substring_index`/`instr` column — zero UDFs, ONE
  * stateless scan projection, no shuffle; payload pinned as
  * (length, md5), never materialized in the parse result.
  *
  * Refusal semantics (never-throws, crawl-grade): a message whose
  * status line does not parse (`HTTP/<d>.<d> <3 digits>`) or that has
  * no blank-line separator is `valid = false`, with every field that
  * DID parse still emitted. `Content-Length` follows the [[Warc]]
  * rules (≤ 18 digit run, else NULL; payload truncates to what is
  * present) — but an ABSENT/unparseable length takes the WHOLE rest
  * as payload (RFC 9112 §6.3 close-delimited body), unlike WARC where
  * the length is mandatory. `content_type` is the media type
  * lowercased with parameters dropped; `charset` comes from the
  * Content-Type parameter (optionally quoted), lowercased.
  */
object Http {

  private val CRLF = "\r\n"

  private val VersionRe = "^HTTP/([0-9]\\.[0-9]) [0-9]{3}"
  private val StatusRe = "^HTTP/[0-9]\\.[0-9] ([0-9]{3})"
  private val ReasonRe = "^HTTP/[0-9]\\.[0-9] [0-9]{3}[ \\t]*([^\\r\\n]*)"
  private val CharsetRe = "(?i)charset=\"?([A-Za-z0-9._-]+)"

  private def nullIfEmpty(c: Column): Column =
    when(c === "", lit(null).cast("string")).otherwise(c)

  /** Shared parse columns: (version, status, reason, sep, hdr,
    * content_length, payload). */
  private def parsed(msg: Column): (Column, Column, Column, Column,
      Column, Column, Column) = {
    val version = nullIfEmpty(regexp_extract(msg, VersionRe, 1))
    val status = when(regexp_extract(msg, StatusRe, 1) =!= "",
      regexp_extract(msg, StatusRe, 1).cast("int"))
    val reason = nullIfEmpty(trim(regexp_extract(msg, ReasonRe, 1)))
    val sep = instr(msg, CRLF + CRLF)
    val hdr = substring_index(msg, CRLF + CRLF, 1)
    val clRaw = Warc.field(hdr, "Content-Length")
    val contentLength = when(clRaw.rlike("^[0-9]{1,18}$"), clRaw.cast("long"))
    val payloadRaw = when(sep >= 1, msg.substr(sep + lit(4), length(msg)))
    val payload = when(contentLength.isNotNull,
      payloadRaw.substr(lit(1),
        least(contentLength, length(payloadRaw).cast("long")).cast("int")))
      .otherwise(payloadRaw) // close-delimited: the rest IS the body
    (version, status, reason, sep, hdr, contentLength, payload)
  }

  /** Media type of a Content-Type value: before `;`, trimmed,
    * lowercased. NULL propagates. */
  private def mediaType(ctRaw: Column): Column =
    lower(trim(substring_index(ctRaw, ";", 1)))

  /** Parse one HTTP response message per row of `msgCol`; emits
    * `(idCol, http_version, status, reason, content_type, charset,
    * location, content_length, n_headers, payload_len, payload_md5,
    * valid)`. */
  def httpParse(msgs: DataFrame, idCol: String, msgCol: String): DataFrame = {
    val msg = col(msgCol)
    val (version, status, reason, sep, hdr, contentLength, payload) =
      parsed(msg)
    val ctRaw = Warc.field(hdr, "Content-Type")
    msgs.select(col(idCol),
      version.as("http_version"),
      status.as("status"),
      reason.as("reason"),
      mediaType(ctRaw).as("content_type"),
      nullIfEmpty(lower(regexp_extract(ctRaw, CharsetRe, 1))).as("charset"),
      Warc.field(hdr, "Location").as("location"),
      contentLength.as("content_length"),
      when(sep >= 1, (size(split(hdr, CRLF)) - 1).cast("long"))
        .as("n_headers"),
      length(payload).cast("long").as("payload_len"),
      md5(payload).as("payload_md5"),
      (version.isNotNull && status.isNotNull && sep >= 1).as("valid"))
  }

  /** The chain-ingest form (the [[Warc.warcBodies]] analog): VALID
    * messages passing the crawl gate — `status = 200` and media type
    * in `keepTypes` — with the payload TEXT itself, as
    * `(idCol, keep…, content_type, charset, payload)`. Same stateless
    * projection + filter; no shuffle. */
  def httpPayloads(msgs: DataFrame, idCol: String, msgCol: String,
      keep: Seq[String] = Nil,
      keepTypes: Seq[String] = Seq("text/html")): DataFrame = {
    val msg = col(msgCol)
    val (version, status, _, sep, hdr, _, payload) = parsed(msg)
    val ctRaw = Warc.field(hdr, "Content-Type")
    val kept = keep.map(col)
    msgs.select((col(idCol) +: kept) ++ Seq(
        mediaType(ctRaw).as("content_type"),
        nullIfEmpty(lower(regexp_extract(ctRaw, CharsetRe, 1)))
          .as("charset"),
        payload.as("payload"),
        (version.isNotNull && sep >= 1 && status === 200 &&
          mediaType(ctRaw).isin(keepTypes: _*)).as("__keep")): _*)
      .filter(col("__keep"))
      .select((col(idCol) +: kept) ++ Seq(col("content_type"),
        col("charset"), col("payload")): _*)
  }

  // ---------------------------------------------------------------- q188
  // In-plan-synthesized HTTP corpus (the q177 construction⊗parse
  // convention — the oracle rebuilds the same messages and REPLAYS the
  // parse in SQL, so a wrong build or a wrong parse both break the
  // hash): status rotation 200/404/301 (the 301 carrying a Location
  // and a QUOTED charset), a lowercase `content-type` variant
  // (case-insensitive field names), a missing Content-Length (%7 —
  // close-delimited body law), and two bail-outs — a 15-char
  // truncation (status line parses, no separator) and a junk prefix
  // (status anchor fails).
  private def httpMsg(): Column = {
    val m3 = pmod(col("doc_id"), lit(3))
    val statusLine = when(m3 === 0, lit("HTTP/1.1 200 OK"))
      .when(m3 === 1, lit("HTTP/1.1 404 Not Found"))
      .otherwise(lit("HTTP/1.0 301 Moved Permanently"))
    val ctName = when(pmod(col("doc_id"), lit(5)) === 0,
      lit("content-type")).otherwise(lit("Content-Type"))
    val ct = when(m3 === 0, lit("text/html; charset=UTF-8"))
      .when(m3 === 1, lit("text/plain"))
      .otherwise(lit("text/html; charset=\"iso-8859-1\""))
    val loc = when(m3 === 2,
      concat(lit("Location: http://"), col("source"),
        lit(".example.com/new/"), col("doc_id").cast("string"), lit(CRLF)))
      .otherwise(lit(""))
    val cl = when(pmod(col("doc_id"), lit(7)) === 0, lit(""))
      .otherwise(concat(lit("Content-Length: "),
        length(col("text")).cast("string"), lit(CRLF)))
    val full = concat(statusLine, lit(CRLF),
      lit("Date: Sat, 01 Aug 2026 00:00:00 GMT" + CRLF),
      ctName, lit(": "), ct, lit(CRLF),
      loc, cl, lit(CRLF), col("text"))
    when(pmod(col("doc_id"), lit(13)) === 0, substring(full, 1, 15))
      .when(pmod(col("doc_id"), lit(11)) === 0,
        concat(lit("junk" + CRLF), full))
      .otherwise(full)
  }

  private val q188 = GraftQuery(
    "q188_http_parse",
    (s, dir) => httpParse(
        Tables.documents(s, dir).withColumn("msg", httpMsg()),
        "doc_id", "msg")
      .orderBy(col("doc_id")),
    Some("""
      WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN substr(whole, 1, 15)
                    WHEN doc_id % 11 = 0 THEN 'junk' || chr(13) || chr(10) || whole
                    ELSE whole END AS msg
        FROM (SELECT doc_id,
                     (CASE CAST(doc_id % 3 AS INT)
                         WHEN 0 THEN 'HTTP/1.1 200 OK'
                         WHEN 1 THEN 'HTTP/1.1 404 Not Found'
                         ELSE 'HTTP/1.0 301 Moved Permanently' END) || chr(13) || chr(10) ||
                     'Date: Sat, 01 Aug 2026 00:00:00 GMT' || chr(13) || chr(10) ||
                     (CASE WHEN doc_id % 5 = 0 THEN 'content-type' ELSE 'Content-Type' END) || ': ' ||
                     (CASE CAST(doc_id % 3 AS INT)
                         WHEN 0 THEN 'text/html; charset=UTF-8'
                         WHEN 1 THEN 'text/plain'
                         ELSE 'text/html; charset="iso-8859-1"' END) || chr(13) || chr(10) ||
                     (CASE WHEN doc_id % 3 = 2 THEN 'Location: http://' || source || '.example.com/new/' || CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ELSE '' END) ||
                     (CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'Content-Length: ' || CAST(len(text) AS VARCHAR) || chr(13) || chr(10) END) ||
                     chr(13) || chr(10) || text AS whole
              FROM documents)),
      p AS (
        SELECT doc_id, msg,
               NULLIF(regexp_extract(msg, '^HTTP/([0-9]\.[0-9]) [0-9]{3}', 1), '') AS http_version,
               NULLIF(regexp_extract(msg, '^HTTP/[0-9]\.[0-9] ([0-9]{3})', 1), '') AS status_raw,
               NULLIF(trim(regexp_extract(msg, '^HTTP/[0-9]\.[0-9] [0-9]{3}[ \t]*([^\r\n]*)', 1)), '') AS reason,
               strpos(msg, chr(13)||chr(10)||chr(13)||chr(10)) AS sep,
               split_part(msg, chr(13)||chr(10)||chr(13)||chr(10), 1) AS hdr
        FROM raw),
      f AS (
        SELECT doc_id, msg, http_version, status_raw, reason, sep, hdr,
               NULLIF(regexp_extract(hdr, '(?mi)^Content-Type:[ \t]*([^\r\n]*)', 1), '') AS ct_raw,
               NULLIF(regexp_extract(hdr, '(?mi)^Location:[ \t]*([^\r\n]*)', 1), '') AS location,
               NULLIF(regexp_extract(hdr, '(?mi)^Content-Length:[ \t]*([^\r\n]*)', 1), '') AS cl_raw
        FROM p),
      g AS (
        SELECT doc_id, http_version, status_raw, reason, sep, hdr,
               ct_raw, location,
               CASE WHEN regexp_full_match(cl_raw, '[0-9]{1,18}')
                    THEN TRY_CAST(cl_raw AS BIGINT) END AS content_length,
               CASE WHEN sep >= 1 THEN substr(msg, sep + 4) END AS payload_raw
        FROM f),
      h AS (
        SELECT doc_id, http_version, status_raw, reason, sep, hdr,
               ct_raw, location, content_length,
               CASE WHEN content_length IS NOT NULL
                    THEN substr(payload_raw, 1, CAST(least(content_length, len(payload_raw)) AS INT))
                    ELSE payload_raw END AS payload
        FROM g)
      SELECT doc_id, http_version,
             CASE WHEN status_raw IS NOT NULL THEN CAST(status_raw AS INT) END AS status,
             reason,
             -- DuckDB split_part(NULL, …) returns '' (not NULL) — guard,
             -- or every absent Content-Type drifts from Spark's NULL
             CASE WHEN ct_raw IS NOT NULL
                  THEN lower(trim(split_part(ct_raw, ';', 1))) END AS content_type,
             NULLIF(lower(regexp_extract(ct_raw, '(?i)charset="?([A-Za-z0-9._-]+)', 1)), '') AS charset,
             location, content_length,
             CASE WHEN sep >= 1
                  THEN CAST(len(string_split(hdr, chr(13)||chr(10))) - 1 AS BIGINT) END AS n_headers,
             CAST(len(payload) AS BIGINT) AS payload_len,
             md5(payload) AS payload_md5,
             (http_version IS NOT NULL AND status_raw IS NOT NULL AND sep >= 1) AS valid
      FROM h
      ORDER BY doc_id"""))

  // --------------------------------------------------------------- q188b
  // The completed ingest stack as ONE operator: WARC framing →
  // [[Warc.warcBodies]] → HTTP parse + gate (200, text/html) →
  // [[Extraction.htmlText]] — the layer q93c's fixture skipped (its
  // WARC bodies were bare HTML; real crawl bodies are HTTP messages).
  // Fixture: WELL-FORMED WARC records (framing bail-outs are q177's
  // subject) whose bodies are HTTP responses wrapping the q93c HTML,
  // with a 404 rotation (%4=1) and a text/plain rotation (%5=2) that
  // the gate must drop. The oracle reconstructs the SURVIVOR set
  // arithmetically and replays the html→text cascade on the same
  // reconstructed HTML (the q93c discipline).
  private def chainRecord(): Column = {
    val html = Warc.crawlHtml()
    val statusLine = when(pmod(col("doc_id"), lit(4)) === 1,
      lit("HTTP/1.1 404 Not Found")).otherwise(lit("HTTP/1.1 200 OK"))
    val ct = when(pmod(col("doc_id"), lit(5)) === 2, lit("text/plain"))
      .otherwise(lit("text/html; charset=utf-8"))
    val msg = concat(statusLine, lit(CRLF),
      lit("Content-Type: "), ct, lit(CRLF),
      lit("Content-Length: "), length(html).cast("string"),
      lit(CRLF + CRLF), html)
    concat(lit("WARC/1.0" + CRLF),
      lit("WARC-Type: response" + CRLF),
      lit("WARC-Target-URI: http://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"), lit(CRLF),
      lit("Content-Length: "), length(msg).cast("string"),
      lit(CRLF + CRLF), msg, lit(CRLF + CRLF))
  }

  private val q188b = GraftQuery(
    "q188b_http_chain",
    (s, dir) => {
      val records = Tables.documents(s, dir).withColumn("rec", chainRecord())
      val bodies = Warc.warcBodies(records, "doc_id", "rec")
      val pages = httpPayloads(bodies, "doc_id", "body",
        keep = Seq("target_uri"))
      pages.select(col("doc_id"), col("target_uri"), col("charset"),
          Extraction.htmlText(col("payload")).as("__text"))
        .select(col("doc_id"), col("target_uri"), col("charset"),
          length(col("__text")).cast("long").as("n_text"),
          md5(col("__text")).as("text_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH surv AS (
        SELECT doc_id, source, ${Warc.crawlHtmlSql} AS html
        FROM documents
        WHERE doc_id % 4 <> 1 AND doc_id % 5 <> 2),
      ${Extraction.htmlTextSql("surv", "html", "xt", Seq("doc_id", "source"))}
      SELECT doc_id,
             'http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
             'utf-8' AS charset,
             CAST(len(__text) AS BIGINT) AS n_text,
             md5(__text) AS text_md5
      FROM xt
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q188, q188b)
}
