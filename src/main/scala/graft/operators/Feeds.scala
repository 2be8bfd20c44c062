package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** RSS 2.0 / Atom feed parsing — the third discovery channel next to
  * sitemaps (q193) and links (q184): feeds carry fresh-content URLs
  * with publication times, the recrawl scheduler's highest-signal
  * input.
  *
  * Semantics (declared): a document is ATOM iff `<feed` appears as a
  * tag, else RSS; entries are `<entry>…</entry>` / `<item>…</item>`
  * (lazy form — feeds are machine-generated, the q193 stance). Per
  * entry: `title` (direct inner text), `link` (Atom `href` attribute
  * form first, RSS inner-text form as fallback), `ts_raw` (RSS
  * `pubDate` else Atom `updated`), `pub_date` as a calendar-validated
  * DATE from EITHER form — ISO-8601 via the q193 try-path, RFC 822
  * (`[Day, ]DD Mon YYYY …`) via month-name mapping into the same
  * try-path (no locale-dependent parser in either engine); `guid`
  * (RSS `guid` else Atom `id`). Entries without a link are DROPPED
  * (a feed row without a URL schedules nothing); `entry_no` keeps
  * holes, the q184 convention.
  *
  * Scale: ONE stateless scan + a bounded per-doc explode — zero UDFs,
  * no shuffle.
  */
object Feeds {

  private val AtomRe = "(?is)<feed[\\s>]"
  private val EntryRe = "(?is)<entry\\b[^>]*>.*?</entry>"
  private val ItemRe = "(?is)<item\\b[^>]*>.*?</item>"
  private val HrefLinkRe = "(?is)<link\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\""
  private val Rfc822Re =
    "(?i)\\b([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4})\\b"
  private val IsoRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}"

  private def inner(entry: Column, tag: String): Column =
    Extraction.tagText(entry, tag)

  private def firstNonEmpty(a: Column, b: Column): Column =
    when(a.isNotNull && a =!= "", a).otherwise(when(b.isNotNull, b))

  /** Month-name → zero-padded number, the 12-branch CASE both engines
    * replay (no locale parser). */
  private def monthNum(m: Column): Column = {
    val names = Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    names.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (n, i)) =>
        when(lower(m) === n, lit(f"${i + 1}%02d")).otherwise(acc)
    }
  }

  /** Calendar-validated DATE from an ISO-8601 or RFC 822 raw value. */
  private def feedDate(raw: Column): Column = {
    val isoDay = substring(raw, 1, 10)
    val d822 = regexp_extract(raw, Rfc822Re, 1)
    val m822 = monthNum(regexp_extract(raw, Rfc822Re, 2))
    val y822 = regexp_extract(raw, Rfc822Re, 3)
    val iso822 = concat(y822, lit("-"), m822, lit("-"), lpad(d822, 2, "0"))
    when(isoDay.rlike(IsoRe),
      try_to_timestamp(isoDay, lit("yyyy-MM-dd")).cast("date"))
      .when(d822 =!= "",
        try_to_timestamp(iso822, lit("yyyy-MM-dd")).cast("date"))
  }

  /** One row per kept entry: `(idCol, entry_no, kind, title, link,
    * ts_raw, pub_date, guid)`. */
  def feedEntries(docs: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    val xml = col(xmlCol)
    val isAtom = xml.rlike(AtomRe)
    val entries = when(isAtom,
      regexp_extract_all(xml, lit(EntryRe), lit(0)))
      .otherwise(regexp_extract_all(xml, lit(ItemRe), lit(0)))
    val e = docs.select(col(idCol),
      when(isAtom, lit("atom")).otherwise(lit("rss")).as("kind"),
      posexplode(entries).as(Seq("entry_no", "entry")))
    val href = regexp_extract(col("entry"), HrefLinkRe, 1)
    val tsRaw = firstNonEmpty(inner(col("entry"), "pubDate"),
      inner(col("entry"), "updated"))
    e.select(col(idCol), col("entry_no").cast("int").as("entry_no"),
        col("kind"),
        inner(col("entry"), "title").as("title"),
        firstNonEmpty(href, inner(col("entry"), "link")).as("link"),
        tsRaw.as("ts_raw"),
        feedDate(tsRaw).as("pub_date"),
        firstNonEmpty(inner(col("entry"), "guid"),
          inner(col("entry"), "id")).as("guid"))
      .filter(col("link").isNotNull)
  }

  // ------------------------------------------------------- fixture XML
  // Even docs are RSS (RFC 822 pubDate with weekday prefix, a guid, a
  // link-less item that must drop, a second item), odd docs are Atom
  // (href-attribute links, ISO updated, an id, a title-less second
  // entry).
  private def feedXml(): Column = {
    val id = col("doc_id").cast("string")
    val day = lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0")
    when(pmod(col("doc_id"), lit(2)) === 0, concat(
      lit("<rss version=\"2.0\"><channel><title>chan</title>\n<item><title>Post "),
      id, lit("</title><link>https://"), col("source"),
      lit(".example.com/post/"), id, lit("</link><pubDate>Sat, "),
      day, lit(" Mar 2026 10:00:00 GMT</pubDate><guid>tag:"), id,
      lit("</guid></item>\n<item><title>orphan</title></item>\n<item><title>Alt</title><link>https://"),
      col("source"), lit(".example.com/alt/"), id,
      lit("</link></item>\n</channel></rss>")))
      .otherwise(concat(
        lit("<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>feed</title>\n<entry><title>Entry "),
        id, lit("</title><link href=\"https://"), col("source"),
        lit(".example.com/e/"), id, lit("\"/><updated>2026-02-"), day,
        lit("T03:04:05Z</updated><id>urn:"), id,
        lit("</id></entry>\n<entry><link href=\"https://"), col("source"),
        lit(".example.com/e2/"), id, lit("\"/></entry>\n</feed>")))
  }

  private val feedXmlSql = """
      CASE WHEN doc_id % 2 = 0 THEN
        '<rss version="2.0"><channel><title>chan</title>' || chr(10) ||
        '<item><title>Post ' || CAST(doc_id AS VARCHAR) || '</title><link>https://' || source || '.example.com/post/' || CAST(doc_id AS VARCHAR) || '</link><pubDate>Sat, ' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || ' Mar 2026 10:00:00 GMT</pubDate><guid>tag:' || CAST(doc_id AS VARCHAR) || '</guid></item>' || chr(10) ||
        '<item><title>orphan</title></item>' || chr(10) ||
        '<item><title>Alt</title><link>https://' || source || '.example.com/alt/' || CAST(doc_id AS VARCHAR) || '</link></item>' || chr(10) || '</channel></rss>'
      ELSE
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>feed</title>' || chr(10) ||
        '<entry><title>Entry ' || CAST(doc_id AS VARCHAR) || '</title><link href="https://' || source || '.example.com/e/' || CAST(doc_id AS VARCHAR) || '"/><updated>2026-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T03:04:05Z</updated><id>urn:' || CAST(doc_id AS VARCHAR) || '</id></entry>' || chr(10) ||
        '<entry><link href="https://' || source || '.example.com/e2/' || CAST(doc_id AS VARCHAR) || '"/></entry>' || chr(10) || '</feed>'
      END"""

  private val monthCaseSql = """
      CASE lower(regexp_extract(ts_raw, '(?i)\b([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4})\b', 2))
        WHEN 'jan' THEN '01' WHEN 'feb' THEN '02' WHEN 'mar' THEN '03'
        WHEN 'apr' THEN '04' WHEN 'may' THEN '05' WHEN 'jun' THEN '06'
        WHEN 'jul' THEN '07' WHEN 'aug' THEN '08' WHEN 'sep' THEN '09'
        WHEN 'oct' THEN '10' WHEN 'nov' THEN '11' WHEN 'dec' THEN '12'
        ELSE NULL END"""

  private val q198 = GraftQuery(
    "q198_feed_parse",
    (s, dir) => feedEntries(
        Tables.documents(s, dir).withColumn("xml", feedXml()),
        "doc_id", "xml")
      .orderBy(col("doc_id"), col("entry_no")),
    Some(s"""
      WITH raw AS (SELECT doc_id, $feedXmlSql AS xml FROM documents),
      ex AS (SELECT doc_id,
               CASE WHEN regexp_matches(xml, '(?is)<feed[\\s>]') THEN 'atom' ELSE 'rss' END AS kind,
               CASE WHEN regexp_matches(xml, '(?is)<feed[\\s>]')
                    THEN regexp_extract_all(xml, '(?is)<entry\\b[^>]*>.*?</entry>', 0)
                    ELSE regexp_extract_all(xml, '(?is)<item\\b[^>]*>.*?</item>', 0) END AS entries
             FROM raw),
      ee AS (SELECT doc_id, kind,
               CAST(generate_subscripts(entries, 1) - 1 AS INT) AS entry_no,
               unnest(entries) AS entry
             FROM ex),
      fx AS (SELECT doc_id, entry_no, kind,
               NULLIF(trim(regexp_extract(entry, '(?is)<title\\b[^>]*>([^<]*)</title>', 1)), '') AS title,
               COALESCE(
                 NULLIF(regexp_extract(entry, '(?is)<link\\b[^>]*\\bhref\\s*=\\s*"([^"]*)"', 1), ''),
                 NULLIF(trim(regexp_extract(entry, '(?is)<link\\b[^>]*>([^<]*)</link>', 1)), '')) AS link,
               COALESCE(
                 NULLIF(trim(regexp_extract(entry, '(?is)<pubDate\\b[^>]*>([^<]*)</pubDate>', 1)), ''),
                 NULLIF(trim(regexp_extract(entry, '(?is)<updated\\b[^>]*>([^<]*)</updated>', 1)), '')) AS ts_raw,
               COALESCE(
                 NULLIF(trim(regexp_extract(entry, '(?is)<guid\\b[^>]*>([^<]*)</guid>', 1)), ''),
                 NULLIF(trim(regexp_extract(entry, '(?is)<id\\b[^>]*>([^<]*)</id>', 1)), '')) AS guid
             FROM ee)
      SELECT doc_id, entry_no, kind, title, link, ts_raw,
             CASE WHEN regexp_matches(substr(ts_raw, 1, 10), '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
                  THEN TRY_CAST(substr(ts_raw, 1, 10) AS DATE)
                  WHEN regexp_extract(ts_raw, '(?i)\\b([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4})\\b', 1) <> ''
                  THEN TRY_CAST(
                    regexp_extract(ts_raw, '(?i)\\b([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4})\\b', 3)
                    || '-' || $monthCaseSql || '-' ||
                    lpad(regexp_extract(ts_raw, '(?i)\\b([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4})\\b', 1), 2, '0')
                    AS DATE)
             END AS pub_date,
             guid
      FROM fx
      WHERE link IS NOT NULL
      ORDER BY doc_id, entry_no"""))

  val all: Seq[GraftQuery] = Seq(q198)
}
