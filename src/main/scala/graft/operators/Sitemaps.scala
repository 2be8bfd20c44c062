package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Sitemap parsing (sitemaps.org XML: `<urlset>` files and
  * `<sitemapindex>` indexes) — where a polite crawl's frontier STARTS
  * (the push complement of [[LinkGraph]]'s discovered links; `loc`
  * rows seed [[LinkGraph.crawlFrontier]] candidates, `lastmod` drives
  * recrawl scheduling).
  *
  * Semantics (declared; machine-generated XML, so entry matching is
  * the lazy `<url>…</url>` / `<sitemap>…</sitemap>` form — sitemaps
  * are not hand-authored HTML, truncation just drops the tail entry):
  * a document is an INDEX iff `<sitemapindex` appears (then `<sitemap>`
  * entries parse, `kind = 'index'`), else `<url>` entries parse
  * (`kind = 'url'`). Per entry: `loc` (trimmed; entries without one
  * are DROPPED — a sitemap row without a URL is noise), `lastmod`
  * kept raw AND as a DATE (first 10 chars of the W3C datetime,
  * calendar-validated via try-semantics — ANSI-safe in both engines),
  * `changefreq` lowercased, `priority` as DOUBLE only for valid
  * [0,1] literals (the spec's range; junk like "high" refuses to
  * NULL). `entry_no` is the element offset among ALL extracted
  * entries (dropped entries leave holes, the q184 convention).
  *
  * Scale: ONE stateless scan + a per-doc explode bounded by entry
  * count — zero UDFs, no shuffle.
  */
object Sitemaps {

  private val UrlEntryRe = "(?is)<url>.*?</url>"
  private val SmEntryRe = "(?is)<sitemap>.*?</sitemap>"
  private val IndexRe = "(?is)<sitemapindex[\\s>]"
  private val PriorityRe = "^(0(\\.[0-9]+)?|1(\\.0+)?)$"
  private val DateShapeRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}"

  private def inner(entry: Column, tag: String): Column =
    Extraction.tagText(entry, tag)

  /** One row per kept entry: `(idCol, entry_no, kind, loc, lastmod_raw,
    * lastmod, changefreq, priority)`. */
  def sitemapEntries(docs: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    val xml = col(xmlCol)
    val isIndex = xml.rlike(IndexRe)
    val entries = when(isIndex,
      regexp_extract_all(xml, lit(SmEntryRe), lit(0)))
      .otherwise(regexp_extract_all(xml, lit(UrlEntryRe), lit(0)))
    val e = docs.select(col(idCol),
      when(isIndex, lit("index")).otherwise(lit("url")).as("kind"),
      posexplode(entries).as(Seq("entry_no", "entry")))
    val lastmodRaw = inner(col("entry"), "lastmod")
    val day = substring(lastmodRaw, 1, 10)
    val prio = inner(col("entry"), "priority")
    e.select(col(idCol), col("entry_no").cast("int").as("entry_no"),
        col("kind"),
        inner(col("entry"), "loc").as("loc"),
        lastmodRaw.as("lastmod_raw"),
        when(day.rlike(DateShapeRe),
          try_to_timestamp(day, lit("yyyy-MM-dd")).cast("date"))
          .as("lastmod"),
        lower(inner(col("entry"), "changefreq")).as("changefreq"),
        when(prio.rlike(PriorityRe), prio.cast("double")).as("priority"))
      .filter(col("loc").isNotNull)
  }

  // ------------------------------------------------------- fixture XML
  // Deterministic sitemap wrapping of the documents fixture: every
  // ninth document is an INDEX (two <sitemap> entries, one without
  // lastmod); the rest are urlsets with a full entry (date lastmod,
  // changefreq, priority 0.8), a variant entry (W3C datetime lastmod
  // on evens, junk priority "high" on %5 — must refuse to NULL),
  // a loc-less entry and an empty-loc entry (both DROPPED, leaving
  // entry_no holes).
  private def sitemapXml(): Column = {
    val id = col("doc_id").cast("string")
    val day = lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"),
      2, "0")
    val prio2 = when(pmod(col("doc_id"), lit(5)) === 0, lit("high"))
      .otherwise(lit("0.5"))
    val lastmod2 = when(pmod(col("doc_id"), lit(2)) === 0,
      lit("<lastmod>2025-12-31T23:59:59+00:00</lastmod>"))
      .otherwise(lit(""))
    when(pmod(col("doc_id"), lit(9)) === 0, concat(
      lit("<?xml version=\"1.0\"?>\n<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n<sitemap><loc> https://"),
      col("source"), lit(".example.com/sitemap1.xml </loc><lastmod>2026-01-"),
      day, lit("</lastmod></sitemap>\n<sitemap><loc>https://"),
      col("source"), lit(".example.com/sitemap2.xml</loc></sitemap>\n</sitemapindex>")))
      .otherwise(concat(
        lit("<?xml version=\"1.0\"?>\n<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n<url><loc>https://"),
        col("source"), lit(".example.com/p/"), id,
        lit("</loc><lastmod>2026-01-"), day,
        lit("</lastmod><changefreq>Daily</changefreq><priority>0.8</priority></url>\n<url><loc> https://"),
        col("source"), lit(".example.com/p/"), id, lit("b </loc>"),
        lastmod2, lit("<priority>"), prio2,
        lit("</priority></url>\n<url><changefreq>never</changefreq></url>\n<url><loc></loc></url>\n</urlset>")))
  }

  private val sitemapXmlSql = """
      CASE WHEN doc_id % 9 = 0 THEN
        '<?xml version="1.0"?>' || chr(10) || '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' || chr(10) ||
        '<sitemap><loc> https://' || source || '.example.com/sitemap1.xml </loc><lastmod>2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod></sitemap>' || chr(10) ||
        '<sitemap><loc>https://' || source || '.example.com/sitemap2.xml</loc></sitemap>' || chr(10) || '</sitemapindex>'
      ELSE
        '<?xml version="1.0"?>' || chr(10) || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' || chr(10) ||
        '<url><loc>https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) || '</loc><lastmod>2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod><changefreq>Daily</changefreq><priority>0.8</priority></url>' || chr(10) ||
        '<url><loc> https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) || 'b </loc>' ||
        (CASE WHEN doc_id % 2 = 0 THEN '<lastmod>2025-12-31T23:59:59+00:00</lastmod>' ELSE '' END) ||
        '<priority>' || (CASE WHEN doc_id % 5 = 0 THEN 'high' ELSE '0.5' END) || '</priority></url>' || chr(10) ||
        '<url><changefreq>never</changefreq></url>' || chr(10) || '<url><loc></loc></url>' || chr(10) || '</urlset>'
      END"""

  private val q193 = GraftQuery(
    "q193_sitemap_parse",
    (s, dir) => sitemapEntries(
        Tables.documents(s, dir).withColumn("xml", sitemapXml()),
        "doc_id", "xml")
      .orderBy(col("doc_id"), col("entry_no")),
    Some(s"""
      WITH raw AS (SELECT doc_id, $sitemapXmlSql AS xml FROM documents),
      ex AS (SELECT doc_id,
               CASE WHEN regexp_matches(xml, '(?is)<sitemapindex[\\s>]') THEN 'index' ELSE 'url' END AS kind,
               CASE WHEN regexp_matches(xml, '(?is)<sitemapindex[\\s>]')
                    THEN regexp_extract_all(xml, '(?is)<sitemap>.*?</sitemap>', 0)
                    ELSE regexp_extract_all(xml, '(?is)<url>.*?</url>', 0) END AS entries
             FROM raw),
      ee AS (SELECT doc_id, kind,
               CAST(generate_subscripts(entries, 1) - 1 AS INT) AS entry_no,
               unnest(entries) AS entry
             FROM ex),
      fx AS (SELECT doc_id, entry_no, kind,
               NULLIF(trim(regexp_extract(entry, '(?is)<loc\\b[^>]*>([^<]*)</loc>', 1)), '') AS loc,
               NULLIF(trim(regexp_extract(entry, '(?is)<lastmod\\b[^>]*>([^<]*)</lastmod>', 1)), '') AS lastmod_raw,
               NULLIF(lower(trim(regexp_extract(entry, '(?is)<changefreq\\b[^>]*>([^<]*)</changefreq>', 1))), '') AS changefreq,
               NULLIF(trim(regexp_extract(entry, '(?is)<priority\\b[^>]*>([^<]*)</priority>', 1)), '') AS prio
             FROM ee)
      SELECT doc_id, entry_no, kind, loc, lastmod_raw,
             CASE WHEN regexp_matches(substr(lastmod_raw, 1, 10), '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
                  THEN TRY_CAST(substr(lastmod_raw, 1, 10) AS DATE) END AS lastmod,
             changefreq,
             CASE WHEN regexp_matches(prio, '^(0(\\.[0-9]+)?|1(\\.0+)?)$$')
                  THEN CAST(prio AS DOUBLE) END AS priority
      FROM fx
      WHERE loc IS NOT NULL
      ORDER BY doc_id, entry_no"""))

  // ---------------------------------------------- sitemap-tree resolve
  /** Resolve a sitemap TREE into one seed table (VERDICT r15 next #8 —
    * q193 parses `<sitemapindex>` entries as rows; this joins them
    * back): `sitemaps` is the fetched sitemap corpus keyed by its own
    * URL; an index's `<sitemap>` entries resolve to other rows of the
    * same table, their urlset entries become seeds carrying
    * provenance `(root_url, depth, via_url, loc)` — depth 0 for a
    * urlset's own entries, 1 for entries reached through one index
    * hop, … up to `maxDepth` (the sitemaps.org sanity bound; deeper
    * chains are REFUSED — dropped, never followed — and unresolved
    * child URLs drop naturally at the join). The same resource
    * announced through several paths keeps one row per path (the q202
    * merge consumes provenance).
    *
    * Scale: one xml parse ([[sitemapEntries]], cached with an explicit
    * release — each depth hop re-reads ENTRIES, never re-parses the
    * corpus), then `maxDepth` self-joins keyed on the sitemap URL —
    * entries-sized SortMergeJoins, corpus never touched. */
  def resolveSitemapTree(sitemaps: DataFrame, urlCol: String,
      xmlCol: String, maxDepth: Int = 2): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 5, "1..5 index hops")
    // cache scope (ADVICE r16: the earlier localCheckpoint here had no
    // release path, so bench reps accumulated blocks for the session's
    // lifetime): entries are CACHED for the maxDepth self-joins, the
    // result is eagerly materialized once, and the entries cache is
    // dropped before returning — the only retained blocks are the
    // result's own (freed by the ContextCleaner when the caller drops
    // the frame)
    val e = sitemapEntries(
        sitemaps.withColumnRenamed(urlCol, "__sm_url"), "__sm_url", xmlCol)
      .select(col("__sm_url"), col("kind"), col("loc"))
      .persist()
    try {
      var out = e.filter(col("kind") === "url")
        .select(col("__sm_url").as("root_url"),
          lit(0).cast("int").as("depth"),
          col("__sm_url").as("via_url"), col("loc"))
      var frontier = e.filter(col("kind") === "index")
        .select(col("__sm_url").as("root_url"), col("loc").as("child_url"))
      for (d <- 1 to maxDepth) {
        val child = frontier.join(e,
          frontier("child_url") === e("__sm_url"))
        out = out.unionByName(child.filter(col("kind") === "url")
          .select(col("root_url"), lit(d).cast("int").as("depth"),
            col("child_url").as("via_url"), col("loc")))
        if (d < maxDepth)
          frontier = child.filter(col("kind") === "index")
            .select(col("root_url"), col("loc").as("child_url"))
      }
      out.localCheckpoint() // eager: the ONE read of the cached entries
    } finally e.unpersist(false)
  }

  // ---------------------------------------------------------------- q207
  // Fixture: every ninth document is an index pointing at doc id+1
  // (a urlset — depth-1 seeds) and doc id+9 (the NEXT index — whose
  // own id+10 child yields depth-2 seeds, and whose id+18 child sits
  // at depth 3, PAST the bound: dropped). Children past the corpus
  // end drop at the join. The oracle replays the hops as id-arithmetic
  // joins.
  private def treeXml(): Column = {
    val id = col("doc_id").cast("string")
    when(pmod(col("doc_id"), lit(9)) === 0, concat(
      lit("<?xml version=\"1.0\"?>\n<sitemapindex>" +
        "<sitemap><loc>https://sm.example.com/sm/"),
      (col("doc_id") + 1).cast("string"),
      lit(".xml</loc></sitemap>\n<sitemap><loc>https://sm.example.com/sm/"),
      (col("doc_id") + 9).cast("string"),
      lit(".xml</loc></sitemap></sitemapindex>")))
      .otherwise(concat(
        lit("<?xml version=\"1.0\"?>\n<urlset><url><loc>https://"),
        col("source"), lit(".example.com/p/"), id,
        lit("</loc></url>\n<url><loc>https://"),
        col("source"), lit(".example.com/p/"), id,
        lit("b</loc></url></urlset>")))
  }

  private val q207 = GraftQuery(
    "q207_sitemap_tree",
    (s, dir) => {
      val sitemaps = Tables.documents(s, dir).select(
        concat(lit("https://sm.example.com/sm/"),
          col("doc_id").cast("string"), lit(".xml")).as("url"),
        treeXml().as("xml"))
      resolveSitemapTree(sitemaps, "url", "xml", maxDepth = 2)
        .orderBy(col("root_url"), col("depth"), col("loc"))
    },
    Some("""
      WITH u AS (SELECT doc_id, source,
                   'https://sm.example.com/sm/' || CAST(doc_id AS VARCHAR) || '.xml' AS smu
                 FROM documents),
      locs AS (SELECT doc_id, smu,
                 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS loc1,
                 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) || 'b' AS loc2
               FROM u WHERE doc_id % 9 <> 0),
      seeds0 AS (SELECT smu AS root_url, 0 AS depth, smu AS via_url, loc1 AS loc FROM locs
                 UNION ALL
                 SELECT smu, 0, smu, loc2 FROM locs),
      idx AS (SELECT doc_id, smu FROM u WHERE doc_id % 9 = 0),
      seeds1 AS (SELECT i.smu AS root_url, 1 AS depth, c.smu AS via_url, c.loc1 AS loc
                 FROM idx i JOIN locs c ON c.doc_id = i.doc_id + 1
                 UNION ALL
                 SELECT i.smu, 1, c.smu, c.loc2
                 FROM idx i JOIN locs c ON c.doc_id = i.doc_id + 1),
      seeds2 AS (SELECT i.smu AS root_url, 2 AS depth, c.smu AS via_url, c.loc1 AS loc
                 FROM idx i JOIN idx j ON j.doc_id = i.doc_id + 9
                 JOIN locs c ON c.doc_id = j.doc_id + 1
                 UNION ALL
                 SELECT i.smu, 2, c.smu, c.loc2
                 FROM idx i JOIN idx j ON j.doc_id = i.doc_id + 9
                 JOIN locs c ON c.doc_id = j.doc_id + 1)
      SELECT root_url, CAST(depth AS INT) AS depth, via_url, loc
      FROM (SELECT * FROM seeds0 UNION ALL
            SELECT * FROM seeds1 UNION ALL
            SELECT * FROM seeds2)
      ORDER BY root_url, depth, loc"""))

  val all: Seq[GraftQuery] = Seq(q193, q207)
}
