package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Page-level metadata extraction — the in-document signals a crawl
  * pipeline reads BEFORE trusting a page into the corpus (ABSENT in
  * the reference; §2.14 extension class): `<title>`, the description
  * meta tag, the robots meta tag (page-level `noindex`/`nofollow` —
  * the per-page complement of the host-level RFC 9309 gate in
  * [[Robots]]), and the `rel=canonical` link, plus canonical-cluster
  * dedup (the search-engine dedup signal: pages DECLARE their
  * duplicate group; fold them through [[UrlOps.canonicalizeUrl]] and
  * keep one representative).
  *
  * Extraction semantics (declared; both engines replay the same
  * regexes): attributes may come in either order (name-before-content
  * and content-before-name are both matched; name-first wins if both
  * somehow apply) and the NAME side accepts either quote style; the
  * VALUE side is double-quoted (the fixture convention — single-quoted
  * values are a documented non-goal, as mixing both quote classes in
  * one RE2 capture is not expressible without alternation blowup).
  * Title is the first `<title>` element's direct text (`[^<]*` — a
  * title containing markup stops at the first tag), whitespace
  * collapsed, trimmed, NULL when absent/empty. Robots directives are
  * matched as word-bounded tokens of the lowercased value.
  *
  * Scale: ONE stateless scan projection per document — zero UDFs, no
  * shuffle, embarrassingly parallel. The canonical dedup is one
  * hash-agg on the canonicalized effective URL (the q167 class).
  */
object PageMeta {

  // direct text up to the FIRST following tag (not necessarily
  // </title> — a markup-bearing title yields its leading text; an
  // unclosed <title> at end-of-document yields NULL: some tag must
  // follow)
  private val TitleRe = "(?is)<title\\b[^>]*>([^<]*)<"

  private def nameFirst(tag: String, name: String, valueAttr: String) =
    s"""(?is)<$tag\\b[^>]*\\bname\\s*=\\s*["']$name["'][^>]*\\b$valueAttr\\s*=\\s*"([^"]*)""""
  private def valueFirst(tag: String, name: String, valueAttr: String) =
    s"""(?is)<$tag\\b[^>]*\\b$valueAttr\\s*=\\s*"([^"]*)"[^>]*\\bname\\s*=\\s*["']$name["']"""
  private val CanonRelFirst =
    """(?is)<link\b[^>]*\brel\s*=\s*["']canonical["'][^>]*\bhref\s*=\s*"([^"]*)""""
  private val CanonHrefFirst =
    """(?is)<link\b[^>]*\bhref\s*=\s*"([^"]*)"[^>]*\brel\s*=\s*["']canonical["']"""

  private def firstNonEmpty(a: Column, b: Column): Column =
    when(a =!= "", a).otherwise(when(b =!= "", b))

  private def metaContent(html: Column, name: String): Column =
    firstNonEmpty(
      regexp_extract(html, nameFirst("meta", name, "content"), 1),
      regexp_extract(html, valueFirst("meta", name, "content"), 1))

  /** One row per document:
    * `(idCol, keep…, title, meta_description, meta_robots, noindex,
    * nofollow, canonical)`. */
  def pageMeta(docs: DataFrame, idCol: String, htmlCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val html = col(htmlCol)
    val robots = lower(metaContent(html, "robots"))
    def flag(token: String): Column =
      robots.isNotNull && robots.rlike("\\b" + token + "\\b")
    docs.select((col(idCol) +: keep.map(col)) ++ Seq(
      when(trim(regexp_replace(
          regexp_extract(html, TitleRe, 1), "\\s+", " ")) =!= "",
        trim(regexp_replace(regexp_extract(html, TitleRe, 1), "\\s+", " ")))
        .as("title"),
      metaContent(html, "description").as("meta_description"),
      robots.as("meta_robots"),
      flag("noindex").as("noindex"),
      flag("nofollow").as("nofollow"),
      firstNonEmpty(
        regexp_extract(html, CanonRelFirst, 1),
        regexp_extract(html, CanonHrefFirst, 1)).as("canonical")): _*)
  }

  /** Canonical-cluster dedup: effective URL = declared canonical,
    * falling back to the page's own URL; canonicalized through
    * [[UrlOps.canonicalizeUrl]]; one representative (min id) and the
    * member count per cluster. One hash-agg — the q167 class. */
  def canonicalDedup(docs: DataFrame, idCol: String, urlCol: String,
      canonicalCol: String): DataFrame =
    docs
      .withColumn("canonical_url", UrlOps.canonicalizeUrl(
        coalesce(col(canonicalCol), col(urlCol))))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("rep_doc_id"),
        count(lit(1)).as("n_members"))

  // ------------------------------------------------------- fixture HTML
  // Deterministic head-metadata wrapping of the documents fixture:
  // attr-order rotation (%3: name-first / content-first / absent),
  // quote-style rotation on the rel/name side, a missing title (%11),
  // robots rotation (%4: "NOINDEX, nofollow" / "index, follow" /
  // absent / content-first "nofollow"), and canonical targets on ONE
  // hub host with case/www/port variants that must FOLD under
  // canonicalization (https://WWW.Hub.Example.COM/c/k ≡
  // HTTPS://hub.example.com:443/c/k), clustering by doc_id div 7.
  private def metaHtml(): Column = {
    val id = col("doc_id").cast("string")
    val g = expr("doc_id div 7").cast("string")
    val m3 = pmod(col("doc_id"), lit(3))
    val m4 = pmod(col("doc_id"), lit(4))
    val title = when(pmod(col("doc_id"), lit(11)) === 0, lit(""))
      .otherwise(concat(lit("<title> Doc  "), id, lit(" · "),
        col("source"), lit(" </title>")))
    val descCanon = when(m3 === 0, concat(
        lit("<meta name=\"description\" content=\"Summary "), id,
        lit(" alpha\"><link rel=\"canonical\" href=\"https://WWW.Hub.Example.COM/c/"),
        g, lit("\">")))
      .when(m3 === 1, concat(
        lit("<meta content=\"Summary "), id,
        lit(" beta\" name='description'><link href=\"HTTPS://hub.example.com:443/c/"),
        g, lit("\" rel='canonical'>")))
      .otherwise(lit(""))
    val robots = when(m4 === 0,
        lit("<meta name=\"robots\" content=\"NOINDEX, nofollow\">"))
      .when(m4 === 1, lit("<meta name=\"robots\" content=\"index, follow\">"))
      .when(m4 === 3, lit("<meta content=\"nofollow\" name=\"robots\">"))
      .otherwise(lit(""))
    concat(lit("<html><head>"), title, descCanon, robots,
      lit("</head><body><p>"), col("text"), lit("</p></body></html>"))
  }

  private val metaHtmlSql = """
      '<html><head>' ||
      (CASE WHEN doc_id % 11 = 0 THEN '' ELSE '<title> Doc  ' || CAST(doc_id AS VARCHAR) || ' · ' || source || ' </title>' END) ||
      (CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN '<meta name="description" content="Summary ' || CAST(doc_id AS VARCHAR) || ' alpha"><link rel="canonical" href="https://WWW.Hub.Example.COM/c/' || CAST(doc_id // 7 AS VARCHAR) || '">'
          WHEN 1 THEN '<meta content="Summary ' || CAST(doc_id AS VARCHAR) || ' beta" name=''description''><link href="HTTPS://hub.example.com:443/c/' || CAST(doc_id // 7 AS VARCHAR) || '" rel=''canonical''>'
          ELSE '' END) ||
      (CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN '<meta name="robots" content="NOINDEX, nofollow">'
          WHEN 1 THEN '<meta name="robots" content="index, follow">'
          WHEN 3 THEN '<meta content="nofollow" name="robots">'
          ELSE '' END) ||
      '</head><body><p>' || text || '</p></body></html>'"""

  /** The extraction replayed as DuckDB CTEs ending in `m` with
    * `(doc_id, own_url, title, meta_description, meta_robots, noindex,
    * nofollow, canonical)` — shared by both oracles. */
  private val metaCtes = s"""
      hdocs AS (SELECT doc_id, source, $metaHtmlSql AS html,
                       'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS own_url
                FROM documents),
      mr AS (SELECT doc_id, own_url, html,
              NULLIF(trim(regexp_replace(regexp_extract(html, '(?is)<title\\b[^>]*>([^<]*)<', 1), '\\s+', ' ', 'g')), '') AS title,
              NULLIF(COALESCE(
                NULLIF(regexp_extract(html, '(?is)<meta\\b[^>]*\\bname\\s*=\\s*["'']description["''][^>]*\\bcontent\\s*=\\s*"([^"]*)"', 1), ''),
                regexp_extract(html, '(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*"([^"]*)"[^>]*\\bname\\s*=\\s*["'']description["'']', 1)), '') AS meta_description,
              NULLIF(lower(COALESCE(
                NULLIF(regexp_extract(html, '(?is)<meta\\b[^>]*\\bname\\s*=\\s*["'']robots["''][^>]*\\bcontent\\s*=\\s*"([^"]*)"', 1), ''),
                regexp_extract(html, '(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*"([^"]*)"[^>]*\\bname\\s*=\\s*["'']robots["'']', 1))), '') AS meta_robots,
              NULLIF(COALESCE(
                NULLIF(regexp_extract(html, '(?is)<link\\b[^>]*\\brel\\s*=\\s*["'']canonical["''][^>]*\\bhref\\s*=\\s*"([^"]*)"', 1), ''),
                regexp_extract(html, '(?is)<link\\b[^>]*\\bhref\\s*=\\s*"([^"]*)"[^>]*\\brel\\s*=\\s*["'']canonical["'']', 1)), '') AS canonical
             FROM hdocs),
      m AS (SELECT doc_id, own_url, title, meta_description, meta_robots,
              (meta_robots IS NOT NULL AND regexp_matches(meta_robots, '\\bnoindex\\b')) AS noindex,
              (meta_robots IS NOT NULL AND regexp_matches(meta_robots, '\\bnofollow\\b')) AS nofollow,
              canonical
             FROM mr)"""

  // ---------------------------------------------------------------- q189
  private val q189 = GraftQuery(
    "q189_page_meta",
    (s, dir) => pageMeta(
        Tables.documents(s, dir).withColumn("html", metaHtml()),
        "doc_id", "html")
      .orderBy(col("doc_id")),
    Some(s"""
      WITH $metaCtes
      SELECT doc_id, title, meta_description, meta_robots,
             noindex, nofollow, canonical
      FROM m
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q190
  // Canonical-cluster dedup composed end to end: extract → drop noindex
  // pages → effective URL (declared canonical, else own) →
  // canonicalize → one representative per cluster. The hub-host
  // case/www/port variants MUST fold (they do — via the same
  // [[UrlOps.canonicalizeSqlFrom]] replay q167 pins).
  private val q190 = GraftQuery(
    "q190_canonical_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("html", metaHtml())
        .withColumn("own_url", concat(lit("https://"), col("source"),
          lit(".example.com/p/"), col("doc_id").cast("string")))
      val meta = pageMeta(docs, "doc_id", "html", keep = Seq("own_url"))
      canonicalDedup(meta.filter(!col("noindex")),
          "doc_id", "own_url", "canonical")
        .select(col("canonical_url"), col("rep_doc_id"), col("n_members"))
        .orderBy(col("canonical_url"))
    },
    Some(s"""
      WITH $metaCtes,
      u AS (SELECT doc_id, COALESCE(canonical, own_url) AS url
            FROM m WHERE NOT noindex),
      ${UrlOps.canonicalizeSqlFrom("u", Seq("doc_id"))}
      SELECT canonical_url,
             CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM canon
      WHERE canonical_url IS NOT NULL
      GROUP BY canonical_url
      ORDER BY canonical_url"""))

  val all: Seq[GraftQuery] = Seq(q189, q190)
}
