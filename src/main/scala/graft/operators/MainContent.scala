package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Main-content extraction — text-density block selection (the
  * trafilatura/boilerpipe heuristic class): [[Extraction.htmlText]]
  * strips markup but keeps EVERY block's text, so navigation, cookie
  * banners and footers ride into the corpus as high-frequency
  * boilerplate; this operator keeps only blocks whose visible-text
  * density clears a threshold — the step between tag-stripping and
  * paragraph-dedup in a real crawl pipeline.
  *
  * Declared semantics: after script/style removal, a BLOCK is a span
  * between block-level CLOSE tags (`</p> </div> </section> </article>
  * </li> </h1..6> </td> </blockquote>` — a regex approximation of the
  * DOM block model, exact on well-formed pages, documented-degraded on
  * tag soup); a block is KEPT iff its tag-stripped collapsed text is
  * at least `minChars` AND `text_len · 100 ≥ minDensityPct · raw_len`
  * (one integer comparison). The result is the kept blocks' text
  * joined by single spaces, pinned as (counts, len, md5).
  *
  * Scale: the ENTIRE pipeline is higher-order array functions inside
  * ONE stateless projection — split → transform → filter →
  * array_join; no explode, no shuffle, no UDFs; per-row cost linear in
  * document size.
  */
object MainContent {

  private[graft] val BlockCloseRe =
    "(?is)</(p|div|section|article|li|h[1-6]|td|blockquote)>"

  /** Script/style kill — the pre-blocking step, as a Column. */
  private[graft] def stripScriptStyle(html: Column): Column =
    regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>", " ")

  /** The kept-blocks pipeline as a Spark SQL expression string over a
    * script-stripped column named `nsCol` — RETAINED as the reference
    * composition for [[graft.functions.MainContentExtract]]'s
    * bit-equality spec (MainContentExtractSpec), no longer on any query's hot
    * path: both consumers (mainContent here, the q93d chain ingest) now
    * ride the native one-pass expression (optimization r19, guide §1.2 —
    * the HOF lambdas are CodegenFallback and owned the fused ingest
    * scan's per-row CPU). */
  private[graft] def keptExpr(nsCol: String, minChars: Int,
      minDensityPct: Int): String =
    s"""filter(
       |  transform(split($nsCol, '$BlockCloseRe'),
       |    b -> named_struct(
       |      't', trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' '), '\\\\s+', ' ')),
       |      'raw', length(b))),
       |  x -> length(x.t) >= $minChars
       |       AND length(x.t) * 100 >= $minDensityPct * x.raw)""".stripMargin

  /** Selected main text as a Column (blocks joined by single spaces;
    * '' when nothing survives) — reference composition over a
    * pre-stripped `nsCol`, spec-only (see [[keptExpr]]). */
  private[graft] def mainTextCol(nsCol: String, minChars: Int,
      minDensityPct: Int): Column =
    expr(s"array_join(transform(${keptExpr(nsCol, minChars, minDensityPct)}, x -> x.t), ' ')")

  /** Selected main text straight from RAW html (script strip included)
    * via the native one-pass expression — the q93d chain-ingest hot
    * path. */
  private[operators] def mainTextNative(html: Column, minChars: Int,
      minDensityPct: Int): Column =
    graft.functions.MainContentExtract(html, minChars, minDensityPct)
      .getField("text")

  /** `(idCol, n_blocks, n_kept, n_chars, text_md5)` per document. */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 30, minDensityPct: Int = 50): DataFrame = {
    require(minChars >= 0 && minDensityPct >= 0 && minDensityPct <= 100,
      s"bad thresholds: $minChars, $minDensityPct")
    // optimization r19 (guide §1.2 per-task work): the whole
    // strip→split→select pipeline is ONE native codegen'd traversal
    // (MainContentExtract); the four field reads below share the single
    // evaluation through codegen subexpression elimination (the
    // expression is deterministic and codegen-capable, unlike the
    // CodegenFallback HOF lambdas it replaces). Bit-equality to the
    // retained keptExpr/mainTextCol composition is pinned by
    // MainContentSpec.
    docs.select(col(idCol),
        graft.functions.MainContentExtract(col(htmlCol), minChars,
          minDensityPct).as("__mc"))
      .select(col(idCol),
        col("__mc").getField("n_blocks").cast("long").as("n_blocks"),
        col("__mc").getField("n_kept").cast("long").as("n_kept"),
        length(col("__mc").getField("text")).cast("long").as("n_chars"),
        md5(col("__mc").getField("text")).as("text_md5"))
  }

  /** The same selection as a DuckDB scalar expression over `htmlExpr`
    * (raw html — script strip included), yielding the main TEXT. */
  private[operators] def mainTextSqlExpr(htmlExpr: String, minChars: Int,
      minDensityPct: Int): String =
    s"""COALESCE(array_to_string(list_transform(list_filter(list_transform(
       string_split_regex(regexp_replace($htmlExpr, '(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>', ' ', 'g'),
         '(?is)</(p|div|section|article|li|h[1-6]|td|blockquote)>'),
       b -> struct_pack(t := trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
                        raw := len(b))),
       x -> len(x.t) >= $minChars AND len(x.t) * 100 >= $minDensityPct * x.raw), x -> x.t), ' '), '')"""

  // ------------------------------------------------------- fixture HTML
  // A realistic boilerplate sandwich: link-dense nav (low density),
  // cookie banner (short), the ARTICLE (the document text, high
  // density), a promo sidebar on evens (link-dense), a footer (short),
  // and a script that must die before blocking. The article is the
  // only block that clears BOTH gates for typical document lengths.
  private def pageHtml(): Column = concat(
    lit("<html><head><script>track('"),
    col("doc_id").cast("string"),
    lit("');</script></head><body>\n<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></div>\n" +
      "<div class=\"cookie\">We use cookies.</div>\n<article><p>"),
    col("text"),
    lit("</p></article>\n"),
    when(pmod(col("doc_id"), lit(2)) === 0,
      lit("<div class=\"promo\"><a href=\"/buy\">Buy now!</a> <a href=\"/deal\">Deals</a></div>\n"))
      .otherwise(lit("")),
    lit("<div class=\"footer\">© 2026 Example Corp</div>\n</body></html>"))

  private val pageHtmlSql = """
      '<html><head><script>track(''' || CAST(doc_id AS VARCHAR) || ''');</script></head><body>' || chr(10) ||
      '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>' || chr(10) ||
      '<div class="cookie">We use cookies.</div>' || chr(10) || '<article><p>' ||
      text ||
      '</p></article>' || chr(10) ||
      (CASE WHEN doc_id % 2 = 0 THEN '<div class="promo"><a href="/buy">Buy now!</a> <a href="/deal">Deals</a></div>' || chr(10) ELSE '' END) ||
      '<div class="footer">© 2026 Example Corp</div>' || chr(10) || '</body></html>'"""

  private val q197 = GraftQuery(
    "q197_main_content",
    (s, dir) => mainContent(
        Tables.documents(s, dir).withColumn("html", pageHtml()),
        "doc_id", "html")
      .orderBy(col("doc_id")),
    Some(s"""
      WITH raw AS (SELECT doc_id, $pageHtmlSql AS html FROM documents),
      ns AS (SELECT doc_id,
               regexp_replace(html, '(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>', ' ', 'g') AS h
             FROM raw),
      bl AS (SELECT doc_id,
               string_split_regex(h, '(?is)</(p|div|section|article|li|h[1-6]|td|blockquote)>') AS blocks
             FROM ns),
      kp AS (SELECT doc_id, blocks,
               list_filter(
                 list_transform(blocks,
                   b -> struct_pack(t := trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
                                    raw := len(b))),
                 x -> len(x.t) >= 30 AND len(x.t) * 100 >= 50 * x.raw) AS kept
             FROM bl),
      mn AS (SELECT doc_id,
               CAST(len(blocks) AS BIGINT) AS n_blocks,
               CAST(len(kept) AS BIGINT) AS n_kept,
               COALESCE(array_to_string(list_transform(kept, x -> x.t), ' '), '') AS main
             FROM kp)
      SELECT doc_id, n_blocks, n_kept,
             CAST(len(main) AS BIGINT) AS n_chars,
             md5(main) AS text_md5
      FROM mn
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q197)
}
