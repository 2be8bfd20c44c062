package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sitemap-parse laws on hand-written XML (spec-truth, not the q193
  * builder). */
class SitemapsSpec extends SparkSpec {

  private def entries(xml: String) = {
    import spark.implicits._
    Sitemaps.sitemapEntries(Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
      .orderBy(col("entry_no")).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3),
        if (r.isNullAt(5)) null else r.getDate(5).toString,
        r.getString(6),
        if (r.isNullAt(7)) null else java.lang.Double.valueOf(r.getDouble(7))))
      .toList
  }

  test("urlset: fields parse, loc trimmed, loc-less entries dropped leaving holes") {
    val got = entries(
      "<urlset>" +
        "<url><loc> https://a.org/x </loc><lastmod>2026-03-05</lastmod>" +
        "<changefreq>WEEKLY</changefreq><priority>0.5</priority></url>" +
        "<url><changefreq>never</changefreq></url>" +
        "<url><loc>https://a.org/y</loc></url>" +
        "</urlset>")
    assert(got == List(
      (0, "url", "https://a.org/x", "2026-03-05", "weekly",
        java.lang.Double.valueOf(0.5)),
      (2, "url", "https://a.org/y", null, null, null)), got.toString)
  }

  test("index: <sitemap> entries parse with kind=index") {
    val got = entries(
      "<sitemapindex>" +
        "<sitemap><loc>https://a.org/s1.xml</loc>" +
        "<lastmod>2026-01-02T10:00:00Z</lastmod></sitemap>" +
        "</sitemapindex>")
    assert(got == List((0, "index", "https://a.org/s1.xml", "2026-01-02",
      null, null)), got.toString)
  }

  test("refusals: junk priority, out-of-range priority, malformed lastmod all NULL") {
    val got = entries(
      "<urlset>" +
        "<url><loc>u1</loc><priority>high</priority></url>" +
        "<url><loc>u2</loc><priority>1.5</priority></url>" +
        "<url><loc>u3</loc><lastmod>yesterday</lastmod></url>" +
        "<url><loc>u4</loc><lastmod>2026-02-30</lastmod></url>" +
        "</urlset>")
    assert(got.forall(e => e._4 == null && e._6 == null), got.toString)
  }

  test("resolveSitemapTree: depth provenance, bounded recursion, unresolved children drop") {
    import spark.implicits._
    def idx(children: String*): String =
      "<sitemapindex>" + children.map(c =>
        s"<sitemap><loc>$c</loc></sitemap>").mkString + "</sitemapindex>"
    def urlset(locs: String*): String =
      "<urlset>" + locs.map(l => s"<url><loc>$l</loc></url>").mkString +
        "</urlset>"
    val sitemaps = Seq(
      ("s://root", idx("s://mid", "s://leafA", "s://missing")),
      ("s://mid", idx("s://leafB", "s://deep")),
      ("s://deep", idx("s://leafA")), // depth 3 from root: REFUSED
      ("s://leafA", urlset("u1", "u2")),
      ("s://leafB", urlset("u3"))).toDF("url", "xml")
    val got = Sitemaps.resolveSitemapTree(sitemaps, "url", "xml", 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    val expect = Set(
      // each urlset's own entries at depth 0
      ("s://leafA", 0, "s://leafA", "u1"), ("s://leafA", 0, "s://leafA", "u2"),
      ("s://leafB", 0, "s://leafB", "u3"),
      // root -> leafA at depth 1
      ("s://root", 1, "s://leafA", "u1"), ("s://root", 1, "s://leafA", "u2"),
      // mid -> leafB depth 1; root -> mid -> leafB depth 2
      ("s://mid", 1, "s://leafB", "u3"), ("s://root", 2, "s://leafB", "u3"),
      // mid -> deep -> leafA: depth 2 from mid, depth 3 from root (dropped)
      ("s://mid", 2, "s://leafA", "u1"), ("s://mid", 2, "s://leafA", "u2"),
      // deep -> leafA at depth 1
      ("s://deep", 1, "s://leafA", "u1"), ("s://deep", 1, "s://leafA", "u2"))
    assert(got == expect,
      ("missing=" + (expect -- got)) + " extra=" + (got -- expect))
  }
}
