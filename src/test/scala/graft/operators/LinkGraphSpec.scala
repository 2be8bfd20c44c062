package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Extraction laws on hand-written HTML fixtures (spec-truth, not the
  * q184 builder) plus graph-builder invariants. */
class LinkGraphSpec extends SparkSpec {

  private def links(html: String) = {
    import spark.implicits._
    LinkGraph.extractLinks(
      Seq((1L, html, "base.example.com")).toDF("doc_id", "html", "base_host"),
      "doc_id", "html", "base_host")
      .collect()
      .map(r => (r.getInt(2), r.getString(3), r.getString(4),
        r.getBoolean(5), r.getString(6)))
      .toList.sortBy(_._1)
  }

  test("href quoting: double, single, double wins when both present") {
    val got = links(
      """<a href="https://a.org/x">dq</a>""" +
        """<a href='https://b.org/y'>sq</a>""" +
        """<a href="https://c.org/z" data-x='https://wrong.org'>both</a>""")
    assert(got.map(t => (t._2, t._3)) == List(
      ("abs", "a.org"), ("abs", "b.org"), ("abs", "c.org")), got.toString)
  }

  test("drops: no-href, empty, fragment, mailto/javascript/ftp; keeps relative") {
    val got = links(
      """<a name="x">no href</a>""" +
        """<a href="">empty</a>""" +
        """<a href="#sec">frag</a>""" +
        """<a href="mailto:a@b.c">mail</a>""" +
        """<a href="javascript:void(0)">js</a>""" +
        """<a href="ftp://f.org/x">ftp</a>""" +
        """<a href="/rel/path">rel</a>""" +
        """<a href="rel2.html">rel2</a>""")
    assert(got.map(t => (t._2, t._3, t._5)) == List(
      ("rel", "base.example.com", "rel"),
      ("rel", "base.example.com", "rel2")), got.toString)
  }

  test("host resolution: lowercase, port dropped, one www. stripped; empty host dropped") {
    val got = links(
      """<a href="HTTPS://WWW.Ex.COM:8443/p">a</a>""" +
        """<a href="http://www.www.d.org/q">b</a>""" +
        """<a href="https:///nohost">c</a>""")
    assert(got.map(_._3) == List("ex.com", "www.d.org"), got.toString)
  }

  test("unclosed <a> is dropped; <abbr> is not an anchor") {
    val got = links(
      """<a href="https://lost.org/x">truncated …""" +
        """<abbr title="x">abbr</abbr>""" +
        """<a href="https://kept.org/y">ok</a>""")
    assert(got.map(_._3) == List("kept.org"), got.toString)
  }

  test("nofollow flag from rel, any quote style, token anywhere in value") {
    val got = links(
      """<a rel="nofollow" href="https://s1.org">x</a>""" +
        """<a rel='ugc nofollow' href="https://s2.org">y</a>""" +
        """<a rel="author" href="https://s3.org">z</a>""")
    assert(got.map(t => (t._3, t._4)) == List(
      ("s1.org", true), ("s2.org", true), ("s3.org", false)), got.toString)
  }

  test("anchor text: inner tags stripped, whitespace collapsed, trimmed") {
    val got = links(
      "<a href=\"https://t.org\">  <b>Bold</b>\n\tand   <i>italic</i> text </a>")
    assert(got.map(_._5) == List("Bold and italic text"), got.toString)
  }

  test("link_no is the element offset among ALL anchors (dropped leave holes)") {
    val got = links(
      """<a href="#top">drop0</a>""" +
        """<a href="https://k.org">keep1</a>""" +
        """<a href="mailto:x@y.z">drop2</a>""" +
        """<a href="/r">keep3</a>""")
    assert(got.map(_._1) == List(1, 3), got.toString)
  }

  test("dst_url: absolute verbatim; relative root-resolved against base with https") {
    import spark.implicits._
    val got = LinkGraph.extractLinks(
      Seq((1L,
        """<a href="HTTP://WWW.A.org:80/x?q=1">abs</a>""" +
          """<a href="/p">r1</a><a href="p2.html">r2</a>""",
        "base.example.com")).toDF("doc_id", "html", "base_host"),
      "doc_id", "html", "base_host")
      .collect().map(_.getString(7)).toList
    assert(got == List("HTTP://WWW.A.org:80/x?q=1",
      "https://base.example.com/p",
      "https://base.example.com/p2.html"), got.toString)
  }

  test("crawlFrontier: crawled and disallowed removed, nofollow ignored, per-host budget by in-links") {
    import spark.implicits._
    def l(id: Long, url: String, nofollow: Boolean = false) =
      (id, "src.com", 0, "abs", "h.org", nofollow, "t", url)
    val links = Seq(
      l(1, "https://h.org/a"), l(2, "https://h.org/a"),
      l(3, "https://h.org/b"),
      l(4, "https://h.org/c"), // robots-disallowed
      l(5, "https://h.org/q"), // already crawled
      l(6, "https://h.org/z", nofollow = true),
      l(7, "https://blocked.org/x"))
      .toDF("doc_id", "base_host", "link_no", "kind", "dst_host",
        "nofollow", "anchor", "dst_url")
    val crawled = Seq("https://h.org/q").toDF("canonical_url")
    val rules = Robots.robotsRules(Seq(
      ("h.org", "User-agent: *\nDisallow: /c"),
      ("blocked.org", "User-agent: *\nDisallow: /"))
      .toDF("host", "body"), "host", "body")
    val got = LinkGraph.crawlFrontier(links, crawled, rules,
        agent = "graftbot", perHost = 2)
      .orderBy(col("host"), col("rk")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toList
    assert(got == List(
      ("h.org", "https://h.org/a", 2L, 1),
      ("h.org", "https://h.org/b", 1L, 2)), got.toString)
  }

  test("crawlFrontierBudget: per-host quota = min(perHost, floor(window/delay)), floor ≥ 1, delay-less keeps perHost") {
    import spark.implicits._
    def l(id: Long, url: String) =
      (id, "src.com", 0, "abs", "h.org", false, "t", url)
    val links = Seq(
      l(1, "https://slow.org/a"), l(2, "https://slow.org/a"),
      l(3, "https://slow.org/b"), l(4, "https://slow.org/c"),
      l(5, "https://free.org/a"), l(6, "https://free.org/b"),
      l(7, "https://free.org/c"),
      l(8, "https://glacial.org/a"), l(9, "https://glacial.org/b"))
      .toDF("doc_id", "base_host", "link_no", "kind", "dst_host",
        "nofollow", "anchor", "dst_url")
    val crawled = Seq.empty[String].toDF("canonical_url")
    val rules = Robots.robotsRules(
      Seq(("slow.org", "User-agent: *\nDisallow:"))
        .toDF("host", "body"), "host", "body")
    val delays = Seq(("slow.org", 30.0), ("glacial.org", 500.0))
      .toDF("host", "crawl_delay")
    val got = LinkGraph.crawlFrontierBudget(links, crawled, rules, delays,
        agent = "graftbot", perHost = 3, windowSec = 60.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(3), r.getInt(5)))
      .toSet
    assert(got == Set(
      // 60/30 = 2: the third slow.org candidate is cut
      ("slow.org", "https://slow.org/a", 1, 2),
      ("slow.org", "https://slow.org/b", 2, 2),
      // no delay: full perHost
      ("free.org", "https://free.org/a", 1, 3),
      ("free.org", "https://free.org/b", 2, 3),
      ("free.org", "https://free.org/c", 3, 3),
      // delay > window floors to 0 -> clamped to 1 (eventual progress)
      ("glacial.org", "https://glacial.org/a", 1, 1)), got.toString)
  }

  test("frontierAdmitBatch: stored crawled and scheduled urls are never re-admitted") {
    import spark.implicits._
    def l(id: Long, url: String) =
      (id, "src.com", 0, "abs", "h.org", false, "t", url)
    val rules = Robots.robotsRules(
      Seq(("h.org", "User-agent: *\nDisallow:"))
        .toDF("host", "body"), "host", "body")
    val crawled = Seq("https://h.org/done").toDF("canonical_url")
    val b1 = Seq(l(1, "https://h.org/a"), l(2, "https://h.org/b"),
      l(3, "https://h.org/done")).toDF("doc_id", "base_host", "link_no",
      "kind", "dst_host", "nofollow", "anchor", "dst_url")
    val scheduled = LinkGraph.crawlFrontier(b1, crawled, rules,
        agent = "bot", perHost = 2)
      .select(col("url").as("canonical_url"))
    assert(scheduled.collect().map(_.getString(0)).toSet ==
      Set("https://h.org/a", "https://h.org/b"), "batch 1 admits a,b")
    // batch 2 re-announces a (stored-scheduled) and done (crawled):
    // only the genuinely new url may be admitted
    val b2 = Seq(l(4, "https://h.org/a"), l(5, "https://h.org/done"),
      l(6, "https://h.org/new")).toDF("doc_id", "base_host", "link_no",
      "kind", "dst_host", "nofollow", "anchor", "dst_url")
    val got = LinkGraph.frontierAdmitBatch(b2, crawled, scheduled, rules,
        agent = "bot", perHost = 2)
      .collect().map(r => (r.getString(1), r.getInt(3))).toList
    assert(got == List(("https://h.org/new", 1)), got.toString)
  }

  test("discoveryMerge: spelling variants fold, best channel by explicitness, counts exact") {
    import spark.implicits._
    val seeds = Seq(
      ("https://a.com/x", "link"),
      ("HTTPS://WWW.A.com:443/x", "feed"), // same resource, messy form
      ("https://a.com/x", "link"), // duplicate announcement
      ("https://b.com/y", "sitemap"),
      ("not a url", "feed")) // schemeless -> dropped
      .toDF("url", "channel")
    val got = LinkGraph.discoveryMerge(seeds)
      .orderBy(col("canonical_url")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got == List(
      ("https://a.com/x", "feed", 2L, 3L),
      ("https://b.com/y", "sitemap", 1L, 1L)), got.toString)
  }

  test("hostEdges: nofollow and self-references excluded, weights counted") {
    import spark.implicits._
    val l = Seq(
      (1L, "h.com", 0, "abs", "a.org", false, "x"),
      (1L, "h.com", 1, "abs", "a.org", false, "y"),
      (1L, "h.com", 2, "abs", "b.org", true, "spam"), // nofollow
      (1L, "h.com", 3, "rel", "h.com", false, "self"), // self
      (2L, "g.com", 0, "abs", "a.org", false, "z"))
      .toDF("doc_id", "base_host", "link_no", "kind", "dst_host",
        "nofollow", "anchor")
    val got = LinkGraph.hostEdges(l, "base_host").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("h.com", "a.org", 2L), ("g.com", "a.org", 1L)),
      got.toString)
  }

  test("anchorTopK: rank is total-ordered (cnt desc, token asc), k bounds held") {
    import spark.implicits._
    val l = Seq(
      (1L, "h.com", 0, "abs", "t.org", false, "red red blue"),
      (2L, "h.com", 0, "abs", "t.org", false, "red blue green"),
      (3L, "h.com", 0, "abs", "t.org", true, "red red red")) // nofollow: out
      .toDF("doc_id", "base_host", "link_no", "kind", "dst_host",
        "nofollow", "anchor")
    val got = LinkGraph.anchorTopK(l, k = 2)
      .orderBy(col("dst_host"), col("rk")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toList
    assert(got == List(("t.org", "red", 3L, 1), ("t.org", "blue", 2L, 2)),
      got.toString)
  }
}
