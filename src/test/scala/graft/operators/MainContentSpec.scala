package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-density selection laws on hand-written pages (spec-truth, not
  * the q197 builder). */
class MainContentSpec extends SparkSpec {

  private val article = "This is the long main article text that " +
    "should definitely survive the density gate with room to spare."

  private def main(html: String) = {
    import spark.implicits._
    MainContent.mainContent(
        Seq((1L, html)).toDF("id", "html"), "id", "html")
      .collect().head
  }

  test("boilerplate sandwich: nav, cookie banner, footer drop; the article survives") {
    val r = main(
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
        "<div>We use cookies.</div>" +
        s"<article><p>$article</p></article>" +
        "<div class=\"footer\">© 2026 Corp</div></html>")
    // blocks: nav, cookie, article-p, article-close span, footer, tail
    assert(r.getLong(2) == 1L, r.toString)
    assert(r.getLong(3) == article.length.toLong, r.toString)
  }

  test("script and style bodies never reach blocking") {
    val r = main(
      "<script>var a = '" + ("x" * 200) + "';</script>" +
        s"<p>$article</p><div>tail tail tail</div>")
    assert(r.getLong(2) == 1L && r.getLong(3) == article.length.toLong,
      r.toString)
  }

  test("a long but link-only block fails the density gate") {
    val links = (1 to 20)
      .map(i => s"""<a href="/page/$i">item number $i</a>""").mkString(" ")
    val r = main(s"<div>$links</div><p>$article</p></html>")
    assert(r.getLong(2) == 1L && r.getLong(3) == article.length.toLong,
      r.toString)
  }

  test("thresholds are parameters: dropping them keeps everything") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val html = "<div>short</div><p>also short but kept</p>end"
    val r = MainContent.mainContent(
        Seq((1L, html)).toDF("id", "html"), "id", "html",
        minChars = 0, minDensityPct = 0)
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L, r.toString)
  }
}
