package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Feed-parse laws on hand-written XML (spec-truth, not the q198
  * builder). */
class FeedsSpec extends SparkSpec {

  private def entries(xml: String) = {
    import spark.implicits._
    Feeds.feedEntries(Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
      .orderBy(col("entry_no")).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), if (r.isNullAt(6)) null else r.getDate(6).toString,
        r.getString(7)))
      .toList
  }

  test("rss: inner link, RFC822 pubDate (weekday optional), guid; link-less drops") {
    val got = entries(
      "<rss><channel><title>chan</title>" +
        "<item><title>A</title><link>https://h/a</link>" +
        "<pubDate>5 Mar 2026 10:00:00 GMT</pubDate><guid>g1</guid></item>" +
        "<item><title>orphan</title></item>" +
        "</channel></rss>")
    assert(got == List((0, "rss", "A", "https://h/a", "2026-03-05", "g1")),
      got.toString)
  }

  test("atom: href link, ISO updated, id as guid") {
    val got = entries(
      "<feed><title>f</title>" +
        "<entry><title>E</title><link href=\"https://h/e\"/>" +
        "<updated>2026-02-03T01:02:03Z</updated><id>u:1</id></entry></feed>")
    assert(got == List((0, "atom", "E", "https://h/e", "2026-02-03", "u:1")),
      got.toString)
  }

  test("date refusals: junk and calendar-invalid both NULL") {
    val got = entries(
      "<rss><channel>" +
        "<item><link>u1</link><pubDate>sometime soon</pubDate></item>" +
        "<item><link>u2</link><pubDate>30 Feb 2026 00:00:00 GMT</pubDate></item>" +
        "</channel></rss>")
    assert(got.forall(_._5 == null), got.toString)
  }
}
