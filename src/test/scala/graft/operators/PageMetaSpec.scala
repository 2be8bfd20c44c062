package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Page-metadata extraction laws on hand-written HTML (spec-truth, not
  * the q189 builder). */
class PageMetaSpec extends SparkSpec {

  private def meta(html: String) = {
    import spark.implicits._
    PageMeta.pageMeta(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .collect().head
  }

  test("title: first element wins, whitespace collapsed, markup stops capture, absent is NULL") {
    val r = meta("<TITLE>  A \n\t B </TITLE><title>second</title>")
    assert(r.getString(1) == "A B", r.toString)
    val markup = meta("<title>plain <b>bold</b></title>")
    assert(markup.getString(1) == "plain", markup.toString)
    assert(meta("<body>no title</body>").isNullAt(1))
    assert(meta("<title>   </title>").isNullAt(1))
  }

  test("description: both attribute orders, either name quote style") {
    val nf = meta("""<meta name="description" content="hello world">""")
    val cf = meta("""<meta content="reversed" name='description'>""")
    assert(nf.getString(2) == "hello world" && cf.getString(2) == "reversed",
      (nf, cf).toString)
    assert(meta("""<meta name="keywords" content="nope">""").isNullAt(2))
  }

  test("robots flags: lowercased word-bounded tokens; 'follow' is not 'nofollow'") {
    val r = meta("""<meta name="robots" content="NOINDEX, follow">""")
    assert(r.getString(3) == "noindex, follow" && r.getBoolean(4) &&
      !r.getBoolean(5), r.toString)
    val none = meta("<p>x</p>")
    assert(none.isNullAt(3) && !none.getBoolean(4) && !none.getBoolean(5))
  }

  test("canonical: both attribute orders; absent is NULL") {
    val rf = meta("""<link rel="canonical" href="https://a.org/x">""")
    val hf = meta("""<link href="https://b.org/y" rel='canonical'>""")
    assert(rf.getString(6) == "https://a.org/x" &&
      hf.getString(6) == "https://b.org/y", (rf, hf).toString)
    assert(meta("""<link rel="stylesheet" href="https://c.org/z">""")
      .isNullAt(6))
  }

  test("canonicalDedup: declared canonical folds variants; fallback to own URL; NULL-canonicalization dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://own.org/1", "https://WWW.Hub.Example.COM/c/0"),
      (2L, "https://own.org/2", "HTTPS://hub.example.com:443/c/0"),
      (3L, "https://own.org/3", null),
      (4L, "not a url", null)) // schemeless -> canonical NULL -> dropped
      .toDF("id", "own", "canon")
    val got = PageMeta.canonicalDedup(docs, "id", "own", "canon")
      .orderBy(col("canonical_url")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      ("https://hub.example.com/c/0", 1L, 2L),
      ("https://own.org/3", 3L, 1L)), got.toString)
  }
}
