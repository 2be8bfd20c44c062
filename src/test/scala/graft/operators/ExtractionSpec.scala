package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtractionSpec extends SparkSpec {

  test("htmlText: scripts/styles die whole, tags strip, entities decode, whitespace folds") {
    import spark.implicits._
    val fixtures = Seq(
      // script subtree dies including its text (even with tag-ish content)
      ("<p>a</p><script>var x = '<b>no</b>';</script><p>b</p>", "a b"),
      // style dies; case-insensitive, attributes allowed
      ("<STYLE type=\"x\">p{color:red}\n.y{}</STYLE>hi", "hi"),
      // multi-line script (dotall)
      ("<script>\nline1\nline2\n</script>ok", "ok"),
      // plain tags (incl. self-closing) become spaces, runs fold
      ("<h1>Title</h1>\n\n<br/>  <div>body</div>", "Title body"),
      // entity set, incl. the &amp;lt; double-escape rule: literal "&lt;"
      ("&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;&amp; &amp;lt;",
        "<tag> \"q\" 's' & &lt;"),
      // no html at all is a no-op modulo whitespace folding
      ("just  plain\ttext", "just plain text"),
      // a <script> is NOT closed by </style> (per-tag patterns — ADVICE
      // r14): the whole script body incl. the stray </style> dies
      ("<p>a</p><script>x</style>y</script><p>b</p>", "a b"),
      // and the style twin
      ("<style>.x{}</script>z</style>ok", "ok"),
      // numeric character references: decimal + hex decode in printable
      // ASCII; out-of-range (&#8364; euro, &#x1F600; emoji) pass through
      // UNDECODED; &#39; rides the generic numeric path
      ("&#65;&#x42;&#x63; &#39;s&#39; &#8364; &#x1F600; end",
        "ABc 's' &#8364; &#x1F600; end"),
      // boundary codepoints: 32 (space) and 126 (~) decode, 31 and 127 not
      ("[&#32;][&#126;][&#31;][&#127;]", "[ ][~][&#31;][&#127;]"),
      // double-escape: &amp;#65; is a LITERAL &#65;, decoded single-pass
      ("&amp;#65; and &#38;#66;", "&#65; and &#66;"),
      // single-pass both ways: a numeric-escaped ampersand must not be
      // re-read as the start of &amp;/&lt; (code-review r15)
      ("&#38;amp;lt; then &#38;lt; then &#38;#38;", "&amp;lt; then &lt; then &#38;"),
      // malformed references pass through untouched
      ("&#; &#x; &#xg1; &#12345678; no-semi &#65", "&#; &#x; &#xg1; &#12345678; no-semi &#65")
    )
    val got = fixtures.map(_._1).toDF("h")
      .select(col("h"), Extraction.htmlText(col("h")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fixtures.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> '${got(in)}', want '$want'")
    }
  }

  test("htmlExtract: one stateless scan, no shuffle, no UDF") {
    import spark.implicits._
    val docs = Seq((1L, "<p>a</p>")).toDF("doc_id", "html")
    val plan = Extraction.htmlExtract(docs, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"),
      s"extraction must be a pure projection:\n$plan")
  }

  test("stripInvisible: zero-width/control/BOM/SHY die, whitespace survives") {
    import spark.implicits._
    val fixtures = Seq(
      ("pre​fix", "prefix"), // ZWSP inside a word — the dedup defeater
      ("﻿bom", "bom"),
      ("abc", "abc"), // C0 + DEL
      ("co­operate", "cooperate"), // soft hyphen
      ("x‍‍‌y", "xy"), // ZWJ run + ZWNJ
      ("w⁠j", "wj"), // word joiner
      ("tab\there\nand\rreturn ok", "tab\there\nand\rreturn ok") // kept
    )
    val got = fixtures.map(_._1).toDF("t")
      .select(col("t"), Extraction.stripInvisible(col("t")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fixtures.foreach { case (in, want) =>
      assert(got(in) == want, s"${in.map(_.toInt)} -> '${got(in)}'")
    }
    // audit columns: count, changed flag, md5 pin; pure projection
    val docs = Seq((1L, "a​b"), (2L, "cd")).toDF("doc_id", "t")
    val rows = Extraction.invisibleAudit(docs, "doc_id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows(1L) == ((1L, 2L, true)) && rows(2L) == ((0L, 2L, false)))
    val plan = Extraction.invisibleAudit(docs, "doc_id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sentenceSplit: punct+space boundaries, terminal kept, no-boundary docs whole") {
    import spark.implicits._
    val docs = Seq(
      (1L, "first one. second two! third three? tail"),
      (2L, "no boundary at all"),
      (3L, "dot.without space stays"), // punct NOT followed by ws: no split
      (4L, "multi  space.  after")    // ws run after punct is one boundary
    ).toDF("doc_id", "t")
    val got = Extraction.sentenceSplit(docs, "doc_id", "t")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // doc 1: four sentences, terminal punct kept with its sentence
    assert(got(1L).map(x => (x._2, x._3)).sortBy(_._1).toSeq ==
      Seq((0, 10L), (1, 11L), (2, 12L), (3, 4L)), got(1L).mkString(","))
    assert(got(2L).map(_._2).toSeq == Seq(0), "no boundary -> one sentence")
    assert(got(3L).map(_._2).toSeq == Seq(0), "punct without space is no boundary")
    assert(got(4L).size == 2, got(4L).mkString(","))
    // md5 pins the exact sentence text (terminal punct included)
    val md5s = Extraction.sentenceSplit(docs, "doc_id", "t")
      .filter(col("doc_id") === 1 && col("sent_id") === 0)
      .collect().head.getString(4)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("first one.".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5s == expect)
  }

  test("chunkText: boundaries, overlap, short docs, determinism") {
    import spark.implicits._
    // window 10, overlap 3 -> step 7: starts 1, 8, 15, ...
    val docs = Seq(
      (1L, "abcdefghijklmnop"), // len 16 -> starts 1, 8, 15
      (2L, "short"),            // len 5  -> one (short) chunk
      (3L, "")                  // empty  -> no chunks
    ).toDF("doc_id", "text")
    val got = Extraction.chunkText(docs, "doc_id", "text", window = 10,
        overlap = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).map(c => c._2 -> c._3).sortBy(_._1).toSeq ==
      Seq(0 -> 10L, 1 -> 9L, 2 -> 2L), byDoc(1L).mkString(","))
    // chunk 0 of doc 1 is exactly chars 1-10
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("abcdefghij".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(byDoc(1L).find(_._2 == 0).get._4 == expectMd5)
    assert(byDoc(2L).map(c => c._2 -> c._3).toSeq == Seq(0 -> 5L))
    assert(!byDoc.contains(3L), "empty docs emit no chunks")
    // adjacent chunks overlap by exactly `overlap` chars
    val c0 = "abcdefghij"; val c1 = "hijklmnop"
    assert(c0.takeRight(3) == c1.take(3))
    // guards
    intercept[IllegalArgumentException] {
      Extraction.chunkText(docs, "doc_id", "text", window = 5, overlap = 5)
    }
  }
}
