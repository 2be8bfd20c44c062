package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** [[HtmlTextExtract]] must answer byte-identically to the regex
  * cascade it replaced (r18) — verified here against a Java-regex
  * REFERENCE reimplementation of that cascade (with the one deliberate
  * r18 law change, the unclosed-subtree `|.*$` arms, applied to the
  * reference too, exactly as [[graft.operators.Extraction.htmlTextSql]]
  * applies it to the DuckDB side). Two layers:
  *
  *   - adversarial fixtures for every stage edge the cascade's staged
  *     evaluation makes observable (cross-stage artifacts like
  *     `&&#97;mp;`, natural C0 sentinels, tag/script interleavings);
  *   - a property sweep over generated HTML-ish soup built from the
  *     exact trigger fragments (tags, partial entities, sentinels,
  *     whitespace runs), where one divergence fails loudly with the
  *     input.
  */
class HtmlTextExtractSpec extends AnyFunSuite {

  // ------------------------------------------------ reference cascade
  private val ScriptRe = Pattern.compile(
    "(?is)<script\\b[^>]*>(.*?</script>|.*$)|<style\\b[^>]*>(.*?</style>|.*$)")
  private val TagRe = Pattern.compile("<[^>]*>")
  private val NumEntRe = Pattern.compile("&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
  private val WsRe = Pattern.compile("[ \\t\\n\\r]+")

  /** The retired Spark column cascade, stage for stage, in Java regex
    * (Spark's regexp_replace/replace/split/transform are Java-regex /
    * literal-replace backed, so this is the same semantics the old
    * column tree executed). */
  private def reference(s: String): String = {
    val noBlocks = ScriptRe.matcher(s).replaceAll(" ")
    val noTags = TagRe.matcher(noBlocks).replaceAll(" ")
    val named = noTags.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&nbsp;", " ")
    // decodeNumeric(shieldAmp = true): mark, split, decode, stitch
    val marked = NumEntRe.matcher(named)
      .replaceAll(Matcher.quoteReplacement("\u0001") + "$1"
        + Matcher.quoteReplacement("\u0002"))
    val parts = marked.split("\u0001", -1)
    val numeric = parts.head + parts.tail.map { x =>
      val i = x.indexOf('\u0002')
      if (i < 0) "\u0001" + x
      else {
        val code = x.substring(0, i)
        val rest = x.substring(i + 1)
        val cp: Option[Long] =
          if (code.matches("x[0-9a-fA-F]{1,6}"))
            Some(java.lang.Long.parseLong(code.substring(1), 16))
          else if (code.matches("[0-9]{1,7}")) Some(code.toLong)
          else None
        cp match {
          case Some(v) if v >= 32 && v <= 126 =>
            (if (v == 38) "\u0003" else v.toChar.toString) + rest
          case _ => "&#" + code + ";" + rest
        }
      }
    }.mkString
    val amp = numeric.replace("&amp;", "&").replace("\u0003", "&")
    WsRe.matcher(amp).replaceAll(" ")
      .replaceAll("^ +| +$", "") // trim: only spaces survive collapse
  }

  private def native(s: String): String =
    Option(HtmlTextExtract.compute(UTF8String.fromString(s)))
      .map(_.toString).orNull

  private def check(s: String): Unit = {
    val want = reference(s)
    val got = native(s)
    assert(got == want,
      s"input=${s.map(c => if (c < 32) f"\\u${c.toInt}%04x" else c).mkString}" +
        s"\n  native   ='$got'\n  reference='$want'")
  }

  // ------------------------------------------------------- fixtures
  test("stage-edge fixtures match the reference cascade") {
    Seq(
      // the r18 law: unclosed subtrees kill to end of input
      "a<script>stolen body never closed",
      "a<style>.x{} truncated",
      "a<script>x</style>never closes<p>t",
      "pre<script a='b>c'>body</script>post",
      "a<script foo", // open tag never completes: literal
      "a<scripts>word</scripts>b", // \b guard
      "<SCRIPT\nsrc='x'>a</ScRiPt>done",
      // cascade staging artifact: script kill runs BEFORE tag strip
      "<a <script>x</script>>tail",
      "x < y < z> w",
      "<a title=\"a>b\">c",
      "<abc &lt; def", // unclosed tag leaves entities decodable
      // cross-stage entity artifacts
      "&&#97;mp; lt;", // numeric decode CREATES &amp; for the amp stage
      "&#38;amp;lt;", // shielded amp must not re-decode
      "&amp;#65; &#38;#66;",
      "&#x41;&#X41;&#x1234567;&#0;&#127;&#126;&#32;&#31;",
      "&lt;&gt;&quot;&nbsp;&amp;&apos;",
      "&l<b>t; &lt<b>; &#6<i>5;",
      // natural C0 sentinels (the documented garble paths — both
      // implementations must garble IDENTICALLY)
      "nat\u0001ural", "nat\u0002ural", "nat\u0003ural",
      "\u0001ABC\u0002def", "&#65;X\u0002Y", "\u0001&#66;\u0002",
      "a\u0001&#67;b", "\u0002&#68;\u0001\u0002",
      // whitespace + trim
      "  \t\nlead and trail\r\n ", "", " ", "\t", "a  b",
      "&#9;tab-ref", // decodes? 9 < 32: stays literal
      "<p>a</p>\n\n<br/>  <div>body</div>"
    ).foreach(check)
  }

  test("property sweep: generated HTML soup matches the reference") {
    val frag: Gen[String] = Gen.oneOf(
      Gen.oneOf("<script>", "</script>", "<style>", "</style>",
        "<script x=1>", "<SCRIPT>", "</STYLE>", "<scripts>", "<script",
        "<p>", "</p>", "<br/>", "<", ">", "<a href='x'>"),
      Gen.oneOf("&lt;", "&gt;", "&quot;", "&nbsp;", "&amp;", "&",
        "&#", ";", "&#38;", "&#65;", "&#x41;", "&#8364;", "&#31;",
        "&#x", "&amp;lt;", "&&#97;mp;", "&#123456;", "&#1234567;"),
      Gen.oneOf(" ", "\t", "\n", "\r\n", "  "),
      Gen.oneOf("\u0001", "\u0002", "\u0003"),
      Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("text", "x", "1", "é", "naïve"))
    val soup: Gen[String] = Gen.listOf(frag).map(_.mkString)
    var seed = Seed(4242L)
    val params = Gen.Parameters.default
    (1 to 400).foreach { _ =>
      soup.apply(params, seed).foreach(check)
      seed = seed.next
    }
  }
}
