package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pointer-doubling redirect-resolution laws on hand-written graphs
  * (spec-truth, not the q192 builder). */
class RedirectsSpec extends SparkSpec {

  private def resolve(urls: Seq[String], edges: Seq[(String, String)],
      rounds: Int) = {
    import spark.implicits._
    Redirects.resolveRedirects(urls.toDF("url"),
        edges.toDF("url", "next"), rounds)
      .collect()
      .map(r => r.getString(0) -> ((if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("chains resolve with exact hop counts; terminals are 0-hop") {
    val got = resolve(Seq("a", "b", "c"), Seq("a" -> "b", "b" -> "c"), 3)
    assert(got == Map(
      "a" -> (("c", 2L, true)),
      "b" -> (("c", 1L, true)),
      "c" -> (("c", 0L, true))), got.toString)
  }

  test("off-corpus target resolves to that target") {
    val got = resolve(Seq("x"), Seq("x" -> "gone"), 3)
    assert(got("x") == (("gone", 1L, true)), got.toString)
  }

  test("cycles and chains into cycles are unresolved; self-redirect is a 1-cycle") {
    val got = resolve(Seq("p", "q", "w", "s"),
      Seq("p" -> "q", "q" -> "p", "w" -> "p", "s" -> "s"), 4)
    assert(got.values.forall(v => v._1 == null && v._3 == false),
      got.toString)
  }

  test("rounds bound chains at 2^rounds: a 5-hop chain needs 3 doublings, not 2") {
    val urls = Seq("u0", "u1", "u2", "u3", "u4", "u5")
    val edges = (0 until 5).map(i => s"u$i" -> s"u${i + 1}")
    val under = resolve(urls, edges, 2) // covers <= 4 hops
    assert(!under("u0")._3 && under("u1") == (("u5", 4L, true)),
      under.toString)
    val enough = resolve(urls, edges, 3)
    assert(enough("u0") == (("u5", 5L, true)), enough.toString)
  }
}
