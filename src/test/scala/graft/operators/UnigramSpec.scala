package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the hard-EM unigram-LM segmenter, pinned against a
  * DRIVER-SIDE reference implementation of the exact same integer
  * scheme (seed substring counts → composite-cost Viterbi → usage
  * counts → re-cost → final Viterbi) — brute-force enumeration over
  * all 2^(len−1) segmentations, so a relational bug in the doubling
  * closure or the path-equality extraction cannot hide. */
class UnigramSpec extends SparkSpec {

  private val CBIG = 1L << 20
  private val BASE = 1L << 32

  /** All segmentations of w into pieces of length ≤ L. */
  private def splits(w: String, L: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(L, w.length)).flatMap(l =>
      splits(w.drop(l), L).map(w.take(l) +: _))

  /** Composite cost of a segmentation under a cost table. */
  private def composite(seg: Seq[String], cost: Map[String, Long]): Long = {
    var pos = 1
    var total = 0L
    seg.foreach { p =>
      total += cost(p) * BASE + (1L << (pos - 1))
      pos += p.length
    }
    total
  }

  /** The reference EM: returns w -> (seg, nPieces, baseCost). */
  private def reference(words: Map[String, Long],
      L: Int): Map[String, (String, Int, Long)] = {
    def seedCounts: Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      words.foreach { case (w, n) =>
        for (i <- 0 until w.length; l <- 1 to math.min(L, w.length - i))
          m(w.substring(i, i + l)) += n
      }
      m.toMap
    }
    def costs(c: Map[String, Long], keys: Iterable[String]): Map[String, Long] =
      keys.map(p => p -> CBIG / (c.getOrElse(p, 0L) + 1L)).toMap
    def viterbi(cost: Map[String, Long]): Map[String, Seq[String]] =
      words.keys.map { w =>
        w -> splits(w, L).minBy(composite(_, cost))
      }.toMap
    val seedKeys = seedCounts.keys
    val segA = viterbi(costs(seedCounts, seedKeys))
    val used = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    segA.foreach { case (w, seg) => seg.foreach(p => used(p) += words(w)) }
    val cost1 = costs(used.toMap, seedKeys)
    viterbi(cost1).map { case (w, seg) =>
      w -> (seg.mkString(" "), seg.size,
        seg.map(cost1).sum)
    }
  }

  test("unigramSegment == brute-force reference EM (composite-cost Viterbi, unique argmin)") {
    import spark.implicits._
    // mixed lengths, shared substrings, skewed frequencies — enough to
    // make the seed and the M-step disagree (EM is not a no-op)
    val corpus = Seq(
      (1L, "abab abab abab cd"),
      (2L, "ababcd ababcd xyz"),
      (3L, "cdcd ab xyzxyz"),
      (4L, "abab cd cd"))
    val docs = corpus.toDF("doc_id", "text")
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val want = reference(words, L = 4)
    val got = Unigram.unigramSegment(docs, "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(2), r.getLong(3).toInt, r.getLong(4))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (w, exp) =>
      assert(got(w) == exp, s"$w: got ${got(w)}, want $exp")
    }
    // structural laws: pieces re-concatenate to the word; counts agree
    got.foreach { case (w, (seg, np, _)) =>
      assert(seg.replace(" ", "") == w, s"$w: '$seg'")
      assert(seg.split(" ").length == np)
      assert(seg.split(" ").forall(_.length <= 4))
    }
  }

  test("unigramEncode: per-doc counts are the exact fold of the segmentation") {
    import spark.implicits._
    val corpus = Seq((1L, "abab cd abab"), (2L, "cd cd xyz"))
    val docs = corpus.toDF("doc_id", "text")
    val pieces = Unigram.unigramSegment(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val got = Unigram.unigramEncode(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    corpus.foreach { case (id, text) =>
      val ws = text.split(" ").toSeq
      val want = (id, ws.size.toLong, ws.map(pieces).sum)
      val row = got.find(_._1 == id).get
      assert(row == want, s"doc $id: $row, want $want")
    }
  }

  test("deterministic under repartition; > 32-char words excluded (documented bound)") {
    import spark.implicits._
    val long = "a" * 40
    val docs = Seq((1L, s"hello world $long"), (2L, "hello hello world"))
      .toDF("doc_id", "text")
    val a = Unigram.unigramSegment(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(4))).toSet
    val b = Unigram.unigramSegment(docs.repartition(7), "text").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(4))).toSet
    assert(a == b)
    assert(!a.exists(_._1 == long), "over-bound words are excluded")
    assert(a.exists(_._1 == "hello"))
    // guard
    intercept[IllegalArgumentException] {
      Unigram.unigramSegment(docs, "text", maxPieceLen = 9)
    }
  }
}
