package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for q95's span dedup: the distributed difference-array
  * pipeline must equal a naive single-process reference (all k-grams,
  * keep-first by (doc, pos), explicit per-position coverage marking) for
  * arbitrary corpora — small vocabularies on purpose, so repeated spans,
  * overlapping spans, nested overlaps, and spans touching document ends
  * all occur constantly.
  */
class SubstringDedupPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // tiny vocabulary → dense collisions; lengths straddle k
  private val docGen: Gen[List[String]] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))

  /** Naive reference: mark covered positions doc by doc, span by span. */
  private def naive(docs: Seq[(Long, List[String])], k: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    val occ = for {
      (id, t) <- docs
      p <- 1 to (t.length - k + 1)
    } yield (id, p, t.slice(p - 1, p - 1 + k).mkString(" "))
    val keepFirst = occ.groupBy(_._3).collect {
      case (_, os) if os.size > 1 => os.minBy(o => (o._1, o._2))
    }.toSet
    val flagged = occ.filter(o =>
      occ.count(_._3 == o._3) > 1 && !keepFirst(o))
    val coveredPos: Map[Long, Set[Int]] = flagged
      .groupBy(_._1)
      .map { case (id, fs) =>
        id -> fs.flatMap(f => f._2 until (f._2 + k)).toSet
      }
    docs.filter(_._2.nonEmpty).map { case (id, t) =>
      val cov = coveredPos.getOrElse(id, Set.empty)
      val kept = t.zipWithIndex.collect { case (tok, i0) if !cov(i0 + 1) => tok }
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> ((t.length.toLong, kept.length.toLong,
        (t.length - kept.length).toLong, md5))
    }.toMap
  }

  test("property: distributed substring dedup == naive reference for arbitrary corpora") {
    import spark.implicits._
    val k = 3
    (1 to 8).foreach { i =>
      val seed = i * 6271L
      val docs = sample(Gen.listOfN(6, docGen), seed)
        .zipWithIndex.map { case (t, id) => (id.toLong, t) }
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.substringDedup(df, "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      assert(got == naive(docs, k), s"seed $seed docs=$docs")
    }
  }
}
