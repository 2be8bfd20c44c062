package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Bit-equality law for the native [[SpanCoverage]] fold against the
  * retained pre-r19 coverage pipeline
  * ([[Dedup.substringDedupTextReference]]: positional explode +
  * difference array + cumsum window + collect_list rebuild) — the CdcSpec
  * discipline. Also pins the expression's own contract on hand-computed
  * fixtures.
  */
class SpanCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[(Long, String)], k: Int) = {
    val df = rows.toDF("doc_id", "text")
    val nat = Dedup.substringDedupText(df, "doc_id", "text", k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    val ref = Dedup.substringDedupTextReference(df, "doc_id", "text", k)
      .orderBy("doc_id")
      .select(col("doc_id"), col("clean_text"), col("n_tokens"),
        col("n_kept"), col("n_dropped"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    (nat, ref)
  }

  private val run = "alpha bravo charlie delta echo foxtrot golf hotel"

  test("native == reference on a hand-built corpus (k=4)") {
    val corpus = Seq[(Long, String)](
      // 1 and 2 share the full 8-token run: doc 1 keeps it (first), doc 2
      // loses every position covered by a repeated 4-span
      (1L, run + " one extra words here"),
      (2L, run + " two different tail tokens"),
      // within-document repetition: the same 4-span twice in one doc
      (3L, "x1 x2 x3 x4 filler a b c x1 x2 x3 x4 trailing bits"),
      // shorter than k: no grams, everything kept
      (4L, "tiny doc"),
      // exactly k tokens, unique
      (5L, "unique quad of words"),
      // exactly k tokens, equal to doc 6's — keep-first across docs
      (6L, "same same2 same3 same4"),
      (7L, "same same2 same3 same4"),
      // overlapping spans: a 12-token run shared with doc 1 starting
      // mid-run (spans overlap heavily)
      (8L, "bravo charlie delta echo foxtrot golf hotel one extra words here zz"),
      // punctuation-only text: zero tokens after tokenize — row dropped
      (9L, "!!! ??? ..."),
      // empty text
      (10L, ""))
    val (nat, ref) = both(corpus, 4)
    assert(nat == ref)
    // non-vacuity: kept-whole docs, partially-dropped docs, an
    // all-token-count mix, and the short-doc fast path all present
    assert(ref.exists(r => r._5 == 0 && r._4 > 0), "no fully-kept doc")
    assert(ref.exists(r => r._5 > 0 && r._4 > 0), "no partially-dropped doc")
    assert(ref.exists(_._3 < 4), "no shorter-than-k doc")
    assert(!ref.exists(_._1 == 9L) && !ref.exists(_._1 == 10L),
      "zero-token docs must not appear")
  }

  test("native == reference on the sf0.001 documents corpus (k=20, q95 shape)") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val nat = Dedup.substringDedupText(docs, "doc_id", "text", 20)
      .orderBy("doc_id").collect().map(_.toSeq).toList
    val ref = Dedup.substringDedupTextReference(docs, "doc_id", "text", 20)
      .orderBy("doc_id")
      .select(col("doc_id"), col("clean_text"), col("n_tokens"),
        col("n_kept"), col("n_dropped"))
      .collect().map(_.toSeq).toList
    assert(nat == ref)
    val dropped = ref.map(_(4).asInstanceOf[Long]).sum
    assert(dropped > 0, "corpus must exercise actual span drops")
  }

  test("md5 surface: substringDedup == md5(substringDedupText.clean_text)") {
    val df = Seq[(Long, String)]((1L, run + " " + run), (2L, run)).toDF("doc_id", "text")
    val a = Dedup.substringDedup(df, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val b = Dedup.substringDedupText(df, "doc_id", "text", 4)
      .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("n_dropped"),
        md5(col("clean_text")).as("m"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(a.toList == b.toList)
  }

  test("expression contract: unsorted starts, overlap arithmetic, empty starts") {
    val out = Seq(
      (Seq("a", "b", "c", "d", "e", "f"), Seq(4, 1)), // unsorted, overlap at 4..5
      (Seq("a", "b", "c"), Seq.empty[Int]),
      (Seq("a", "b", "c", "d"), Seq(2))) // span runs past doc end: 2..3 covered
      .toDF("t", "ss")
      .select(SpanCoverage(col("t"), col("ss"), 2).as("sc"))
      .select(col("sc.n_tokens"), col("sc.n_kept"), col("sc.n_dropped"),
        col("sc.clean_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // starts {1,4}, k=2: covered positions 1,2,4,5 → kept 3,6
    assert(out(0) == ((6L, 2L, 4L, "c f")))
    assert(out(1) == ((3L, 3L, 0L, "a b c")))
    // start 2, k=2: covered 2,3 → kept 1,4
    assert(out(2) == ((4L, 2L, 2L, "a d")))
  }
}
