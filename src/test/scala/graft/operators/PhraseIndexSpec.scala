package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q97's stored-probe contract (VERDICT r7 #1): the phrase probe against
  * persisted bucketed artifacts must (a) return exactly what the inline
  * form returns, (b) prune BOTH scans to the touched buckets
  * (SelectedBucketsCount in the executed plan), and (c) never scan or
  * re-tokenize the raw corpus — the whole plan reads the two stored
  * tables plus the broadcast phrase side, nothing else.
  */
class PhraseIndexSpec extends SparkSpec {

  private val phrases =
    Seq("join part filter", "the vector customer spark", "sort merge join")

  test("driver-side xxhash64Literal equals Spark's xxhash64 function") {
    import spark.implicits._
    val samples = Seq("join part filter", "sort merge join", "", "a", "ünïcode test")
    val sparkSide = samples.toDF("s").select(xxhash64(col("s"))).collect().map(_.getLong(0))
    val driverSide = samples.map(TextAnalysis.xxhash64Literal)
    assert(sparkSide.toSeq == driverSide)
  }

  test("stored probe is value-identical to the inline phraseHits") {
    try {
      // keep the bucketed read: Spark's DisableUnnecessaryBucketedScan
      // only values bucketing for exchange elimination and would drop
      // the bucket-file pruning this probe exists to exercise
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val docs = Tables.load(spark, sf001, "documents")
      graft.plans.ScaleOps.writeBucketed(
        TextAnalysis.gramIndex(docs, "doc_id", "text", k = 3), "gh", 8, "p_gram_idx")
      graft.plans.ScaleOps.writeBucketed(
        TextAnalysis.tokenTable(docs, "doc_id", "text"), "doc_id", 8, "p_tokens")

      def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1), r.getInt(2))
      val inline = TextAnalysis.phraseHits(
        docs, TextAnalysis.gramIndex(docs, "doc_id", "text", 3),
        "doc_id", "text", phrases, 3).collect().map(key).toSet
      val stored = TextAnalysis.phraseHitsStored(
        spark, "p_gram_idx", "p_tokens", "doc_id", phrases, 3)
      val storedRows = stored.collect().map(key).toSet
      assert(storedRows == inline, s"stored=$storedRows inline=$inline")
      assert(inline.nonEmpty, "probe phrases must actually hit the sf0.001 corpus")
      // the absent phrase is exact in the stored path too: zero rows
      assert(!storedRows.exists(_._1 == "sort merge join"))

      // plan contract — on the SAME executed DataFrame (AQE-finalized by
      // the collect above)
      // AQE's toString appends an "== Initial Plan ==" section that
      // duplicates every scan; assert against the final plan only
      val plan = stored.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val pruned = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findAllMatchIn(plan)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
      assert(pruned.size == 2,
        s"both stored scans must show bucket pruning, got ${pruned.size}:\n$plan")
      pruned.foreach { case (sel, tot) =>
        assert(sel < tot, s"pruning must drop buckets ($sel of $tot):\n$plan")
      }
      // no third file scan: the raw documents parquet is never read and
      // never re-tokenized — candidates + verification come from the two
      // stored artifacts only
      val fileScans = plan.linesIterator.count(_.contains("Scan parquet"))
      assert(fileScans == 2, s"expected exactly the 2 stored-table scans, got $fileScans:\n$plan")
      assert(!plan.contains("documents.parquet"), s"probe must not touch the corpus:\n$plan")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS p_gram_idx")
      spark.sql("DROP TABLE IF EXISTS p_tokens")
    }
  }

  test("stored probe with only an absent phrase returns zero rows") {
    try {
      val docs = Tables.load(spark, sf001, "documents")
      graft.plans.ScaleOps.writeBucketed(
        TextAnalysis.gramIndex(docs, "doc_id", "text", k = 3), "gh", 8, "p_gram_idx2")
      graft.plans.ScaleOps.writeBucketed(
        TextAnalysis.tokenTable(docs, "doc_id", "text"), "doc_id", 8, "p_tokens2")
      val hits = TextAnalysis.phraseHitsStored(
        spark, "p_gram_idx2", "p_tokens2", "doc_id", Seq("sort merge join"), 3)
      assert(hits.count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS p_gram_idx2")
      spark.sql("DROP TABLE IF EXISTS p_tokens2")
    }
  }

  test("maxCandidateDocs guard fails loudly on a too-common first gram") {
    try {
      val docs = Tables.load(spark, sf001, "documents")
      graft.plans.ScaleOps.writeBucketed(
        TextAnalysis.gramIndex(docs, "doc_id", "text", k = 1), "gh", 8, "p_gram_idx3")
      graft.plans.ScaleOps.writeBucketed(
        TextAnalysis.tokenTable(docs, "doc_id", "text"), "doc_id", 8, "p_tokens3")
      // k=1 index: the gram "the" is in nearly every document
      val e = intercept[IllegalArgumentException] {
        TextAnalysis.phraseHitsStored(
          spark, "p_gram_idx3", "p_tokens3", "doc_id", Seq("the"), 1,
          maxCandidateDocs = 3)
      }
      assert(e.getMessage.contains("maxCandidateDocs"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS p_gram_idx3")
      spark.sql("DROP TABLE IF EXISTS p_tokens3")
    }
  }
}
