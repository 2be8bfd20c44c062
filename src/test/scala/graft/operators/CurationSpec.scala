package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val dup1 = (1 to 78).map(i => s"tok$i").mkString(" ") + " aa bb"    // ~dup of base
    val dup2 = (1 to 76).map(i => s"tok$i").mkString(" ") + " cc dd ee ff" // ~dup of base
    val other = (1 to 80).map(i => s"zzz$i").mkString(" ")
    val otherDup = (1 to 79).map(i => s"zzz$i").mkString(" ") + " qq"
    Seq((10L, base), (11L, dup1), (12L, dup2), (20L, other), (21L, otherDup),
      (30L, "completely unrelated tiny doc about sparks and rivers flowing south"))
      .toDF("doc_id", "text")
  }

  test("pipeline clusters planted near-dups transitively and keeps one rep per cluster") {
    val assign = Curation.clusterAssignments(corpus(), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster {10,11,12} → rep 10 (12 may only connect via 11: transitivity)
    assert(assign(10L) == 10L && assign(11L) == 10L && assign(12L) == 10L, s"$assign")
    assert(assign(20L) == 20L && assign(21L) == 20L)
    assert(assign(30L) == 30L)
  }

  test("dedupedCorpus keeps exactly the cluster representatives") {
    val kept = Curation.dedupedCorpus(corpus(), threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L, 30L))
  }

  test("verifyPairs rejects candidates below the jaccard threshold") {
    val pairs = Curation.verifyPairs(corpus(),
      Curation.minhashCandidates(corpus()), threshold = 0.99)
      .collect()
    assert(pairs.isEmpty, s"0.99 threshold must reject all: ${pairs.mkString(",")}")
  }
}
