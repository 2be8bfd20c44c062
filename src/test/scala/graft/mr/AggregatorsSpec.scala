package graft.mr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic + accuracy properties of the exportable HLL sketch. */
class AggregatorsSpec extends SparkSpec {

  private def hashesOf(vs: Seq[Long]): Seq[Long] = {
    // any well-mixed 64-bit hash works; use the same xxhash64 the query
    // applies, hashed in ONE job (keeps the test and query aligned)
    import spark.implicits._
    vs.toDF("x").select(xxhash64(col("x"))).as[Long].collect().toSeq
  }

  test("HLL merge law: sketch(A ++ B) == merge(sketch(A), sketch(B)) register-for-register") {
    val agg = new Aggregators.HllAggregator(12)
    import spark.implicits._
    val hashes = spark.range(0, 20000).toDF("x")
      .select(xxhash64(col("x"))).as[Long].collect()
    val (a, b) = hashes.splitAt(hashes.length / 3)
    val sa = a.foldLeft(agg.zero)(agg.reduce)
    val sb = b.foldLeft(agg.zero)(agg.reduce)
    val whole = hashes.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(sa, sb)
    assert(merged.sameElements(whole))
    // idempotent re-merge of a shard must not change the estimate
    assert(agg.finish(agg.merge(merged.clone(), sb)) == agg.finish(merged))
  }

  test("HLL estimate within 5% of exact on the declared query") {
    val est = graft.SparkEntry.queries("q67_hll_mergeable")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(est(k) - n).toDouble / n
      assert(err <= 0.05, s"$k: est=${est(k)} exact=$n err=$err")
    }
  }

  test("HLL small-range correction counts tiny sets near-exactly") {
    val agg = new Aggregators.HllAggregator(12)
    val sk = hashesOf(1L to 100L).foldLeft(agg.zero)(agg.reduce)
    val est = agg.finish(sk)
    assert(math.abs(est - 100) <= 2, s"got $est")
  }
}
