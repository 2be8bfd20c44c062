package graft.sources

import graft.SparkSpec

/** The widen heuristic must trigger only when the scan genuinely cannot
  * parallelize: few files AND too few estimated byte-splits.
  */
class TablesSpec extends SparkSpec {

  test("widen repartitions a small single-file scan up to the parallelism") {
    val raw = Tables.load(spark, sf001, "lineitem")
    assert(raw.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val wide = Tables.widen(spark, raw)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("widen leaves a splittable large-file scan alone (byte-split estimate)") {
    // shrink maxPartitionBytes so the single parquet file estimates to many
    // splits — the ADVICE r2 case: one big SPLITTABLE file ≠ one partition
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try {
      val raw = Tables.load(spark, sf001, "lineitem")
      assert(Tables.widen(spark, raw) eq raw, "must not insert a repartition")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("widen leaves non-file-backed DataFrames alone") {
    import spark.implicits._
    val mem = (1 to 10).toDF("x")
    assert(Tables.widen(spark, mem) eq mem)
  }
}
