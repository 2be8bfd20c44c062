package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference's storage layer is a DFS chunk scan
  * (yamr job_tracker.py:121-124 enumerates chunks; mapper.py:74-80 loads one
  * chunk per task). Spark's file-split → task model is the same contract;
  * parquet (columnar, predicate-pushdown-able) replaces whole-chunk text.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Repartitions an under-partitioned scan up to the cluster parallelism.
    *
    * Small single-row-group parquet files produce ONE input partition, so
    * CPU-heavy per-row pipelines (tokenize → shingle → 8×md5) run on one
    * core no matter how many exist. The shuffle moves only the small raw
    * table; downstream compute then uses every core. At 100 TB inputs have
    * thousands of row groups and this is a no-op.
    */
  def widen(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads via the
    * nanosAsLong legacy conf; normalize to TimestampType (µs) here so every
    * downstream operator sees a plain timestamp column.
    */
  def eventsNormalized(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }

  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame = eventsNormalized(s, dir)
  def documents(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "embeddings"))
}
