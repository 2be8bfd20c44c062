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
    * CPU-heavy per-row pipelines (tokenize → shingle → 8×md5, percentile
    * sketches, countDistinct Expand) run on one core no matter how many
    * exist. The shuffle moves only the small raw table; downstream compute
    * then uses every core. Catalyst pushes filters and column pruning
    * through Repartition, so scan pushdown is unaffected. The decision uses
    * `inputFiles` (file-index metadata, no RDD lineage build): at 100 TB
    * inputs have more files than cores and this is a no-op.
    */
  def widen(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.inputFiles.length < target) df.repartition(target) else df
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

  /** Registers every driver table as a temp view so the engine is fully
    * SQL-queryable (`spark.sql("SELECT ... FROM lineitem")`). This is the
    * Spark-native analog of the reference's submit-a-query interface
    * (yamr.py:51-57 start_task): the catalog IS the query surface. Views
    * carry the same normalization as the typed accessors (events ts → µs,
    * fact tables widened).
    */
  def registerAll(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => load(s, dir, n).createOrReplaceTempView(n))
    orders(s, dir).createOrReplaceTempView("orders")
    lineitem(s, dir).createOrReplaceTempView("lineitem")
    events(s, dir).createOrReplaceTempView("events")
    documents(s, dir).createOrReplaceTempView("documents")
    embeddings(s, dir).createOrReplaceTempView("embeddings")
  }

  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "lineitem"))
  def events(s: SparkSession, dir: String): DataFrame = widen(s, eventsNormalized(s, dir))
  def documents(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "embeddings"))
}
