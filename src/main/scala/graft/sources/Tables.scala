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
    * through Repartition, so scan pushdown is unaffected.
    *
    * Widening is a TAX on queries that are already scan-bound (one extra
    * full-table exchange), so it is applied per call site, only ahead of
    * compute-heavy pipelines — never by the plain relational accessors.
    * The decision estimates how many scan splits the files actually yield
    * (bytes / maxPartitionBytes — one big SPLITTABLE parquet file already
    * parallelizes, so raw file count alone over-triggers): at 100 TB every
    * table exceeds cores × maxPartitionBytes and this is a no-op.
    */
  def widen(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) df
    else {
      val maxSplit = math.max(1L, org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")))
      val estSplits = files.map { f =>
        val bytes = try new java.io.File(new java.net.URI(f)).length
                    catch { case _: Exception => -1L } // non-local FS: unknown
        if (bytes < 0) 1L else (bytes + maxSplit - 1) / maxSplit
      }.sum
      if (estSplits < target) df.repartition(target) else df
    }
  }

  /** Canonicalizes `ts` to plain TimestampType (µs) whatever the parquet
    * writer emitted. The driver's generator has produced two shapes:
    * TIMESTAMP(NANOS), which Spark 4 only reads via the nanosAsLong
    * legacy conf (→ LongType here), and un-adjusted TIMESTAMP(MICROS),
    * which infers as TIMESTAMP_NTZ — valid for batch but rejected by a
    * streaming watermark (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The NTZ
    * cast is wall-clock-preserving under the engine's pinned UTC session
    * timezone, so batch results (and their oracles) are unchanged.
    * Shared by the batch accessor and the streaming source, so both see
    * the SAME column type — the batch/stream parity tests depend on it.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }

  def eventsNormalized(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** Registers every driver table as a temp view so the engine is fully
    * SQL-queryable (`spark.sql("SELECT ... FROM lineitem")`). This is the
    * Spark-native analog of the reference's submit-a-query interface
    * (yamr.py:51-57 start_task): the catalog IS the query surface. Views
    * carry the same normalization as the typed accessors (events ts → µs,
    * the token/vector tables widened).
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

  // Relational fact tables read RAW: their queries are scan/shuffle-bound
  // (filter→agg, joins, windows already repartition on their own keys), so
  // a widening exchange ahead of them is pure overhead (VERDICT r2 #1).
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame = eventsNormalized(s, dir)

  // Token/vector tables stay widened: every consumer runs CPU-heavy
  // per-row work (tokenize→shingle→8×md5, 64-dim dot products) that must
  // spread across cores before the first shuffle.
  def documents(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = widen(s, load(s, dir, "embeddings"))

  /** Widened lineitem for compute-heavy consumers (countDistinct Expand,
    * percentile sketches — q43/q44 went 14-16× faster widened while the
    * scan-bound relational queries regressed, hence the split accessors).
    */
  def lineitemWide(s: SparkSession, dir: String): DataFrame = widen(s, lineitem(s, dir))
}
