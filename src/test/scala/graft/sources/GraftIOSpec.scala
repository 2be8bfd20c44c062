package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.mr.{Aggregators, Jobs}

/** Source/sink round-trips (SURVEY §2.1 / §2.12) + the typed Aggregator
  * fast path.
  */
class GraftIOSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graftio_$name").toString

  test("parquet round-trip preserves schema and rows") {
    val df = Tables.nation(spark, sf001)
    val out = tmp("pq")
    GraftIO.writeParquet(df, out)
    val back = GraftIO.readParquet(spark, out)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
  }

  test("csv round-trip") {
    val df = Tables.region(spark, sf001)
    val out = tmp("csv")
    GraftIO.writeCsv(df, out)
    val back = GraftIO.readCsv(spark, out)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("json round-trip") {
    val df = Tables.region(spark, sf001)
    val out = tmp("json")
    GraftIO.writeJson(df, out)
    val back = GraftIO.readJson(spark, out)
    assert(back.count() == df.count())
  }

  test("region-partitioned JSON sink: n files, content-defined placement + per-region key sort (reducer.py:141-150)") {
    import spark.implicits._
    val df = Seq("mm" -> 5, "aa" -> 1, "bb" -> 2, "cc" -> 3, "mm" -> 4).toDF("k", "v")
    val out = tmp("regions")
    GraftIO.writeRegionJson(df, "k", 2, out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 2)
    // reference golden (test_partition.py:31-41): with n=2, bb → region 1
    // (partition 0), {aa, cc, mm, mm} → region 2 (partition 1), each
    // region sorted by key (mapper.py:133-134)
    val p0 = scala.io.Source.fromFile(parts(0), "UTF-8").getLines().toSeq
    val p1 = scala.io.Source.fromFile(parts(1), "UTF-8").getLines().toSeq
    assert(p0.forall(_.contains("\"bb\"")) && p0.size == 1)
    val keys1 = p1.map(l => "\"k\":\"(\\w+)\"".r.findFirstMatchIn(l).get.group(1))
    assert(keys1 == Seq("aa", "cc", "mm", "mm"), s"region 2 must be key-sorted: $keys1")
  }

  test("region JSON round-trip: readRegionJson merges all regions (yamr.py:63-78)") {
    import spark.implicits._
    val df = Seq("mm" -> 5, "aa" -> 1, "bb" -> 2, "cc" -> 3, "mm" -> 4).toDF("k", "v")
    val out = tmp("regions_rt")
    GraftIO.writeRegionJson(df, "k", 3, out)
    val back = GraftIO.readRegionJson(spark, out, 3)
    assert(back.count() == df.count())
    assert(back.select(col("k"), col("v").cast("int")).collect().map(r =>
      (r.getString(0), r.getInt(1))).toSet ==
      Set("mm" -> 5, "aa" -> 1, "bb" -> 2, "cc" -> 3, "mm" -> 4))
    // a missing region must be loud, not silently fewer rows
    intercept[Exception] { GraftIO.readRegionJson(spark, out, 4).count() }
  }

  test("streaming file source: readStream over events aggregates with batch parity") {
    import org.apache.spark.sql.functions._
    val stream = graft.streaming.Streams.eventsStream(spark, sf001)
    assert(stream.isStreaming)
    val agg = graft.streaming.Streams.tumblingCounts(stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(s"file_src_${System.nanoTime()}")
      .start()
    try {
      q.processAllAvailable()
      // append mode only emits windows closed by the watermark; the last
      // 30 min of event-time stays open — compare against the batch
      // result restricted to the emitted windows
      val got = spark.table(q.name)
        .select("win_start", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = graft.SparkEntry.queries("q48_window_tumbling")(spark, sf001)
        .collect().map(_.toSeq).toSet
      assert(got.nonEmpty && got.subsetOf(batch),
        s"streamed windows must match batch: ${got.size} of ${batch.size}")
    } finally q.stop()
  }

  test("chunk-as-record scan: whole file delivered as one string (mapper.py:74-84)") {
    val path = "/root/reference/alice"
    assume(new java.io.File(path).exists())
    val chunks = GraftIO.readChunks(spark, path).collect()
    assert(chunks.length == 1)
    assert(chunks(0)._2.length == 147699 || chunks(0)._2.nonEmpty)
    // chunk-scan word count == line-scan word count (chunking never splits
    // mid-token in the line reader for this corpus)
    import spark.implicits._
    val viaChunks = Jobs.wordCount(GraftIO.readChunks(spark, path).map(_._2)).collect().toMap
    val viaLines = Jobs.wordCount(GraftIO.readText(spark, path)).collect().toMap
    assert(viaChunks == viaLines)
  }

  test("typed Aggregator fast path: avg and top-k with mergeable buffers") {
    import spark.implicits._
    val ds = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
    val avgAgg = new Aggregators.AvgAggregator().toColumn
    val got = ds.groupByKey(_._1).mapValues(_._2).agg(avgAgg).collect().toMap
    val expected = Tables.orders(spark, sf001)
      .groupBy(col("o_custkey")).agg(avg(col("o_totalprice")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9) }

    val top2 = new Aggregators.TopKAggregator(2).toColumn
    val t = ds.groupByKey(_._1).mapValues(_._2).agg(top2).collect().toMap
    val naive = ds.collect().groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).sorted(Ordering[Double].reverse).take(2).toSeq
    }
    assert(t == naive)

    // binary-insert path at larger k, with duplicates and both insert
    // directions (reduce order and merge order)
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(500)(rng.nextInt(100).toDouble)
    val agg = new Aggregators.TopKAggregator(50)
    val viaReduce = vals.foldLeft(agg.zero)(agg.reduce)
    val halves = vals.splitAt(250)
    val viaMerge = agg.merge(
      halves._1.foldLeft(agg.zero)(agg.reduce),
      halves._2.foldLeft(agg.zero)(agg.reduce))
    val want = vals.sorted(Ordering[Double].reverse).take(50)
    assert(viaReduce == want && viaMerge == want)
  }
}
