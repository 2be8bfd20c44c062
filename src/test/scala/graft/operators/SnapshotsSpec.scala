package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot-diff laws on hand-written snapshots (spec-truth, not the
  * q200 builder). */
class SnapshotsSpec extends SparkSpec {

  test("classification: added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3"))
      .toDF("url", "content_md5")
    val neu = Seq(("u1", "h1"), ("u2", "HX"), ("u4", "h4"))
      .toDF("url", "content_md5")
    val got = Snapshots.crawlDiff(old, neu).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u1" -> "unchanged", "u2" -> "changed",
      "u3" -> "removed", "u4" -> "added"), got.toString)
  }

  test("host rollup: exact per-mille, NULL when nothing re-observed") {
    import spark.implicits._
    val diff = Seq(
      ("https://a.com/1", "changed"), ("https://a.com/2", "unchanged"),
      ("https://a.com/3", "unchanged"), ("https://a.com/4", "added"),
      ("https://b.com/1", "added"), ("https://b.com/2", "removed"))
      .toDF("url", "class")
    val got = Snapshots.crawlDiffByHost(diff)
      .orderBy(col("host")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5))).toList
    assert(got == List(
      ("a.com", 1L, 0L, 1L, 2L, 333L),
      ("b.com", 1L, 1L, 0L, 0L, -1L)), got.toString)
  }

  private def classesOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("incremental fold law: disjoint batches close to the one-shot diff, any order") {
    import spark.implicits._
    val old = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3"), ("u5", "h5"))
      .toDF("url", "content_md5")
    val neu = Seq(("u1", "h1"), ("u2", "HX"), ("u4", "h4"), ("u5", "h5"))
      .toDF("url", "content_md5")
    val oneShot = classesOf(Snapshots.crawlDiff(old, neu))
    val batches = Seq(
      Seq(("u1", "h1")), Seq(("u2", "HX"), ("u4", "h4")),
      Seq(("u5", "h5"))).map(_.toDF("url", "content_md5")
      .withColumn("fetch_day", lit("2026-02-01").cast("date")))
    def fold(bs: Seq[org.apache.spark.sql.DataFrame]) = classesOf(
      Snapshots.snapshotClose(
        bs.foldLeft(Snapshots.snapshotInit(old))(
          Snapshots.snapshotAdmitBatch)))
    assert(fold(batches) == oneShot)
    assert(fold(batches.reverse) == oneShot)
  }

  test("within-batch duplicate urls collapse to one row (latest fetch wins) in both folds") {
    import spark.implicits._
    val old = Seq(("u", "h0")).toDF("url", "content_md5")
    val dupBatch = Seq(("u", "hA", "2026-02-01"), ("u", "hB", "2026-02-02"))
      .toDF("url", "content_md5", "d")
      .withColumn("fetch_day", col("d").cast("date")).drop("d")
    val st = Snapshots.snapshotAdmitBatch(Snapshots.snapshotInit(old), dupBatch)
    val rows = st.collect()
    assert(rows.length == 1, s"state must stay url-unique: ${rows.toList}")
    assert(rows.head.getString(2) == "hB", "latest fetch_day wins")
    val ns = null.asInstanceOf[String]
    val dupResp = Seq(
      ("u", 304, ns, ns, ns, "2026-02-01"),
      ("u", 200, "hN", ns, ns, "2026-02-02"))
      .toDF("url", "status", "content_md5", "etag", "last_modified", "d")
      .withColumn("fetch_day", col("d").cast("date")).drop("d")
    val state = Seq(("u", "h0", "2026-01-01", ns, ns))
      .toDF("url", "content_md5", "lf", "etag", "last_modified")
      .withColumn("last_fetch", col("lf").cast("date")).drop("lf")
    val merged = Snapshots.revalidateMerge(state, dupResp).collect()
    assert(merged.length == 1 && merged.head.getString(1) == "hN" &&
      merged.head.getString(5) == "replaced", merged.toList.toString)
  }

  test("revalidateMerge: 304 keeps content and refreshes, 200 replaces AND clears absent validators, failures change nothing") {
    import spark.implicits._
    val day = java.sql.Date.valueOf("2026-02-06")
    val state = Seq(
      ("u1", "h1", "2026-01-01", "\"e1\"", "lm1"),
      ("u2", "h2", "2026-01-02", "\"e2\"", null),
      ("u3", "h3", "2026-01-03", "\"e3\"", "lm3"),
      ("u4", "h4", "2026-01-04", null, null))
      .toDF("url", "content_md5", "last_fetch0", "etag", "last_modified")
      .withColumn("last_fetch", col("last_fetch0").cast("date"))
      .drop("last_fetch0")
    val responses = Seq(
      ("u1", 304, null, "\"e1b\"", null),        // 304 w/ updated etag
      ("u2", 304, null, null, null),              // 304 w/o validators
      ("u3", 200, "hX", null, "lmX"),             // 200 clears etag
      ("u4", 503, null, null, null))              // failure
      .toDF("url", "status", "content_md5", "etag", "last_modified")
      .withColumn("fetch_day", lit("2026-02-06").cast("date"))
    val got = Snapshots.revalidateMerge(state, responses)
      .collect().map(r => r.getString(0) -> ((r.getString(1),
        r.getDate(2), r.getString(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("u1") == (("h1", day, "\"e1b\"", "lm1", "revalidated")))
    assert(got("u2") == (("h2", day, "\"e2\"", null, "revalidated")))
    assert(got("u3") == (("hX", day, null, "lmX", "replaced")))
    assert(got("u4") == (("h4", java.sql.Date.valueOf("2026-01-04"),
      null, null, "failed")))
  }

  test("incremental fold: refetch across batches — last fold's hash wins") {
    import spark.implicits._
    val old = Seq(("u1", "h1")).toDF("url", "content_md5")
    val b1 = Seq(("u1", "h1")).toDF("url", "content_md5")
      .withColumn("fetch_day", lit("2026-02-01").cast("date"))
    val b2 = Seq(("u1", "HX")).toDF("url", "content_md5")
      .withColumn("fetch_day", lit("2026-02-02").cast("date"))
    val st = Snapshots.snapshotAdmitBatch(
      Snapshots.snapshotAdmitBatch(Snapshots.snapshotInit(old), b1), b2)
    assert(classesOf(Snapshots.snapshotClose(st)) == Map("u1" -> "changed"))
    val row = st.collect().head
    assert(row.getDate(3).toString == "2026-02-02") // latest fetch kept
  }
}
