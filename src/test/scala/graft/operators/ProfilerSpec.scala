package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value tests for the one-pass profiler on crafted micro-data (nulls,
  * mixed types); the declared q100 oracle covers the full documents
  * table against DuckDB.
  */
class ProfilerSpec extends SparkSpec {

  test("profile: exact stats and null accounting on crafted data") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("bb")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("ccc"))).toDF("num", "s")
    val rows = Profiler.profile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = rows("num")
    assert(num.getLong(1) == 4 && num.getLong(2) == 1) // n_rows, n_nulls
    assert(num.getString(4) == "1" && num.getString(5) == "3") // min, max
    assert(num.getDouble(6) == 1.0) // lengths of "3","1","3"
    val s = rows("s")
    assert(s.getLong(2) == 1)
    assert(s.getString(4) == "a" && s.getString(5) == "ccc")
    assert(s.getDouble(6) == 2.0) // 2+1+3 over 3
  }

  test("profile estimate agrees with exactDistincts within the 1%-rsd law") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val cols = Seq("doc_id", "lang", "source")
    val est = Profiler.profile(docs, cols)
      .select("col_name", "n_distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Profiler.exactDistincts(docs, cols)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cols.foreach { c =>
      assert(math.abs(est(c) - exact(c)) <= math.max(1L, exact(c) / 20),
        s"$c: est=${est(c)} exact=${exact(c)}")
    }
  }

  test("profile runs in one aggregation pass (no distinct Expand)") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val plan = Profiler.profile(docs, Seq("doc_id", "lang", "source", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profiler must not Expand the scan:\n$plan")
  }

  test("integrityAudit: orphan counting incl. null FKs; clean edge reports zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk") // 9 -> orphan, null -> orphan of record
    val clean = Seq(Some(3L), Some(3L)).toDF("fk")
    val got = Profiler.integrityAudit(Seq(
      ("dirty", child, "fk", parent, "pid"),
      ("clean", clean, "fk", parent, "pid")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("dirty") == ((5L, 2L, 4000L)), s"got ${got("dirty")}")
    assert(got("clean") == ((2L, 0L, 0L)))
  }
}
