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

  test("frequentValues: one-pass multi-column MG laws; a dominant value is found") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // col a: 40% one hot value + tail; col b: uniform
    val rows = (1 to 2000).map(i =>
      (if (i % 5 < 2) 999L else i.toLong, (i % 37).toLong)).toDF("a", "b")
    val got = Profiler.frequentValues(rows, Seq("a", "b"), k = 15, topPerCol = 5)
      .collect()
    assert(got.length == 10)
    got.foreach { r =>
      (3 until r.length).foreach(i =>
        assert(r.getBoolean(i), s"law col $i false for ${r.getString(0)}=${r.getString(1)}"))
    }
    // the hot value must be the top row of column a with its exact count
    val topA = got.filter(_.getString(0) == "a").head
    // 800 hot-slot rows + row i=999 itself (999 % 5 = 4 puts it on the
    // tail branch, where a = i = 999 collides with the hot value)
    assert(topA.getString(1) == "999" && topA.getLong(2) == 801L)
  }

  // hi·2^40 + lo reassembly of the int64-safe pair panel
  private def reassemble(hi: Long, lo: Long): BigInt =
    BigInt(hi) * BigInt(1099511627776L) + BigInt(lo)

  test("columnCorrelation: signs and exact covariance numerators match a driver replay") {
    import spark.implicits._
    val rows = (1 to 500).map { i =>
      val x = (i % 97).toDouble / 7.0
      (x, 2.0 * x + 1.0, -3.0 * x, (i % 13).toDouble) // pos, neg, ~independent
    }.toDF("x", "y", "z", "w")
    val got = Profiler.columnCorrelation(rows, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((reassemble(r.getLong(7), r.getLong(8)), r.getLong(8), r.getBoolean(9)))).toMap
    assert(got(("x", "y"))._3 && !got(("x", "z"))._3 && !got(("y", "z"))._3)
    // lo is always a non-negative 40-bit residue, even for negative values
    got.values.foreach { case (_, lo, _) =>
      assert(lo >= 0L && lo < 1099511627776L) }
    // exact replay of the scaled-integer arithmetic for one pair
    val scale = 1048576.0
    val data = (1 to 500).map { i =>
      val x = (i % 97).toDouble / 7.0
      (math.floor(x * scale).toLong, math.floor((2.0 * x + 1.0) * scale).toLong)
    }
    val n = BigInt(data.size)
    val sa = BigInt(data.map(_._1).sum)
    val sb = BigInt(data.map(_._2).sum)
    val sab = data.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    assert(got(("x", "y"))._1 == sab * n - sa * sb)
    // the anti-correlated pair's NEGATIVE numerator reassembles exactly too
    val dataZ = (1 to 500).map { i =>
      val x = (i % 97).toDouble / 7.0
      (math.floor(x * scale).toLong, math.floor(-3.0 * x * scale).toLong)
    }
    val saz = BigInt(dataZ.map(_._1).sum); val sbz = BigInt(dataZ.map(_._2).sum)
    val sabz = dataZ.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val expZ = sabz * n - saz * sbz
    assert(expZ < 0 && got(("x", "z"))._1 == expZ)
  }

  test("correlation shard fold == one-pass panel, bit for bit (q145 law)") {
    import spark.implicits._
    val rows = (1 to 800).map { i =>
      val x = (i % 89).toDouble / 3.0
      (i.toLong, x, -1.5 * x + 40.0, (i % 31).toDouble)
    }.toDF("id", "x", "y", "w")
    val cols = Seq("x", "y", "w")
    val onePass = Profiler.columnCorrelation(rows, cols).collect().toSeq
    // persist the shard states through a real parquet round-trip — the
    // stored-fold claim is about the on-disk form, not the in-plan one
    val dir = java.nio.file.Files.createTempDirectory("corr_shards").toString
    Profiler.correlationShardSums(rows, cols, col("id"), shards = 7)
      .write.mode("overwrite").parquet(dir)
    val folded = Profiler.correlationFromSums(spark.read.parquet(dir), cols)
      .collect().toSeq
    assert(folded == onePass)
  }

  test("encodingAudit: each damage class fires on its planted corruption; clean and legit-accented text pass") {
    import spark.implicits._
    val clean = "a perfectly ordinary sentence with nothing wrong in it"
    val replaced = "broken byte here � and another � end"
    val control = "bell\u0007 and a C1 stray\u0085 inside"
    // double-decoded UTF-8: 'é' read as Latin-1 becomes 'Ã©' — a short
    // text full of them blows the 1/1000 rate
    val mojibake = "cafÃ© naÃ¯ve rÃ©sumÃ©"
    // one genuine 'Ã' in long-enough Portuguese-ish text stays ok
    val legit = "informação " + ("x" * 1200) + " SÃo Paulo"
    val docs = Seq((1L, clean), (2L, replaced), (3L, control),
      (4L, mojibake), (5L, legit)).toDF("doc_id", "text")
    val got = graft.operators.Profiler.encodingAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(got(1L)._5 && got(1L)._2 == 0L && got(1L)._3 == 0L && got(1L)._4 == 0L)
    assert(got(2L)._2 == 2L && !got(2L)._5, s"replacement: ${got(2L)}")
    assert(got(3L)._3 == 2L && !got(3L)._5, s"control: ${got(3L)}")
    assert(got(4L)._4 == 4L && !got(4L)._5, s"mojibake: ${got(4L)}")
    assert(got(5L)._4 == 1L && got(5L)._5, s"legit accented text must pass: ${got(5L)}")
    // tab/newline/CR are NOT control damage
    val ws = Seq((6L, "tabs\tand\nnewlines\rare fine")).toDF("doc_id", "text")
    val g6 = graft.operators.Profiler.encodingAudit(ws, "doc_id", "text").collect().head
    assert(g6.getLong(3) == 0L && g6.getBoolean(5), s"whitespace flagged: $g6")
  }

  test("sourceConcentration: exact ppm HHI on planted counts; monopoly degenerates to 1 effective source") {
    import spark.implicits._
    // counts 5/3/2 of 10: shares 500000/300000/200000 ppm,
    // HHI = 25+9+4 (x10^10) = 380_000_000_000, effective = 10^12 div HHI = 2
    val docs = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val got = graft.operators.Profiler.sourceConcentration(docs, "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got("a") == (5L, 500000L, 10L, 3L, 380000000000L, 2L), s"${got("a")}")
    assert(got("b")._2 == 300000L && got("c")._2 == 200000L)
    // monopoly: one source owns everything -> share 10^6, HHI 10^12, eff 1
    val mono = (1L to 7L).map(i => (i, "only")).toDF("doc_id", "source")
    val m = graft.operators.Profiler.sourceConcentration(mono, "source")
      .collect().head
    assert(m.getLong(2) == 1000000L && m.getLong(5) == 1000000000000L &&
      m.getLong(6) == 1L, s"$m")
    // truncating shares still sum <= 10^6 and HHI stays LONG-bounded:
    // 7 keys of 1 doc each over 7 docs -> share_ppm 142857, sum 999999
    val seven = (1L to 7L).map(i => (i, s"s$i")).toDF("doc_id", "source")
    val sv = graft.operators.Profiler.sourceConcentration(seven, "source")
      .collect()
    assert(sv.forall(_.getLong(2) == 142857L))
    assert(sv.head.getLong(5) == 7L * 142857L * 142857L)
  }

  test("columnCorrelation: an all-NULL profiled column emits NULL hi/lo like the oracle, never a false overflow raise (r12 review)") {
    import spark.implicits._
    val rows = Seq((1.0, 2.0), (3.0, 4.0), (5.0, 6.0))
      .map { case (a, b) => (a, b, Option.empty[java.lang.Double]) }
      .toDF("a", "b", "c")
    val got = graft.operators.Profiler
      .columnCorrelation(rows, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // the (a, b) pair is fully populated and must still be computed
    val ab = got(("a", "b"))
    assert(!ab.isNullAt(5) && !ab.isNullAt(7), s"ab pair must compute: $ab")
    // pairs touching the all-NULL column emit NULL hi/lo (the DuckDB
    // oracle's behavior), not raise_error
    for (k <- Seq(("a", "c"), ("b", "c"))) {
      val r = got(k)
      assert(r.isNullAt(5) && r.isNullAt(7),
        s"$k must be NULL for an all-null column: $r")
    }
  }

  test("sourceConcentrationFromCounts: per-shard count folds equal the one-shot verdict (q94/q145 discipline)") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c"))
      .toDF("doc_id", "source")
    val oneShot = graft.operators.Profiler
      .sourceConcentration(docs, "source").orderBy("k").collect().toSeq
    // three arbitrary ingest shards, counts persisted per shard, folded
    val shards = Seq(docs.filter($"doc_id" <= 50), docs.filter(
      $"doc_id" > 50 && $"doc_id" <= 120), docs.filter($"doc_id" > 120))
      .map(d => graft.operators.Profiler.sourceCounts(d, "source"))
    val folded = graft.operators.Profiler
      .sourceConcentrationFromCounts(shards.reduce(_ unionByName _))
      .orderBy("k").collect().toSeq
    assert(folded == oneShot)
  }
}
