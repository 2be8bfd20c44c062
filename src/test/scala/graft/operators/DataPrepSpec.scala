package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior tests for the data-prep operators on micro-data; value-level
  * parity is the driver's DuckDB oracle gate.
  */
class DataPrepSpec extends SparkSpec {

  test("hash sample is deterministic and roughly the target fraction") {
    def ids() = graft.SparkEntry.queries("q61_hash_sample")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    val a = ids()
    assert(a == ids(), "same sample on every run")
    val total = graft.sources.Tables.load(spark, sf001, "documents").count()
    val frac = a.length.toDouble / total
    assert(frac > 0.04 && frac < 0.2, s"~10% expected, got $frac of $total")
  }

  test("source quota keeps at most K docs per source and is hash-ordered") {
    val rows = graft.SparkEntry.queries("q62_source_quota")(spark, sf001)
      .groupBy("source").count().collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= 50, s"source ${r.getString(0)}"))
  }

  test("sequence packing: pack ids are non-decreasing and bounded by total/budget") {
    val rows = graft.SparkEntry.queries("q63_seq_packing")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        "pack_id non-decreasing in doc order")
      val totalTokens = sorted.map(_._3.toLong).sum
      assert(sorted.last._4 == ((totalTokens - sorted.last._3) / 2048).toInt)
    }
  }

  test("int8 quantization stays in range and hits 127 or -127 at each vector's max") {
    val rows = graft.SparkEntry.queries("q65_embed_quantize")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, q) => q >= -128 && q <= 127 })
    // the max-|x| dim of each vector quantizes to ±127 (or -128→clamped)
    val perVec = rows.groupBy(_._1).map { case (_, qs) => qs.map(_._2).map(math.abs).max }
    assert(perVec.forall(m => m == 127))
  }

  test("PII redaction masks planted emails and digit runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice@example.com or bob.smith+x@mail.co today"),
      (2L, "card 12345678 expires soon; short 123 stays"),
      (3L, "nothing to redact here")).toDF("doc_id", "text")
    val out = docs.select(
      regexp_count(col("text"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
        .as("n_emails"),
      regexp_count(col("text"), lit("\\d{4,}")).as("n_nums"),
      regexp_replace(
        regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
        "\\d{4,}", "[NUM]").as("red"))
      .collect()
    assert(out(0).getAs[Int]("n_emails") == 2 && out(0).getAs[String]("red").contains("[EMAIL]"))
    assert(out(1).getAs[Int]("n_nums") == 1 && out(1).getAs[String]("red").contains("[NUM] expires"))
    assert(out(1).getAs[String]("red").contains("short 123 stays"))
    assert(out(2).getAs[Int]("n_emails") == 0 && out(2).getAs[Int]("n_nums") == 0)
  }

  test("public API parameter validation fails loudly, not silently") {
    import spark.implicits._
    val df = Seq((1L, "text")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DataPrep.chunkDocs(df, "doc_id", "text", chunkLen = 5, step = 6)
    }
    intercept[IllegalArgumentException] {
      DataPrep.chunkDocs(df, "doc_id", "text", chunkLen = 0, step = 1)
    }
    intercept[IllegalArgumentException] {
      DataPrep.splitAssign(df, "doc_id", trainPct = 90, valPct = 10) // no test share
    }
    intercept[IllegalArgumentException] {
      graft.plans.TopKPerKey.topK(df, Seq(col("doc_id")), Seq.empty, 3) // no order
    }
    intercept[IllegalArgumentException] {
      graft.plans.TopKPerKey.topK(df, Seq(col("doc_id")), Seq(col("text")), 0) // k=0
    }
  }

  test("split assignment is stable, exhaustive, and roughly 80/10/10") {
    def splits() = graft.SparkEntry.queries("q86_split_assign")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = splits()
    assert(a == splits(), "same assignment on every run")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val n = a.size.toDouble
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95,
      s"~80% train expected, got $counts of $n")
  }

  test("doc chunking: offsets tile the text with the declared overlap") {
    import spark.implicits._
    val text = "abcdefghijklmnopqrstuvwxyz" // 26 chars
    val rows = DataPrep.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", chunkLen = 10, step = 7)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // starts 1,8,15,22 (1-based); lens 10,10,10,5 (tail truncated)
    assert(rows.toSeq == Seq((0, 1L, 10L), (1, 8L, 10L), (2, 15L, 10L), (3, 22L, 5L)))
    // every char position is covered; consecutive chunks overlap by 3
    assert(rows.last._2 + rows.last._3 - 1 == 26)
    rows.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0)._2 + 10 - p(1)._2 == 3)
    }
    // empty text yields no chunks
    assert(DataPrep.chunkDocs(Seq((2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", 10, 7).count() == 0)
  }

  test("decontamination drops exactly the docs sharing a 4-gram with the eval set") {
    import spark.implicits._
    val survivors = graft.SparkEntry.queries("q79_decontaminate")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    // no eval doc survives into the training output
    assert(survivors.forall(_ % 97 != 0))
    // independent recomputation on RAW gram strings (no xxhash64): the
    // hashed join must agree — also proves no collision-induced drift here
    val grams = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 3), i -> concat_ws(' ', slice(t, i, 4)))")).as("g"))
    val evalG = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val dropped = grams.filter(col("doc_id") % 97 =!= 0).join(evalG, "g")
      .select("doc_id").distinct().as[Long].collect().toSet
    val train = graft.sources.Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") % 97 =!= 0).select("doc_id").as[Long].collect().toSet
    assert(survivors == train -- dropped,
      s"survivors=${survivors.size} train=${train.size} dropped=${dropped.size}")
  }

  test("source mix weights are a probability distribution ordered like sqrt(tokens)") {
    val rows = graft.SparkEntry.queries("q80_source_mix_weights")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9, s"sum=${rows.map(_._3).sum}")
    // temperature 0.5 preserves token-count order but compresses ratios
    val byTok = rows.sortBy(_._2)
    assert(byTok.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    val (minW, maxW) = (byTok.head, byTok.last)
    assert(maxW._3 / minW._3 < maxW._2.toDouble / minW._2,
      "sqrt temperature must compress the spread")
  }

  test("epoch mix: per-group copies sum to floor(weight*target) exactly; rerun-stable") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf001)
    val target = 1000L
    val mix = DataPrep.epochMix(docs, "doc_id", "text", "source", target)
    val wts = DataPrep.mixWeights(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val perGroup = mix.groupBy(col("source")).agg(sum(col("n_copies")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perGroup.foreach { case (g, s) =>
      val quota = math.floor(wts(g) * target).toLong
      assert(s === quota, s"group $g contributed $s copies, quota $quota")
    }
    // a tiny target downsamples: quota < n_docs → some docs get 0 copies
    val tiny = DataPrep.epochMix(docs, "doc_id", "text", "source", 20L)
    assert(tiny.filter(col("n_copies") === 0).count() > 0)
    // deterministic under repartitioning: same counts bit-for-bit
    val again = DataPrep.epochMix(docs.repartition(7), "doc_id", "text",
        "source", target)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val first = mix.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(again === first)
  }

  test("md5BucketRank equals the naive per-group window, including cross-bucket order") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"))
    val naiveW = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = docs.withColumn("rk", row_number().over(naiveW).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // hexChars=1 → 16 buckets: at 6k docs every bucket is populated, so the
    // cross-bucket offset arithmetic is exercised for real, not vacuously
    val bucketed = DataPrep.md5BucketRank(docs, "source", "doc_id", "rk", hexChars = 1)
      .select("doc_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bucketed === naive)
    // default 4096 buckets (mostly size 0/1 at this SF — the degenerate end)
    val fine = DataPrep.md5BucketRank(docs, "source", "doc_id", "rk")
      .select("doc_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fine === naive)
  }

  test("two-phase decontamination keeps exactly the exact-form set, incl. undersized bloom") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val exact = DataPrep.decontaminate(train, evalSet, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // generous sizing: FPs are possible, misses are not → sets equal
    val two = DataPrep.decontaminateTwoPhase(train, evalSet, "doc_id", "text",
        n = 4, expectedItems = 100000L, numBits = 1600000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(two == exact)
    // DELIBERATELY undersized bloom: many false positives → many suspects
    // → the exact confirm must still weed every one of them
    val tiny = DataPrep.decontaminateTwoPhase(train, evalSet, "doc_id", "text",
        n = 4, expectedItems = 50L, numBits = 512L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tiny == exact, "confirm stage must cancel bloom false positives")
  }

  test("md5BucketRank under skew: one giant group + singletons still equals the naive window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 5,000-row hot group, 50 singleton groups, plus an empty-ish group of 2
    val rows = (1L to 5000L).map(i => (i, "hot")) ++
      (6000L to 6050L).map(i => (i, s"cold$i")) ++ Seq((7000L, "pair"), (7001L, "pair"))
    val df = rows.toDF("id", "grp").repartition(13)
    val naiveW = Window.partitionBy(col("grp"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val naive = df.withColumn("rk", row_number().over(naiveW).cast("long"))
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hexChars=8 is the ADVICE r7 regression: an int-typed bucket cast
    // overflows at 0x80000000+ to NULL and the offsets equi-join silently
    // dropped ~half the rows — the long-typed bucket must lose none
    Seq(1, 2, 3, 8).foreach { hx =>
      val got = DataPrep.md5BucketRank(df, "grp", "id", "rk", hexChars = hx)
        .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === naive, s"hexChars=$hx")
    }
  }

  test("hexPrefixBucket: long-typed, never null, validated width") {
    import spark.implicits._
    // md5 prefixes at width 8 are uniform over [0, 2^32): ~half exceed
    // Int.MaxValue; none may become null and all must be in range
    val b = (1L to 2000L).toDF("id")
      .select(DataPrep.hexPrefixBucket(md5(col("id").cast("string")), 8).as("b"))
    assert(b.filter(col("b").isNull).count() == 0)
    assert(b.filter(col("b") > Int.MaxValue.toLong).count() > 0,
      "sample must actually exercise the int-overflow range")
    assert(b.filter(col("b") < 0 || col("b") >= (1L << 32)).count() == 0)
    intercept[IllegalArgumentException] {
      DataPrep.hexPrefixBucket(col("x"), 0)
    }
    intercept[IllegalArgumentException] {
      DataPrep.hexPrefixBucket(col("x"), 16)
    }
  }

  test("q91 plan: no raw-row window partitioned by group alone (two-level ranking)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = graft.SparkEntry.queries("q91_epoch_mix")(spark, sf001)
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      if (w.partitionSpec.size == 1) {
        // a single-key window may only rank the group×bucket COUNTS table
        // (an aggregate, ≤ groups×4096 rows) — never the raw corpus rows
        val overAgg = w.child.collectFirst { case a: Aggregate => a }.isDefined
        assert(overAgg,
          s"window over ${w.partitionSpec} must read an aggregate, not raw rows:\n$w")
      }
    }
    // and the raw-row ranking window partitions by (group, bucket)
    assert(windows.exists(_.partitionSpec.size == 2))
  }

  test("q62 plan: rank-limit pushdown bounds the per-source sort before the shuffle") {
    val df = graft.SparkEntry.queries("q62_source_quota")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    // Spark's InferWindowGroupLimit turns the rn <= K filter into a
    // partial top-K per map task: each task retains ≤ K rows per source
    // BEFORE the exchange, so the per-source sort is over ≤ K×tasks rows
    // no matter how large the source — the documented waiver for keeping
    // the plain window here (vs q91's two-level ranking, where no rank
    // limit exists to push down).
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected partial rank-limit pushdown:\n$plan")
  }

  test("md5BucketCumsum equals the naive per-group window at every hexChars") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // adversarial-ish: one hot group, two tiny ones, weights incl. zeros
    val rows = (1 to 400).map(i =>
      (i.toLong, if (i <= 360) "hot" else if (i <= 380) "warm" else "cold",
        if (i % 7 == 0) 0L else rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "g", "w")
    val naive = df.withColumn("cw",
      sum(col("w")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g"))
        .orderBy(md5(col("id").cast("string")), col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("id", "cw").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (hexChars <- Seq(1, 2, 3, 8)) {
      val got = DataPrep.md5BucketCumsum(df, "g", "id", "w", "cw", hexChars)
        .select("id", "cw").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"hexChars=$hexChars")
    }
  }

  test("weighted systematic sample: PPS selection laws + rerun stability") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i =>
      (i.toLong, s"s${i % 4}", rnd.nextInt(400).toLong)) ++
      Seq((501L, "s0", 0L), (502L, "s1", 5000L)) // zero-weight + giant
    val df = rows.toDF("id", "g", "w")
    val step = 1000L
    val picked = DataPrep.weightedSystematicSample(df, "g", "id", "w", step)
      .select("id").collect().map(_.getLong(0)).toSet
    // a zero-weight row is never selected; a row with weight >= step always is
    assert(!picked.contains(501L))
    assert(picked.contains(502L))
    // sample size concentrates at total/step: off by at most one per group
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val expected = totals.values.map(_ / step).sum
    assert(math.abs(picked.size - expected) <= totals.size,
      s"got ${picked.size}, expected ~$expected")
    // partitioning-independent: same selection from a different layout
    val repicked = DataPrep.weightedSystematicSample(
      df.repartition(13, col("w")), "g", "id", "w", step)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(repicked == picked)
  }

  test("corpusDiff classifies all four statuses; bucketed snapshots join with zero exchange") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = DataPrep.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))

    // stored-snapshot form: both sides bucketed by id -> no shuffle
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val docs = graft.sources.Tables.load(spark, sf001, "documents")
      graft.plans.ScaleOps.writeBucketed(
        docs.filter(col("doc_id") % 11 =!= 0), "doc_id", 8, "snap_v1")
      graft.plans.ScaleOps.writeBucketed(
        docs.filter(col("doc_id") % 13 =!= 0), "doc_id", 8, "snap_v2")
      val diff = DataPrep.corpusDiff(
        spark.table("snap_v1"), spark.table("snap_v2"), "doc_id", "text")
      diff.collect()
      val plan = diff.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot diff must be zero-exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS snap_v1")
      spark.sql("DROP TABLE IF EXISTS snap_v2")
    }
  }

  test("PPS admission: chained batches == one-shot over the concatenated line") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val batches = (0 until 3).map { b =>
      ((1 to 160).map(i =>
        (b * 1000L + i, s"s${i % 3}", rnd.nextInt(700).toLong)))
    }
    val step = 1000L

    // chained: each batch laid after the line the previous ones consumed
    var line = Map.empty[String, Long]
    val chained = scala.collection.mutable.Set.empty[Long]
    batches.foreach { rows =>
      val df = rows.toDF("id", "g", "w")
      chained ++= DataPrep.ppsAdmitBatch(df, line, "g", "id", "w", step)
        .select("id").collect().map(_.getLong(0))
      val inc = DataPrep.ppsGroupTotals(df, "g", "w")
      line = inc.foldLeft(line) { case (m, (g, w)) =>
        m.updated(g, m.getOrElse(g, 0L) + w) }
    }

    // one-shot reference: driver-side replay of the exact line — rows in
    // (batch, md5(id), id) order, keep iff the span crosses a step multiple
    val md5hex = (id: Long) => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val oneShot = batches.zipWithIndex
      .flatMap { case (rows, b) => rows.map { case (id, g, w) => (b, id, g, w) } }
      .groupBy(_._3)
      .flatMap { case (_, rows) =>
        var cw = 0L
        rows.sortBy { case (b, id, _, _) => (b, md5hex(id), id) }.flatMap {
          case (_, id, _, w) =>
            val before = cw; cw += w
            if (cw / step > before / step) Some(id) else None
        }
      }.toSet
    assert(chained.toSet == oneShot)

    // continuity really exercised: some admitted row must cross a step
    // boundary that its OWN batch-local cumsum does not cross (i.e. the
    // base line mattered), otherwise the law degenerates to 3 independent
    // samples
    val independent = batches.flatMap { rows =>
      DataPrep.ppsAdmitBatch(rows.toDF("id", "g", "w"),
        Map.empty, "g", "id", "w", step)
        .select("id").collect().map(_.getLong(0))
    }.toSet
    assert(chained.toSet != independent, "test data too easy: base line never mattered")

    // the line equals the full totals after all batches (keys carry the
    // collision-free domainKey encoding: "v:"+group, "n" for null)
    val full = batches.flatten.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      .toMap.map { case (g, w) => s"v:$g" -> w }
    assert(line == full)
    // a raw-keyed (non-encoded) base map is refused loudly, not read as 0
    val err = intercept[IllegalArgumentException] {
      DataPrep.ppsAdmitBatch(batches.head.toDF("id", "g", "w"),
        Map("s0" -> 100L), "g", "id", "w", step)
    }
    assert(err.getMessage.contains("domainKey-encoded"))
  }

  test("memorizationAudit: contained, partial, and novel generations score exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six")).toDF("doc_id", "text")
    val gen = Seq(
      // fully contained: every 4-gram appears in corpus doc 100
      (1L, "alpha beta gamma delta epsilon"),
      // novel: no 4-gram overlaps
      (2L, "red green blue cyan magenta"),
      // partial: first 4-gram contained, second not
      (3L, "one two three four nine")).toDF("doc_id", "text")
    val got = DataPrep.memorizationAudit(gen, corpus, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 2L, 10000L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((2L, 1L, 5000L)))
  }

  test("trailingLoop: planted loops detected with the exact repeat length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c the end the end"),        // trailing "the end" x2 -> 2
      (2L, "x y x y x y"),                  // "x y" x3 -> 2 (r=3 shifts)
      (3L, "go go go go"),                  // r=1 and r=2 -> max 2
      (4L, "all distinct tokens here now"), // no loop
      (5L, "w")                             // too short for any r
    ).toDF("doc_id", "text")
    val got = TextAnalysis.trailingLoop(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((2, true)), s"got ${got(1L)}")
    assert(got(2L) == ((2, true)))
    assert(got(3L) == ((2, true)))
    assert(got(4L) == ((0, false)))
    assert(got(5L) == ((0, false)))
  }

  test("cascadeAccounting: ledger telescopes, first-fail attribution matches brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1 to 200).map(i => (i, i % 7, i % 5)).toDF("id", "a", "b")
    val stages = Seq(
      "a_not_zero" -> (col("a") =!= 0),
      "b_not_zero" -> (col("b") =!= 0),
      "id_small" -> (col("id") <= 150))
    val got = DataPrep.cascadeAccounting(rows, stages)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // telescoping: n_out(k) == n_in(k+1); n_in(0) == total
    assert(got.head._3 == 200)
    got.sliding(2).foreach { case Array(x, y) => assert(x._5 == y._3); case _ => }
    // brute-force first-fail attribution
    val data = (1 to 200).map(i => (i, i % 7, i % 5))
    val d0 = data.count(_._2 == 0)
    val d1 = data.count(t => t._2 != 0 && t._3 == 0)
    val d2 = data.count(t => t._2 != 0 && t._3 != 0 && t._1 > 150)
    assert(got.map(_._4).toSeq == Seq(d0, d1, d2))
    assert(got.last._5 == 200 - d0 - d1 - d2)
    assert(got.map(_._2).toSeq == stages.map(_._1))
  }

  test("domainCap keeps exactly min(k, size) md5-first docs per domain, rerun-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 130).map(i => (i.toLong, "mid")) ++
      (131 to 135).map(i => (i.toLong, "tiny"))).toDF("doc_id", "source")
    val kept = DataPrep.domainCap(docs, "source", "doc_id", k = 10)
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("big" -> 10, "mid" -> 10, "tiny" -> 5), s"$bySrc")
    // the kept set is the naive single-window replay, exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = docs.withColumn("r", row_number().over(w))
      .filter(col("r") <= 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(kept.toSet == naive)
    // partitioning-independent
    val re = DataPrep.domainCap(docs.repartition(7), "source", "doc_id", k = 10)
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(re == naive)
  }

  test("packSequences: classes, capacities, bin fill, and oversize flagging are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    // 70 docs of ~30 tokens (class 32, cap 4), 10 of ~100 (class 128,
    // cap 1), one oversize beyond the 128-token budget
    val docs = ((1 to 70).map(i => (i.toLong, doc(25 + i % 6))) ++
      (71 to 80).map(i => (i.toLong, doc(100))) ++
      Seq((81L, doc(200)))).toDF("doc_id", "text")
    val got = DataPrep.packSequences(docs, "doc_id", "text", budget = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5)))
    assert(got.length == 81)
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(81L)._4 && byId(81L)._5 == -1L, "200-token doc must flag oversize")
    val c32 = got.filter(g => !g._4 && g._3 == 32L)
    assert(c32.length == 70)
    // capacity 128/32 = 4: bins 0..16 full, bin 17 holds the remainder 2
    val fill = c32.groupBy(_._5).view.mapValues(_.length).toMap
    assert((0L until 17L).forall(fill(_) == 4) && fill(17L) == 2, s"$fill")
    assert(c32.forall(g => g._6 >= 0 && g._6 < 4), "slot must be < capacity")
    val c128 = got.filter(g => !g._4 && g._3 == 128L)
    assert(c128.length == 10 && c128.forall(_._6 == 0L),
      "class-128 docs fill one slot per bin at budget 128")
    assert(c128.map(_._5).sorted.toSeq == (0L until 10L),
      "one bin per class-128 doc")
    // deterministic: identical assignment on rerun and repartition
    val re = DataPrep.packSequences(docs.repartition(5), "doc_id", "text",
      budget = 128L).collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSet
    assert(re == got.map(g => (g._1, g._5, g._6)).toSet)
  }

  test("packSized: non-power-of-two budget packs docs up to the budget itself (ADVICE r11)") {
    import spark.implicits._
    // budget 3000: ladder 16..2048 plus the final 3000 rung (capacity 1)
    // — docs in (2048, 3000] must PACK, not flag oversize; (3000, ...]
    // stays oversize
    val sized = Seq((1L, 100L), (2L, 2500L), (3L, 3000L), (4L, 3001L))
      .toDF("doc_id", "n_tokens")
    val got = DataPrep.packSized(sized, "doc_id", budget = 3000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L)._1 == 128L && !got(1L)._2, s"${got(1L)}")
    assert(got(2L) == ((3000L, false, got(2L)._3, 0L)) && got(2L)._3 >= 0,
      s"2500-token doc must pack in the 3000 class: ${got(2L)}")
    assert(got(3L)._1 == 3000L && !got(3L)._2, s"${got(3L)}")
    assert(got(4L) == ((-1L, true, -1L, -1L)),
      s"past-budget doc stays oversize: ${got(4L)}")
    // the two class-3000 docs occupy distinct capacity-1 bins
    assert(Set(got(2L)._3, got(3L)._3) == Set(0L, 1L), s"$got")
    // a power-of-two budget keeps the pure ladder (no duplicate rung)
    val p2 = DataPrep.packSized(Seq((1L, 2048L)).toDF("doc_id", "n_tokens"),
      "doc_id", budget = 2048L).head()
    assert(p2.getLong(2) == 2048L && !p2.getBoolean(3), p2.toString)
  }

  test("stratifiedSplit: exactly floor(n*pct/100) eval docs per stratum, disjoint, stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 130).map(i => (i.toLong, "mid")) ++
      (131 to 135).map(i => (i.toLong, "tiny"))).toDF("doc_id", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      DataPrep.stratifiedSplit(df, "source", "doc_id", pctEval = 10)
        .select("doc_id", "source", "split")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = run(docs)
    assert(got.length == 135, "every doc is assigned exactly once")
    val evalBySrc = got.filter(_._3 == "eval").groupBy(_._2).view.mapValues(_.length).toMap
    // floor(100*.1)=10, floor(30*.1)=3, floor(5*.1)=0
    assert(evalBySrc == Map("big" -> 10, "mid" -> 3), s"$evalBySrc")
    // pure function of the data: repartitioning changes nothing
    assert(run(docs.repartition(9)).toSet == got.toSet)
    // the eval prefix is the md5-first prefix (same order domainCap uses):
    // eval set == domainCap at k = floor(n*pct/100) per stratum
    val capBig = DataPrep.domainCap(docs.filter(col("source") === "big"),
      "source", "doc_id", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.filter(g => g._2 == "big" && g._3 == "eval").map(_._1).toSet == capBig)
  }

  test("tokenBudgetSelect: kept totals land in [budget, budget+max_doc), deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1 to 60).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", (5 + i % 11).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val budget = 50L
    def run(df: org.apache.spark.sql.DataFrame) =
      DataPrep.tokenBudgetSelect(df, "source", "doc_id", "n_tokens", budget)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val kept = run(docs)
    val maxDoc = 15L
    kept.groupBy(_._2).foreach { case (src, rows) =>
      val total = rows.map(_._3).sum
      assert(total >= budget && total < budget + maxDoc,
        s"$src kept $total tokens outside [$budget, ${budget + maxDoc})")
      // exactly the md5-order prefix: every kept doc STARTS under budget
      rows.foreach { case (id, _, n, cum) =>
        assert(cum - n < budget, s"doc $id starts at ${cum - n}") }
    }
    // a group under budget keeps everything
    val tiny = Seq((100L, "c", 7L), (101L, "c", 9L)).toDF("doc_id", "source", "n_tokens")
    assert(run(tiny).length == 2)
    // partitioning-independent
    assert(run(docs.repartition(7)).toSet == kept.toSet)
  }

  test("NULL group keys rank as their own stratum/domain, never silently dropped (code-review r11)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (Seq((1L, Some("a")), (2L, Some("a")), (3L, None),
      (4L, None), (5L, None), (6L, Some("null"))))
      .toDF("doc_id", "source")
    // domainCap: the NULL domain is capped like any other, not deleted
    val capped = DataPrep.domainCap(docs, "source", "doc_id", k = 2)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    val bySrc = capped.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map(Some("a") -> 2, None -> 2, Some("null") -> 1), s"$bySrc")
    // stratifiedSplit stays total: every row assigned, incl. NULL stratum
    val split = DataPrep.stratifiedSplit(docs, "source", "doc_id", pctEval = 34)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(split.length == 6, s"lost rows: ${split.toSeq}")
    assert(split.count(_._2 == "eval") == 1, // floor(3*0.34)=1 from the NULL stratum
      s"${split.toSeq}")
    // capAdmitBatch: the NULL domain and a domain NAMED "null" hold
    // separate quotas (the consumed map keys cannot collide)
    var consumed = Map.empty[String, Long]
    val b1 = DataPrep.capAdmitBatch(docs, consumed, "source", "doc_id", k = 2)
    consumed = DataPrep.domainCounts(b1, "source")
    assert(consumed == Map("v:a" -> 2L, "n" -> 2L, "v:null" -> 1L), s"$consumed")
    // a second batch of NULL-domain docs is refused: quota exhausted
    val b2 = DataPrep.capAdmitBatch(
      Seq((7L, None: Option[String])).toDF("doc_id", "source"),
      consumed, "source", "doc_id", k = 2)
    assert(b2.count() == 0, "NULL-domain quota must persist across batches")
  }

  test("cascadeAccounting: NULL predicate counts as PASS, next failing stage attributes (ADVICE r10)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // text NULL makes stage-0's length flag NULL; stage-1 is false for
    // id 2 — the doc must land in stage 1's drop count, and the SQL
    // CASE-chain replay agrees because the operator coalesces flags
    val rows = Seq((1L, Some("long enough text"), 1),
      (2L, None: Option[String], 0), // NULL f0, false f1 -> stage 1
      (3L, None, 1), // NULL f0, passes the rest -> survivor
      (4L, Some("x"), 1)) // definite false f0 -> stage 0
      .toDF("id", "text", "flag")
    val got = DataPrep.cascadeAccounting(rows, Seq(
      "len" -> (length(col("text")) >= 5),
      "flagged" -> (col("flag") === 1)))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0, 4L, 1L, 3L), (1, 3L, 1L, 2L)),
      s"got ${got.toSeq}")
  }
}
