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
    // q67 emits (group, exact n_parts, within_5pct) — the boolean IS the
    // error law (computed from the udaf estimate inside the query), and
    // n_parts must agree with an independently computed exact count
    val rows = graft.SparkEntry.queries("q67_hll_mergeable")(spark, sf001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val (nParts, within) = rows(k)
      assert(nParts == n, s"$k: exact col $nParts != $n")
      assert(within, s"$k: HLL estimate drifted beyond 5% of $n")
    }
  }

  test("exported shard sketches fold to the same estimate as one global sketch") {
    import spark.implicits._
    val stateAgg = udaf(new Aggregators.HllStateAggregator(12),
      org.apache.spark.sql.Encoders.scalaLong)
    // shard the events table by type, export one sketch row per shard —
    // the per-day/per-partition persistence pattern — then merge
    // driver-side and compare against sketching everything at once
    val ev = graft.sources.Tables.events(spark, sf001)
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
    val shardStates = ev.groupBy(col("event_type")).agg(stateAgg(col("h")).as("state"))
      .collect().map(r => Aggregators.Hll.deserialize(r.getAs[Array[Byte]]("state")))
    val folded = shardStates.reduce(Aggregators.Hll.merge)
    val whole = ev.select(col("h")).as[Long].collect()
      .foldLeft(Aggregators.Hll.zero(12))((b, h) => Aggregators.Hll.reduce(12, b, h))
    assert(Aggregators.Hll.estimate(folded) == Aggregators.Hll.estimate(whole))
    // and the estimate itself is sane vs the exact distinct-user count
    val exact = graft.sources.Tables.events(spark, sf001)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val err = math.abs(Aggregators.Hll.estimate(folded) - exact).toDouble / exact
    assert(err <= 0.05, s"est=${Aggregators.Hll.estimate(folded)} exact=$exact")
  }

  test("HllMergeAggregator folds stored states distributed == driver fold") {
    import spark.implicits._
    val stateAgg = udaf(new Aggregators.HllStateAggregator(12),
      org.apache.spark.sql.Encoders.scalaLong)
    val mergeAgg = udaf(new Aggregators.HllMergeAggregator(12),
      org.apache.spark.sql.Encoders.BINARY)
    val ev = graft.sources.Tables.events(spark, sf001)
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
    val states = ev.groupBy(col("event_type")).agg(stateAgg(col("h")).as("state"))
    // distributed fold via the aggregator == driver-side register fold
    val viaAgg = states.agg(mergeAgg(col("state")).as("est")).head.getLong(0)
    val viaDriver = Aggregators.Hll.estimate(
      states.collect().map(r => Aggregators.Hll.deserialize(r.getAs[Array[Byte]]("state")))
        .reduce(Aggregators.Hll.merge))
    assert(viaAgg == viaDriver)
    // null states contribute nothing
    val withNull = states.select(col("state"))
      .unionByName(Seq(Tuple1(null: Array[Byte])).toDF("state"))
    assert(withNull.agg(mergeAgg(col("state"))).head.getLong(0) == viaAgg)
  }

  test("HLL merge rejects mixed-precision states loudly") {
    intercept[IllegalArgumentException] {
      Aggregators.Hll.merge(Aggregators.Hll.zero(12), Aggregators.Hll.zero(13))
    }
  }

  test("HLL small-range correction counts tiny sets near-exactly") {
    val agg = new Aggregators.HllAggregator(12)
    val sk = hashesOf(1L to 100L).foldLeft(agg.zero)(agg.reduce)
    val est = agg.finish(sk)
    assert(math.abs(est - 100) <= 2, s"got $est")
  }

  /** Zipf-ish stream: item i (1..40) appears 500/i times. */
  private def cmsStream: Seq[Long] =
    (1 to 40).flatMap(i => Seq.fill(500 / i)(i.toLong))

  test("CMS never undercounts and stays within (e/w)*N of exact") {
    val d = 7; val w = 2048
    val hashes = hashesOf(cmsStream)
    val exact = cmsStream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val st = hashes.foldLeft(Aggregators.Cms.zero(d, w))(
      (b, h) => Aggregators.Cms.reduce(d, w, b, h))
    val bound = math.ceil(math.E / w * hashes.size).toLong
    exact.foreach { case (item, n) =>
      val est = Aggregators.Cms.estimate(d, w, st,
        hashesOf(Seq(item)).head)
      assert(est >= n, s"CMS undercounted item $item: $est < $n")
      assert(est <= n + bound, s"CMS overcounted item $item beyond bound: $est > $n + $bound")
    }
  }

  test("CMS merge law: sketch(A ++ B) == merge(sketch(A), sketch(B)) counter-for-counter") {
    val d = 5; val w = 256
    val (a, b) = cmsStream.splitAt(cmsStream.size / 3)
    def sk(xs: Seq[Long]) = hashesOf(xs).foldLeft(Aggregators.Cms.zero(d, w))(
      (st, h) => Aggregators.Cms.reduce(d, w, st, h))
    val whole = sk(cmsStream)
    val folded = Aggregators.Cms.merge(sk(a), sk(b))
    assert(whole.toSeq == folded.toSeq)
  }

  test("CMS merge rejects mixed-geometry states loudly") {
    intercept[IllegalArgumentException] {
      Aggregators.Cms.merge(Aggregators.Cms.zero(5, 256), Aggregators.Cms.zero(7, 256))
    }
  }

  test("GK quantile summary: rank error within epsilon on a known stream") {
    val agg = new Aggregators.GkQuantileAggregator(0.5, relErr = 0.01)
    // deterministic non-uniform stream of 10k values in [0, 100)
    val xs = (0 until 10000).map(i => (i * i % 9973) % 100 * 1.0)
    val sk = xs.foldLeft(agg.zero)(agg.reduce)
    val est = agg.finish(sk)
    val sorted = xs.sorted
    // value's rank must be within eps*n of the true median rank
    val lo = sorted((0.49 * xs.size).toInt)
    val hi = sorted(math.min(xs.size - 1, (0.51 * xs.size).toInt))
    assert(est >= lo && est <= hi, s"median est $est outside [$lo, $hi]")
  }

  test("GK shard summaries merged give a bounded-error global quantile") {
    val agg = new Aggregators.GkQuantileAggregator(0.95, relErr = 0.01)
    val xs = (0 until 12000).map(i => (i * 37 % 10007) * 1.0)
    // three shards, aggregated independently (per-partition state), merged
    val merged = xs.grouped(4000)
      .map(sh => sh.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val est = agg.finish(merged)
    val sorted = xs.sorted
    val lo = sorted((0.92 * xs.size).toInt)
    val hi = sorted(math.min(xs.size - 1, (0.98 * xs.size).toInt))
    assert(est >= lo && est <= hi, s"merged p95 est $est outside [$lo, $hi]")
  }

  test("GK summary of an empty stream reports NaN, not a crash") {
    val agg = new Aggregators.GkQuantileAggregator(0.5)
    assert(agg.finish(agg.zero).isNaN)
  }

  test("GK stored form: serialize -> parquet-shaped bytes -> merge equals direct") {
    val state = new Aggregators.GkStateAggregator(relErr = 0.01)
    val xs = (0 until 12000).map(i => (i * 37 % 10007) * 1.0)
    // shard summaries exported as bytes (what a parquet round-trip carries)
    val shardBytes = xs.grouped(3000)
      .map(sh => state.finish(sh.foldLeft(state.zero)(state.reduce))).toSeq
    assert(shardBytes.forall(b => b.length > 0 && b.length < 64 * 1024),
      s"summary blobs must stay KB-sized, got ${shardBytes.map(_.length)}")
    val mergeAgg = new Aggregators.GkMergeAggregator(0.95, relErr = 0.01)
    val est = mergeAgg.finish(shardBytes.foldLeft(mergeAgg.zero)(mergeAgg.reduce))
    // same bounded-error law as the direct merged aggregation
    val sorted = xs.sorted
    val lo = sorted((0.92 * xs.size).toInt)
    val hi = sorted(math.min(xs.size - 1, (0.98 * xs.size).toInt))
    assert(est >= lo && est <= hi, s"stored-form p95 est $est outside [$lo, $hi]")
    // null shard rows (empty parquet partitions) are skipped, not fatal:
    // only-null input leaves the summary empty (NaN), real bytes still merge
    assert(mergeAgg.finish(mergeAgg.reduce(mergeAgg.zero, null)).isNaN)
    val withNull = mergeAgg.reduce(
      shardBytes.foldLeft(mergeAgg.zero)(mergeAgg.reduce), null)
    assert(!mergeAgg.finish(withNull).isNaN)
  }

  test("CMS stored form: CmsMergeAggregator over state rows equals one global sketch") {
    val d = 5; val w = 256
    val state = new Aggregators.CmsStateAggregator(d, w)
    val hashes = (0 until 20000).map(i => (i * 2654435761L) % 500)
    val global = hashes.foldLeft(state.zero)(state.reduce)
    val shardStates: Seq[Seq[Long]] = hashes.grouped(5000)
      .map(sh => sh.foldLeft(state.zero)(state.reduce).toSeq).toSeq
    val mergeAgg = new Aggregators.CmsMergeAggregator(d, w)
    val folded = shardStates.foldLeft(mergeAgg.zero)(mergeAgg.reduce)
    assert(folded.toSeq == global.toSeq,
      "folding stored shard states must be counter-for-counter exact")
    // geometry mismatch fails loudly
    val bad = new Aggregators.CmsStateAggregator(d, w * 2).zero.toSeq
    intercept[IllegalArgumentException](mergeAgg.reduce(mergeAgg.zero, bad))
  }

  // ---- Misra–Gries frequent-items summary ------------------------------

  /** Zipf-ish synthetic stream: item i appears ~N/(i+1) times, shuffled
    * deterministically so partition splits are adversarial-ish rather
    * than sorted runs. */
  private def zipfStream(nItems: Int, scale: Int, seed: Int): Seq[Long] = {
    val xs = (0 until nItems).flatMap(i => Seq.fill(scale / (i + 1))(i.toLong))
    val rnd = new scala.util.Random(seed)
    rnd.shuffle(xs)
  }

  test("MG laws hold under arbitrary merge splits (worst-case, not probabilistic)") {
    val k = 31
    val agg = new Aggregators.MgStateAggregator(k)
    val stream = zipfStream(nItems = 500, scale = 4000, seed = 7)
    val exact = stream.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
    for (nSplits <- Seq(1, 2, 7)) {
      val rnd = new scala.util.Random(nSplits)
      val parts = stream.groupBy(_ => rnd.nextInt(nSplits)).values.toSeq
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val st = agg.finish(merged)
      val n = st(0); val err = st(1); val size = st(2).toInt
      assert(n == stream.size.toLong, "folded stream length must be exact")
      assert(size <= k, s"summary must hold <= $k items, got $size")
      assert(err * (k + 1) <= n, s"error $err must stay <= n/(k+1) = ${n / (k + 1)}")
      val counts = (0 until size).map(i => st(3 + 2 * i) -> st(4 + 2 * i)).toMap
      exact.foreach { case (h, cnt) =>
        val c = counts.getOrElse(h, 0L)
        assert(c <= cnt, s"summary count $c overestimates exact $cnt for $h")
        assert(cnt <= c + err, s"exact $cnt for $h exceeds summary $c + err $err")
        if (cnt > err) assert(counts.contains(h),
          s"heavy hitter $h (count $cnt > err $err) missing from summary")
      }
    }
  }

  test("MG stored form: MgMergeAggregator over state rows keeps the same laws") {
    val k = 31
    val state = new Aggregators.MgStateAggregator(k)
    val stream = zipfStream(nItems = 300, scale = 3000, seed = 13)
    val exact = stream.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
    val shardStates: Seq[Seq[Long]] = stream.grouped(700)
      .map(sh => state.finish(sh.foldLeft(state.zero)(state.reduce))).toSeq
    assert(shardStates.forall(_.length <= 4 + 2 * k),
      "stored MG states must stay O(k) longs")
    assert(shardStates.forall(_.last == k.toLong),
      "stored MG states carry their k as the trailing header element")
    val mergeAgg = new Aggregators.MgMergeAggregator(k)
    // null shard rows (empty parquet partitions) are skipped, not fatal
    val folded = mergeAgg.finish(
      mergeAgg.reduce(shardStates.foldLeft(mergeAgg.zero)(mergeAgg.reduce), null))
    val n = folded(0); val err = folded(1); val size = folded(2).toInt
    assert(n == stream.size.toLong)
    assert(err * (k + 1) <= n)
    val counts = (0 until size).map(i => folded(3 + 2 * i) -> folded(4 + 2 * i)).toMap
    exact.foreach { case (h, cnt) =>
      val c = counts.getOrElse(h, 0L)
      assert(c <= cnt && cnt <= c + err)
      if (cnt > err) assert(counts.contains(h))
    }
    // malformed / k-mismatched stored state fails loudly
    intercept[IllegalArgumentException](
      mergeAgg.reduce(mergeAgg.zero, Seq(0L, 0L, 999L)))
    val bigState = new Aggregators.MgStateAggregator(64)
    val big = bigState.finish(
      (0L until 64L).foldLeft(bigState.zero)(bigState.reduce))
    intercept[IllegalArgumentException](mergeAgg.reduce(mergeAgg.zero, big))
    // a cross-k state holding FEWER than k items must also refuse — the
    // stored trailing k catches what the size check cannot (ADVICE r10)
    val sparse = bigState.finish(
      (0L until 5L).foldLeft(bigState.zero)(bigState.reduce))
    assert(sparse(2) == 5L, "sanity: 5 items, well under both ks")
    intercept[IllegalArgumentException](mergeAgg.reduce(mergeAgg.zero, sparse))
  }

  // ---- KMV bottom-k distinct sketch ------------------------------------

  test("KMV state is canonical: identical under any split/merge order, distinct, ascending") {
    val k = 16
    val agg = new Aggregators.MinKAggregator(k)
    val stream = zipfStream(nItems = 200, scale = 1500, seed = 3)
      .map(h => h * 0x9E3779B97F4A7C15L & 0xFFFFFFFFFFFFFL) // spread, nonneg
    val whole = stream.foldLeft(agg.zero)(agg.reduce)
    for (nSplits <- Seq(2, 5, 9)) {
      val rnd = new scala.util.Random(nSplits)
      val parts = stream.groupBy(_ => rnd.nextInt(nSplits)).values.toSeq
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(merged == whole,
        s"KMV state must be split-order-independent (splits=$nSplits)")
    }
    assert(whole == whole.distinct && whole == whole.sorted && whole.size <= k)
    // ground truth: k smallest distinct values of the set
    assert(whole == stream.distinct.sorted.take(k))
  }

  test("KMV estimator: exact below k, within 4/sqrt(k) above; duplicates ignored") {
    val k = 64
    val agg = new Aggregators.MinKAggregator(k)
    // fewer distincts than k: the state IS the set
    val small = (1L to 40L).map(x => x * 0x9E3779B97F4A7C15L & 0xFFFFFFFFFFFFFL)
    val smallState = (small ++ small).foldLeft(agg.zero)(agg.reduce)
    assert(smallState.size == 40, "sketch must hold the whole small set exactly")
    // many distincts: (k-1) * 2^60 / h_k within 4 standard errors
    val n = 20000
    val big = (1L to n.toLong).map(x =>
      // multiply into the full 60-bit hash space the estimator assumes
      (x * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1))
    val st = big.foldLeft(agg.zero)(agg.reduce)
    assert(st.size == k)
    val est = (k - 1).toDouble * math.pow(2.0, 60) / st.last.toDouble
    val tol = 4.0 / math.sqrt(k.toDouble) * n
    assert(math.abs(est - n) <= tol, s"KMV est $est vs exact $n (tol $tol)")
  }

  test("declared q125 booleans are all true on sf0.001") {
    val rows = graft.SparkEntry.queries("q125_mg_heavy_hitters")(spark, sf001).collect()
    // sf0.001's vocabulary is smaller than the top-40 limit — every
    // distinct token appears, which also exercises the summary-holds-all
    // case (vocab < k)
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      (3 until r.length).foreach(i =>
        assert(r.getBoolean(i), s"law column $i false for token ${r.getString(0)}"))
    }
  }
}
