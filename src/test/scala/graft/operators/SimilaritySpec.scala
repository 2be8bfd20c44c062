package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  /** 20 separated clusters × 20 members, small jitter — same-cluster
    * cosine ≈ 1, cross-cluster ≈ random.
    */
  private def clustered() = {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(11)
    val rows = for { c <- 0 until 20; m <- 0 until 20 } yield {
      val centroid = Array.tabulate(dim)(j => math.sin(c * 131.7 + j * 7.3) * 10.0)
      ((c * 20 + m).toLong, centroid.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF ANN achieves high recall vs brute force on clustered vectors") {
    val df = clustered()
    val ivf = Similarity.ivfTopK(df, col("vec_id") < 20, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // brute force ground truth
    val e = df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        (Similarity.dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id"))
    val bf = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (ivf & bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9")
  }

  test("LSH ANN achieves high recall on clustered vectors; plane count is a live knob") {
    val df = clustered()
    def recallAt(nPlanes: Int): Double = {
      val lsh = Similarity.lshTopK(df, col("vec_id") < 20, k = 5, nPlanes = nPlanes)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val e = df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          (Similarity.dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id"))
      val bf = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (lsh & bf).size.toDouble / bf.size
    }
    assert(recallAt(8) >= 0.9, "LSH recall at 8 planes below 0.9 on clustered data")
    // fewer planes = bigger buckets = recall can only stay or improve
    assert(recallAt(4) >= 0.9, "LSH recall at 4 planes below 0.9 on clustered data")
  }

  test("stored-assignment IVF probe is value-identical to the inline form") {
    val df = clustered()
    val model = Similarity.ivfModel(df, nlist = 16)
    val cents = model.clusterCenters.map(_.toArray)
    // round-trip the index through parquet — the production shape is a
    // stored table, and the write/read must not perturb the doubles
    val path = s"target/tmp/ivf_assign_spec_${System.nanoTime()}"
    Similarity.ivfAssignments(df, nlist = 16).write.parquet(path)
    val assigned = spark.read.parquet(path)
    val stored = Similarity
      .ivfTopKStored(assigned, col("vec_id") < 20, cents, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inline = Similarity
      .ivfTopK(df, col("vec_id") < 20, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(stored === inline)
  }

  test("IVF returns k results per query when cells are populated") {
    val got = Similarity.ivfTopK(clustered(), col("vec_id") < 20, k = 5,
      nlist = 16, nprobe = 4).groupBy("qid").count().collect()
    assert(got.length == 20)
    got.foreach(r => assert(r.getLong(1) == 5, s"query ${r.getLong(0)}"))
  }

  test("q41d cell assignment covers every vector, is deterministic, and agrees with the fitted model") {
    val sf = "/root/testdata/sf0.001"
    def cells() = graft.SparkEntry.queries("q41d_ivf_cells")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val a = cells()
    val nVecs = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(a.length == nVecs)
    assert(a.forall { case (_, c) => c >= 0 && c < 16 })
    assert(a.toSeq == cells().toSeq, "assignment must be deterministic across runs")
    // the fold-based argmin must reproduce the model's own assignment
    // (model.transform computes distance via the norm trick — only exact
    // near-ties could differ, and the isotropic test data has none)
    val model = Similarity.ivfModel(
      graft.sources.Tables.embeddings(spark, sf), nlist = 16, cacheKey = Some(sf))
    import org.apache.spark.ml.functions.array_to_vector
    val own = model
      .transform(graft.sources.Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          array_to_vector(col("embedding").cast("array<double>")).as("fv")))
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = a.count { case (id, c) => own(id) == c }
    assert(agree == a.length, s"fold argmin differs from model on ${a.length - agree} vectors")
  }

  test("semantic dedup drops exactly the smaller-id-dominated same-cell vectors") {
    val sf = "/root/testdata/sf0.001"
    val survivors = graft.SparkEntry.queries("q83_semantic_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // independent brute-force recomputation from the DECLARED cell surface
    val cells = graft.SparkEntry.queries("q41d_ivf_cells")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val ids = vs.keys.toSeq.sorted
    val dropped = (for {
      j <- ids; i <- ids if i < j && cells(i) == cells(j) && cos(vs(i), vs(j)) > 0.4
    } yield j).toSet
    assert(survivors == ids.toSet -- dropped,
      s"survivors=${survivors.size} total=${ids.size} dropped=${dropped.size}")
  }

  test("kmeansStep matches a driver-side replay of the same arithmetic") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val cents = Similarity.kmeansInit(emb, 4)
    val got = Similarity.kmeansStep(emb, cents)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // naive replay: same sequential fold distances, smallest-index argmin,
    // same 2^40 integer-scaled means
    val vs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dist(c: Array[Double], v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - v(i); s += d * d; i += 1 }
      s
    }
    val scale = 1099511627776.0
    val assign = vs.view.mapValues { v =>
      val ds = cents.map(dist(_, v)); ds.indexOf(ds.min)
    }.toMap
    val expected = (for {
      cell <- cents.indices
      members = vs.collect { case (id, v) if assign(id) == cell => v }.toSeq
      if members.nonEmpty
      dim <- members.head.indices
    } yield {
      val ssum = members.map(v => math.floor(v(dim) * scale).toLong).sum
      (cell, dim) -> (members.size.toLong, ssum.toDouble / scale / members.size)
    }).toMap
    assert(got == expected)
  }

  test("kmeansFit: deterministic across partitioning, SSE non-increasing") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val f1 = Similarity.kmeansFit(emb, k = 4, iters = 2)
    val f2 = Similarity.kmeansFit(emb.repartition(7), k = 4, iters = 2)
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    // Lloyd monotonicity: total within-cluster SSE never goes up
    val vs = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    def sse(cents: Array[Array[Double]]): Double =
      vs.map { v =>
        cents.map { c =>
          var s = 0.0; var i = 0
          while (i < c.length) { val d = c(i) - v(i); s += d * d; i += 1 }
          s
        }.min
      }.sum
    val s0 = sse(Similarity.kmeansInit(emb, 4))
    val s1 = sse(Similarity.kmeansFit(emb, 4, 1))
    val s2 = sse(f1)
    assert(s1 <= s0 * (1 + 1e-9) && s2 <= s1 * (1 + 1e-9), s"$s0 -> $s1 -> $s2")
  }

  test("radius-2 multiprobe recall dominates radius-1 at equal planes") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val truth = graft.SparkEntry.queries("q40_ann_bruteforce")(spark, sf001)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(radius: Int): Double = {
      val got = Similarity.lshTopK(emb, col("vec_id") < 20, k = 5,
        probeRadius = radius)
        .select("qid", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    // radius 2 probes a strict superset of radius 1's buckets, so its
    // candidate set — and with exact re-ranking, its recall — dominates
    assert(r2 >= r1, s"r1=$r1 r2=$r2")
    assert(r2 > 0.3, s"radius-2 recall unexpectedly low: $r2")
  }

  test("covariance matches a driver-side replay; partitioning-independent") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val dim = 64
    val got = Similarity.covariance(emb, dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got.size == dim * (dim + 1) / 2)
    val vs = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val scale = 1099511627776.0
    val n = vs.length.toLong
    def sx(i: Int) = vs.map(v => math.floor(v(i) * scale).toLong).sum
    for ((i, j) <- Seq((0, 0), (0, 1), (5, 40), (63, 63), (31, 32))) {
      val sxy = vs.map(v => math.floor(v(i) * v(j) * scale).toLong).sum
      val expected = sxy.toDouble / scale / n -
        (sx(i).toDouble / scale / n) * (sx(j).toDouble / scale / n)
      assert(got((i, j)) == expected, s"($i,$j)")
    }
    val re = Similarity.covariance(emb.repartition(7), dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(re == got) // exact integer sums: identical at any parallelism
  }

  test("ivfAppend: append-then-probe equals one-pass assignment of the union") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val base = emb.filter(pmod(col("vec_id"), lit(10)) < 8)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) >= 8)
    // centroids fitted on the BASE only, then frozen
    val cents = Similarity.ivfModel(base, nlist = 8).clusterCenters.map(_.toArray)
    val appended = Similarity.ivfAppend(base, cents)
      .unionByName(Similarity.ivfAppend(batch, cents))
    val onePass = Similarity.ivfAppend(emb, cents)
    def probe(assigned: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKStored(assigned, col("vec_id") < 20, cents, k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val a = probe(appended)
    assert(a == probe(onePass) && a.nonEmpty,
      "append path diverged from one-pass assignment under fixed centroids")
    // the appended batch lands in the cells the fixed centroids dictate —
    // cell ids are within range and batch rows are present
    val cells = appended.select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(appended.count() == emb.count())
  }

  test("ivfadcAppend: frozen-model batch codes equal one-pass encode of the union (q146 law)") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val base = emb.filter(pmod(col("vec_id"), lit(10)) < 8)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) >= 8)
    // coarse centroids AND residual codebooks fitted on the BASE, frozen
    val cents = Similarity.ivfModel(base, nlist = 8).clusterCenters.map(_.toArray)
    val books = Similarity.ivfadcFit(base, cents, m = 8, ksub = 16, iters = 2)
    def codes(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        (r.getInt(2), r.getSeq[Int](1).toList))).toMap
    val appended = codes(Similarity.ivfadcEncode(base, cents, books)
      .unionByName(Similarity.ivfadcAppend(batch, cents, books)))
    val onePass = codes(Similarity.ivfadcEncode(emb, cents, books))
    assert(appended.nonEmpty && appended == onePass,
      "append codes diverged from one-pass encode under the frozen model")
  }

  test("moments stored-shard fold: parquet round trip is bit-identical to inline") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val dim = 64
    val inline = Similarity.covariance(emb, dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // serialize → store → read back → fold: the production refresh path
    val dir = java.nio.file.Files.createTempDirectory("graft_moments_").toString
    Similarity.momentShardStates(emb, dim, shards = 8)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    assert(stored.count() == 8)
    // each state row is the flat [n | Sx(d) | Sxy(d*d)] layout
    assert(stored.select(size(col("m"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(1 + dim + dim * dim))
    val folded = Similarity.covarianceFromStates(stored, dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(folded == inline,
      "stored-shard fold diverged from the single-pass covariance")
    // and a different shard count folds to the same matrix (the merge
    // is associative/commutative integer addition)
    val folded17 = Similarity.covarianceFromStates(
      Similarity.momentShardStates(emb.repartition(5), dim, shards = 17), dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(folded17 == inline)
  }

  test("PQ/ADC: high recall vs exact L2 on clustered vectors; codes are m small ints") {
    val df = clustered()
    val books = Similarity.pqFit(df, m = 8, dim = 64, ksub = 16, iters = 2)
    val enc = Similarity.pqEncode(df, books)
    // codes really are the compressed representation: m entries in [0, ksub)
    val codeRows = enc.select(col("codes")).collect().map(_.getSeq[Int](0))
    assert(codeRows.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // ADC is a SHORTLIST generator (Jégou et al. §5: ADC prunes, exact
    // re-rank on the shortlist picks final) — at 0.05-sigma cluster noise
    // the within-cluster gaps sit below quantization resolution, so the
    // right contract is recall@R for a shortlist R > k, not ADC@k alone
    val adc = Similarity.pqAdcTopK(enc, col("vec_id") < 20, k = 20, books)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // exact L2 ground truth (ADC approximates squared euclidean, so the
    // truth metric is L2, not cosine)
    val e = df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        graft.functions.SquaredDistance(col("qv"), col("v")).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("nn_id"))
    val bf = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (adc & bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"PQ/ADC shortlist recall@20 $recall < 0.8")

    // and the shortlist is cluster-faithful: a cluster has exactly 19
    // siblings, so a 20-wide shortlist admits at most 1 outsider per query
    adc.groupBy(_._1).foreach { case (qid, nns) =>
      val cross = nns.count { case (q, nn) => nn / 20 != q / 20 }
      assert(cross <= 1, s"query $qid: $cross cross-cluster shortlist entries")
    }
  }

  test("IVFADC: residual-PQ probe reaches high recall vs exact L2; codes-only corpus side") {
    val df = clustered()
    val model = Similarity.ivfModel(df, nlist = 16)
    val cents = model.clusterCenters.map(_.toArray)
    val books = Similarity.ivfadcFit(df, cents, m = 8, ksub = 16, iters = 2)
    val enc = Similarity.ivfadcEncode(df, cents, books)
    // stored-artifact shape: m codes + a cell id per vector, no floats
    assert(enc.columns.toSet == Set("vec_id", "codes", "cell"))
    val qs = df.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).filter(col("vec_id") < 20)
    val got = Similarity.ivfadcTopK(enc, qs, k = 20, nprobe = 4, cents, books)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    val e = df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        graft.functions.SquaredDistance(col("qv"), col("v")).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("nn_id"))
    val bf = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // true top-5 recovered from the 20-wide shortlist (the ADC contract)
    val recall = (got & bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVFADC shortlist recall $recall < 0.8")
  }

  test("linear probe: square loss non-increasing over GD; learned head beats chance") {
    val emb = graft.sources.Tables.load(spark, sf001, "embeddings")
    val y = when(col("label") === 0, 1.0).otherwise(0.0)
    def mse(w: Array[Double]): Double = {
      val wLit = array(w.map(lit).toIndexedSeq: _*)
      emb.select(col("embedding").cast("array<double>").as("v"), y.as("y"))
        .select(pow(Similarity.dot(col("v"), wLit) - col("y"), 2).as("e"))
        .agg(avg(col("e"))).head.getDouble(0)
    }
    val n = emb.count()
    var w = new Array[Double](64)
    var losses = Seq(mse(w))
    for (_ <- 0 until 3) {
      w = Similarity.linearProbeStep(emb, y, w, lr = 0.1, n)
      losses :+= mse(w)
    }
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a },
      s"loss must be non-increasing: $losses")
    assert(losses.last < losses.head, "training must actually reduce loss")

    // the learned head carries label signal: it orders the classes —
    // mean score of the positive class clearly above the negative class
    // (3 full-batch steps can't beat an 89% majority rate, but a head
    // with zero signal would give equal class means)
    val wLit = array(w.map(lit).toIndexedSeq: _*)
    val scored = emb.select(y.as("y"),
      Similarity.dot(col("embedding").cast("array<double>"), wLit).as("s"))
    val means = scored.groupBy(col("y")).agg(avg(col("s")).as("m"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(means(1.0) > 0 && means(1.0) > 5 * math.abs(means(0.0)),
      s"positive-class mean score must separate: $means")

    // partitioning-independence of the gradient (floor-scaled sums)
    val w2 = Similarity.linearProbeStep(
      emb.repartition(13, col("label")), y, new Array[Double](64), lr = 0.1, n)
    val w1 = Similarity.linearProbeStep(emb, y, new Array[Double](64), lr = 0.1, n)
    assert(w1.toSeq == w2.toSeq, "bit-identical step across partitionings")
  }

  test("ivfDiagnostics: flags skewed occupancy, near-1 on balanced cells") {
    import spark.implicits._
    val dim = 4
    def mk(rows: Seq[(Long, Array[Double], Int)]) =
      rows.map { case (id, v, c) => (id, v.toSeq, c) }.toDF("vec_id", "v", "cell")
        .select(col("vec_id"), col("v").cast("array<double>").as("v"), col("cell"))
    val cents = Array(Array(0.0, 0, 0, 0), Array(10.0, 0, 0, 0))
    // balanced: 4 vectors per cell, all exactly on their centroid
    val bal = mk((0 until 8).map(i =>
      (i.toLong, cents(i % 2).clone(), i % 2)))
    val dBal = Similarity.ivfDiagnostics(bal, cents).collect()
    assert(dBal.forall(_.getDouble(4) == 1.0), "balanced index => imbalance 1")
    assert(dBal.forall(_.getDouble(3) == 0.0), "on-centroid vectors => zero qerr")
    // skewed: 7 in cell 0, 1 in cell 1, off-centroid by 1.0 in dim 0
    val skew = mk((0 until 8).map { i =>
      val c = if (i < 7) 0 else 1
      val v = cents(c).clone(); v(0) += 1.0
      (i.toLong, v, c)
    })
    val dSkew = Similarity.ivfDiagnostics(skew, cents).collect()
    assert(dSkew.forall(r => math.abs(r.getDouble(4) - 1.75) < 1e-12),
      s"7/8 in one of 2 cells => imbalance 1.75: ${dSkew.mkString}")
    assert(dSkew.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9),
      "unit offset => qerr_mean 1.0")
  }

  test("pcaTopComponent returns a dominant eigenpair (Av = lambda*v)") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val cov = Similarity.covarianceMatrix(emb, 64)
    val (v, lambda) = Similarity.pcaTopComponent(cov)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    val av = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(av.zip(v).map { case (a, b) =>
      val d = a - lambda * b; d * d
    }.sum)
    assert(resid < 1e-8 * math.max(1.0, math.abs(lambda)),
      s"residual $resid for lambda $lambda")
    // dominance: lambda at least the largest diagonal entry (Rayleigh max)
    val maxDiag = (0 until 64).map(i => cov(i)(i)).max
    assert(lambda >= maxDiag - 1e-12)
  }

  test("JL projection: exact vs driver replay; median pairwise distortion near 1") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val d = 64; val m = 16
    val proj = Similarity.jlProject(spark, emb, d, m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // driver replay of the identical md5-sign + scaled-integer arithmetic
    def sign(i: Long, j: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$i:$j".getBytes("UTF-8"))
      // first hex char of the digest = high nibble of byte 0
      if (((md(0) >> 4) & 0xF) <= 7) 1L else -1L
    }
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val scale = 1099511627776.0
    vecs.take(5).foreach { case (id, v) =>
      (0 until m).foreach { j =>
        val expect = (0 until d).map(i =>
          sign(i, j) * math.floor(v(i) * scale).toLong).sum
        assert(proj((id, j)) == expect, s"vec $id dim $j: ${proj((id, j))} != $expect")
      }
    }
    // JL law: squared-distance ratio (projected/original, both in the
    // metric normalization ||Px||^2/m) concentrates around 1 — median
    // over pairs is a robust check at m=16 (per-pair std ~ sqrt(2/m))
    val ids = vecs.keys.toSeq.sorted.take(40)
    val ratios = ids.sliding(2).collect { case Seq(a, b) =>
      val dx = vecs(a).zip(vecs(b)).map { case (x, y) => x - y }
      val orig = dx.map(x => x * x).sum
      val dp = (0 until m).map(j =>
        (proj((a, j)) - proj((b, j))) / scale)
      val pr = dp.map(x => x * x).sum / m
      pr / orig
    }.toSeq.sorted
    val med = ratios(ratios.size / 2)
    assert(med > 0.5 && med < 1.8, s"median JL distortion $med drifted from 1")
  }

  test("negative sampling: roles disjoint, counts exact, deterministic across partitionings") {
    import org.apache.spark.sql.functions._
    def run() = graft.SparkEntry.queries("q139_negative_sampling")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val a = run()
    assert(a.length == 80)
    val byAnchor = a.groupBy(_._1)
    byAnchor.foreach { case (qid, rows) =>
      val pos = rows.filter(_._2 == "pos").map(_._4).toSet
      val neg = rows.filter(_._2 == "neg").map(_._4).toSet
      assert(pos.size == 3 && neg.size == 5)
      assert((pos & neg).isEmpty, s"anchor $qid: negative drawn from positives")
      assert(!pos.contains(qid) && !neg.contains(qid), s"anchor $qid sampled itself")
    }
    // determinism: a second run (fresh plan, possibly different task
    // scheduling) must produce the identical triplet table
    assert(run().toSeq == a.toSeq)
  }

  test("embeddingDrift: fires on a shifted/scaled slice, quiet on a resample") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(shift: Double, spread: Double) =
      Array.fill(4)(((rnd.nextDouble() - 0.5) * spread + shift).toFloat)
    // side 0: centered, unit-ish spread; side 1: dim-uniform shift +0.5
    // and 3x spread — both laws must fire on every dim
    val drifted = (Seq.fill(3000)((0, vec(0.0, 1.0))) ++
      Seq.fill(3000)((1, vec(0.5, 3.0))))
      .toDF("label", "embedding")
    val d1 = Similarity.embeddingDrift(drifted, col("label")).collect()
    assert(d1.length == 4)
    d1.foreach { r =>
      assert(r.getAs[Boolean]("mean_drift"), s"mean drift missed on dim ${r.get(0)}")
      assert(r.getAs[Boolean]("var_drift"), s"var drift missed on dim ${r.get(0)}")
    }
    // two independent resamples of the SAME distribution: no drift call
    val same = (Seq.fill(3000)((0, vec(0.0, 1.0))) ++
      Seq.fill(3000)((1, vec(0.0, 1.0))))
      .toDF("label", "embedding")
    val d2 = Similarity.embeddingDrift(same, col("label")).collect()
    d2.foreach { r =>
      assert(!r.getAs[Boolean]("mean_drift"), s"false mean drift on dim ${r.get(0)}")
      assert(!r.getAs[Boolean]("var_drift"), s"false var drift on dim ${r.get(0)}")
    }
  }

  test("native vector_residual == zip_with reference, bit for bit (r19)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cents = Array.tabulate(16)(c =>
      Array.tabulate(64)(j => math.cos(c * 13.1 + j * 3.7) * 5.0))
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian() * 8.0), i % 16)
    }
    val df = rows.toDF("vec_id", "v", "cell")
    val out = df.select(col("vec_id"),
      graft.functions.VectorResidual(col("v"), col("cell"), cents).as("n"),
      Similarity.residualReference(col("v"), col("cell"), cents).as("r"))
      .collect()
    out.foreach { r =>
      val n = r.getSeq[Double](1)
      val ref = r.getSeq[Double](2)
      assert(n.length == 64 && n.length == ref.length)
      n.indices.foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(n(i)) ==
          java.lang.Double.doubleToRawLongBits(ref(i)),
          s"vec ${r.getLong(0)} dim $i: ${n(i)} != ${ref(i)}")
      }
    }
    // guards throw rather than mis-encode
    intercept[Exception] { // wrapped or direct depending on codegen path
      df.select(graft.functions.VectorResidual(col("v"),
        col("cell") + 16, cents)).collect()
    }
  }
}
