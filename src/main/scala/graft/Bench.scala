package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). A warm-up action runs first so
  * session/codegen/file-index startup cost isn't charged to whichever
  * query happens to run first; queries run in name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // declarative strategy/rule/function injection — same plan for q77
      // whether the session comes from here, Verify, or a user builder
      // (ensureRegistered stays as the fallback for plain sessions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table + JIT the scan/agg and the lambda-heavy
    // tokenize/explode codegen paths (first execution otherwise pays ~3s
    // of whole-stage-codegen compilation on whichever query runs first)
    import org.apache.spark.sql.functions._
    var warmedUp = true
    try {
      graft.sources.Tables.lineitem(spark, sfDir).count()
      graft.sources.Tables.events(spark, sfDir).count()
      graft.sources.Tables.embeddings(spark, sfDir).count()
      graft.sources.Tables.documents(spark, sfDir)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .groupBy(col("w")).count().count()
    } catch { case e: Throwable =>
      // a broken warm-up must not kill the bench — per-query error
      // handling below reports what actually fails
      warmedUp = false
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]

    // optional comma-separated query filter for targeted re-measurement
    // (regression triage without paying for the whole tail)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))

    // The IVF index build (KMeans fit) is a one-time amortized cost, not
    // query latency: run q41b once up front so the fitted model lands in
    // Similarity's index cache, report that as *_build, and let the timed
    // loop below measure the probe-only path like any other query.
    val ivfBuild: Option[Double] = if (!selected("q41b_ann_ivf")) None else {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries("q41b_ann_ivf")(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        failures += "q41b_ann_ivf_build" // a bogus build time must not pass silently
        System.err.println(s"[bench] q41b index build FAILED: ${e.getMessage}")
        None
      }
    }

    // median of 3 runs per query: single-shot timing can't separate a
    // systematic plan regression from one-off JIT/GC noise (VERDICT r2 #5)
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .flatMap { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var i = 0
      while (i < reps && !failed) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          // only successful reps count toward the median: a fast exception
          // must not make a broken query look fast (ADVICE r3)
          times += (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          failed = true
          failures += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        i += 1
      }
      // a query with zero successful reps gets NO timing entry — `failed`
      // already names it, and an absent key can't be mistaken for a result
      if (times.isEmpty) None else Some(name -> times.sorted.apply(times.length / 2))
    } ++ ivfBuild.map("q41b_ann_ivf_build" -> _)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fq = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // reps/warmup/build-split metadata makes cross-round bench JSONs
    // self-describing, so comparisons can refuse apples-to-oranges
    // (r2 single-shot vs r3 median-of-3 was silently incomparable)
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"warmup":$warmedUp,"build_keys":["q41b_ann_ivf_build"],"queries":$qs,"failed":$fq,"sf":"$sfDir"}""")
    spark.stop()
  }
}
