package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-family scale probe (VERDICT r3 #6): measures the declared
  * dedup queries one decade up from the bench SF, so the scale argument
  * in SCALE.md is empirical, not only analytic.
  *
  * The probe corpus replicates the source documents table `copies`×
  * (sf0.1 × 10 ≈ 50k docs) with a per-copy Caesar rotation of the text:
  * every token changes, so copies share no shingles and each copy
  * reproduces the source corpus's duplicate structure instead of
  * collapsing into cross-copy clone clusters — the workload SHAPE is
  * preserved while volume grows 10×. doc_ids are remapped to disjoint
  * ranges. Deterministic, no RNG.
  *
  * Usage: runMain graft.ScaleProbe [srcDir] [copies]
  * Prints one JSON line: per-query seconds at the scaled corpus.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).flatMap(_.toIntOption).getOrElse(10)
    val out = s"/root/repo/target/tmp/scaleprobe_x$copies"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsPath = s"$out/documents.parquet"
    // _SUCCESS, not bare directory existence: an interrupted write leaves
    // a partial directory that would silently shrink the probe corpus
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists) {
      val docs = graft.sources.Tables.load(spark, src, "documents")
      val alphabet = "abcdefghijklmnopqrstuvwxyz"
      // per-copy AFFINE cipher x -> a*x + b (mod 26), a coprime to 26:
      // 12 multipliers × 26 shifts = 312 distinct permutations, so up to
      // 312 copies share no tokens (a bare rotation collides at 27 — the
      // colliding copies would be exact cross-copy clones, inflating the
      // duplicate structure instead of preserving it). a=1 reproduces the
      // old rotation, so copies < 26 generate byte-identical corpora.
      val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      require(copies <= coprimes.size * 26, s"affine alphabet space exhausted at $copies copies")
      def perm(c: Int): String = {
        val a = coprimes(c / 26); val b = c % 26
        (0 until 26).map(i => alphabet((a * i + b) % 26)).mkString
      }
      val scaled = (0 until copies).map { c =>
        docs.select(
          (col("doc_id") + lit(c.toLong * 100000000L)).as("doc_id"),
          translate(lower(col("text")), alphabet, perm(c)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      // write with enough files that the scan parallelizes like real data
      scaled.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(docsPath)
    }

    val names = Seq("q35_dedup_exact", "q36_dedup_ngram_jaccard",
      "q37_dedup_minhash", "q38_dedup_simhash", "q51_dedup_pipeline",
      "q79_decontaminate", "q85_prep_pipeline", "q87_heavy_hitters")
    val nDocs = graft.sources.Tables.load(spark, out, "documents").count()
    val times = names.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, out).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scaleprobe","copies":$copies,"n_docs":$nDocs,"queries":$qs,"src":"$src"}""")
    spark.stop()
  }
}
