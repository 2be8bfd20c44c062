package graft

import org.apache.spark.sql.SparkSession

/** Word-count throughput probe against the reference-pipeline simulation
  * (`tools/ref_pipeline.py`): runs `Jobs.wordCount` (reference-parity
  * Unicode tokenizer) on a corpus file and prints the median-of-3 warm
  * wall time plus the distinct/total token counts the simulation also
  * reports, so the two pipelines can be cross-checked for identical
  * output while being timed. Feeds THROUGHPUT.md.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    // `maxtemp <corpus>` switches to the reference's second job
    // (max_year_temp vs tools/ref_maxtemp_pipeline.py); default is the
    // word-count flagship (vs tools/ref_pipeline.py)
    val (job, path) = args.toSeq match {
      case Seq("maxtemp", p) => ("maxtemp", p)
      case Seq("maxtemp") => ("maxtemp", "/tmp/temp_x1.json")
      case Seq(p) => ("wordcount", p)
      case _ => ("wordcount", "/root/reference/onegin")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (job == "maxtemp") {
      def run(): (Long, Double, Double) = {
        val t0 = System.nanoTime()
        val corpus = spark.read.textFile(path)
        val maxes = graft.mr.Jobs.maxYearTemp(corpus).cache()
        val years = maxes.count()
        val chk = maxes.map(_._2).reduce(_ + _)
        val dt = (System.nanoTime() - t0) / 1e9
        maxes.unpersist()
        (years, chk, dt)
      }
      run() // warm-up
      val runs = (1 to 3).map(_ => run())
      val (years, chk, _) = runs.head
      val med = runs.map(_._3).sorted.apply(1)
      println(f"graft maxtemp $path: $med%.3fs, $years years, sum_of_max $chk%.1f")
    } else {
      def run(): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val corpus = spark.read.textFile(path)
        val counts = graft.mr.Jobs.wordCount(corpus).cache()
        val distinct = counts.count()
        val total = counts.map(_._2).reduce(_ + _)
        val dt = (System.nanoTime() - t0) / 1e9
        counts.unpersist()
        (distinct, total, dt)
      }
      run() // warm-up: JIT + codegen, same policy as the r1 measurement
      val runs = (1 to 3).map(_ => run())
      val (distinct, total, _) = runs.head
      val med = runs.map(_._3).sorted.apply(1)
      println(f"graft wordcount $path: $med%.3fs, $distinct distinct words, $total tokens")
    }
    spark.stop()
  }
}
