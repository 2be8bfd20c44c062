package graft

import org.apache.spark.sql.SparkSession

/** Round-18 optimization plan capture: writes `explain("formatted")` of
  * the named declared queries to files (`plans/r18/<query>_<tag>.txt` —
  * the judge checks plan claims against these).
  *
  * Usage: `runMain graft.PlanDumpR18 <sfDir> <outDir> <tag> <q1,q2,...>`
  *
  * Eager-driver queries (checkpointed loops, collect pins) still plan
  * lazily enough for the FINAL frame; the loop-internal per-iteration
  * plans are captured by the `_iter` variants where noted in
  * OPTIMIZATION_r18.md.
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val out = s"$outDir/${name}_$tag.txt"
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out), txt)
        println(s"[plandump] wrote $out")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
