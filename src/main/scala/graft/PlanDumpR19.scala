package graft

import org.apache.spark.sql.SparkSession

/** Round-19 plan capture. Two modes:
  *
  *   - final-frame dumps (the PlanDumpR18 behavior):
  *     `runMain graft.PlanDumpR19 <sfDir> <outDir> <tag> <q1,q2,...>`
  *   - loop-iteration dumps (VERDICT r18 next #5): same invocation with
  *     queries whose operators tap [[IterProbe]] — every tapped
  *     iteration's `explain("formatted")` is ALSO written, as
  *     `<query>_iter_<loop>_<k>_<tag>.txt`, captured mid-loop BEFORE the
  *     iteration's localCheckpoint (so the plan shows which side arrives
  *     pre-partitioned instead of the 13-line final checkpointed frame).
  *
  * The probe only explains, never executes; loop queries run their loops
  * eagerly during construction, so building the frame is enough to fire
  * every tap.
  */
object PlanDumpR19 {
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
    def write(path: String, txt: String): Unit = {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), txt)
      println(s"[plandump] wrote $path")
    }
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      try {
        IterProbe.probe = Some { (loop, k, frame) =>
          write(s"$outDir/${name}_iter_${loop}_${k}_$tag.txt",
            frame.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        }
        val df = SparkEntry.queries(name)(spark, sfDir)
        write(s"$outDir/${name}_$tag.txt",
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      } finally IterProbe.probe = None
    }
    spark.stop()
  }
}
