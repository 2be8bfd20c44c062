package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Replaces the reference's hand-rolled control plane (yamr
  * job_tracker.py:120-276 scheduler + worker.py heartbeats) with Spark's
  * scheduler/shuffle/fault-tolerance. Local defaults are sized for the
  * test harness (local[32], 32 shuffle partitions); on a real cluster the
  * same code runs unchanged — AQE re-plans partition counts at runtime, so
  * `spark.sql.shuffle.partitions` is only the pre-AQE upper bound.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")

  /** Local session for tests / standalone mains. */
  def local(appName: String = "graft", threads: String = "*"): SparkSession = {
    val s = builder(appName).master(s"local[$threads]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
