package graft

import org.apache.spark.sql.SparkSession

/** Dumps the physical plans of the representative queries PLANS.md
  * audits. Usage: `runMain graft.PlanDump <sfDir>` — output is the raw
  * fenced block of PLANS.md.
  */
object PlanDump {
  private val audited = Seq(
    "q01_agg_pricing", "q02_filter_project", "q03_join_inner",
    "q12_sort_limit", "q37_dedup_minhash", "q40_ann_bruteforce",
    "q59_grouping_sets", "q60_salted_join", "q63_seq_packing",
    "q65_embed_quantize", "q77_custom_topk_plan", "q79_decontaminate",
    "q82_rarity_scoring", "q51_dedup_pipeline", "q88_paragraph_dedup",
    "q89_decontaminate_bloom", "q90_cms_heavy_hitters",
    "q91_epoch_mix", "q92_gk_quantiles", "q62_source_quota",
    "q93_curation_chain")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    audited.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
      println()
    }
    spark.stop()
  }
}
