package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Crawl snapshot diffing — the incremental-crawl bookkeeping between
  * two content snapshots `(url, content_md5)`: which URLs were added /
  * removed / changed / unchanged, and the per-host change rate that
  * drives recrawl frequency (hosts that churn get crawled often;
  * parked hosts decay — the scheduling signal [[Sitemaps]] lastmod and
  * [[Feeds]] pub dates approximate from the OUTSIDE, measured here
  * from actual content).
  *
  * Shape: ONE full-outer join on the URL key (both sides key-
  * partitioned — SortMergeJoin at 10^11 URLs, the q115 corpus-diff
  * class) + one hosts-sized rollup; change rate is exact per-mille
  * (`changed·1000 div (changed+unchanged)`, NULL when nothing
  * re-observed — refuse-visibly rather than claim stability).
  */
object Snapshots {

  /** Per-URL classification: `(url, class)` with class ∈
    * added | removed | changed | unchanged. */
  def crawlDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("url"), col("content_md5").as("__old"))
    val n = newSnap.select(col("url"), col("content_md5").as("__new"))
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") === col("__new"), lit("unchanged"))
          .otherwise(lit("changed")).as("class"))
  }

  /** Host-level rollup of [[crawlDiff]]:
    * `(host, n_added, n_removed, n_changed, n_unchanged,
    * change_permille)`. */
  def crawlDiffByHost(diff: DataFrame): DataFrame = {
    def n(c: String) =
      sum(when(col("class") === c, 1L).otherwise(0L)).as(s"n_$c")
    diff
      .withColumn("host", UrlOps.urlHost(col("url")))
      .filter(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(n("added"), n("removed"), n("changed"), n("unchanged"))
      .select(col("host"), col("n_added"), col("n_removed"),
        col("n_changed"), col("n_unchanged"),
        // exact integer per-mille: `div`, never FP division
        when(col("n_changed") + col("n_unchanged") > 0,
          expr("(n_changed * 1000) div (n_changed + n_unchanged)"))
          .as("change_permille"))
  }

  // ---------------------------------------------------- fixture corpus
  // Old snapshot: every document's URL with its text hash. New
  // snapshot rotation: %11 pages vanish (removed), %7 pages change
  // content (v2 suffix), %13 docs ALSO publish a brand-new URL
  // (added); the rest re-observe unchanged. Rotations overlap (a %77
  // doc is both removed-at-old-url and absent-from-new) — precedence
  // is structural: removal means absence, so the %11 arm wins by
  // construction in both engines.
  private def urlOf(idExpr: org.apache.spark.sql.Column) =
    concat(lit("https://"), col("source"), lit(".example.com/p/"),
      idExpr.cast("string"))

  private val q200 = GraftQuery(
    "q200_crawl_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val old = docs.select(urlOf(col("doc_id")).as("url"),
        md5(col("text")).as("content_md5"))
      val newKept = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .select(urlOf(col("doc_id")).as("url"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            md5(concat(col("text"), lit("v2"))))
            .otherwise(md5(col("text"))).as("content_md5"))
      val newAdded = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(urlOf(col("doc_id") + lit(1000000L)).as("url"),
          md5(col("source")).as("content_md5"))
      crawlDiffByHost(crawlDiff(old, newKept.unionAll(newAdded)))
        .orderBy(col("host"))
    },
    Some("""
      WITH old AS (
        SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               md5(text) AS h, source
        FROM documents),
      neww AS (
        SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 7 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS h,
               source
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id + 1000000 AS VARCHAR),
               md5(source), source
        FROM documents WHERE doc_id % 13 = 0),
      d AS (
        SELECT COALESCE(o.source, n.source) AS source,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'removed'
                    WHEN o.h = n.h THEN 'unchanged'
                    ELSE 'changed' END AS class
        FROM old o FULL OUTER JOIN neww n ON o.url = n.url),
      g AS (
        SELECT source || '.example.com' AS host,
               SUM(CASE WHEN class = 'added' THEN 1 ELSE 0 END) AS n_added,
               SUM(CASE WHEN class = 'removed' THEN 1 ELSE 0 END) AS n_removed,
               SUM(CASE WHEN class = 'changed' THEN 1 ELSE 0 END) AS n_changed,
               SUM(CASE WHEN class = 'unchanged' THEN 1 ELSE 0 END) AS n_unchanged
        FROM d GROUP BY source)
      SELECT host,
             CAST(n_added AS BIGINT) AS n_added,
             CAST(n_removed AS BIGINT) AS n_removed,
             CAST(n_changed AS BIGINT) AS n_changed,
             CAST(n_unchanged AS BIGINT) AS n_unchanged,
             CASE WHEN n_changed + n_unchanged > 0
                  THEN CAST(n_changed * 1000 // (n_changed + n_unchanged) AS BIGINT) END AS change_permille
      FROM g
      ORDER BY host"""))

  val all: Seq[GraftQuery] = Seq(q200)
}
