package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** One-pass table profiler — the "what is in this corpus" scan a team
  * runs before pointing a pipeline at 100 TB of parquet: per column, row
  * count, null count, distinct cardinality, min/max, and mean formatted
  * length, in long format (one row per column).
  *
  * Scale design: the product path ([[profile]]) is ONE partial-aggregated
  * scan computing every per-column statistic as a plain (non-distinct)
  * aggregate — cardinalities are HLL estimates (`approx_count_distinct`,
  * rsd 1%), NOT `countDistinct`, because mixing several DISTINCT
  * aggregates in one agg makes `RewriteDistinctAggregates` Expand every
  * row (ncols+1)× before shuffling (the q43 lesson, Sketches.scala:23) —
  * at the target scale that turns one 100 TB pass into a 600 TB shuffle.
  * The long-format pivot afterwards explodes a SINGLE aggregated row,
  * which costs nothing. Reference frame: yamr exposes no profiling
  * surface at all (SURVEY §2.13 — its control plane reports task state,
  * not data state); this is part of the §2.14 extension mandate.
  */
object Profiler {

  /** Per-column stats over `cols` in one scan. Output one row per column:
    * (col_name, n_rows, n_nulls, n_distinct_est, min_val, max_val,
    * avg_len). min/max compare in the column's native type and are cast
    * to string only for the long-format output; avg_len is the mean
    * length of the value's string form, exact-decimal-rounded so the
    * number is aggregation-order-independent.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        approx_count_distinct(col(c), 0.01).as(s"__ad_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        // one IEEE double division over exact integer sum/count — bit-
        // identical in any engine, no decimal-intermediate rounding edge
        (sum(length(col(c).cast("string"))).cast("double") /
          count(col(c)).cast("double")).as(s"__avg_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    wide.select(explode(array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ad_$c").as("n_distinct_est"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"),
        col(s"__avg_$c").as("avg_len"))
    }: _*)).as("p")).select("p.*")
  }

  /** Exact per-column distinct counts — one pruned single-column scan per
    * column (each plans as a two-phase agg on the value, no Expand). This
    * is the measurement harness for the estimate law, not the product
    * path: at 100 TB you run [[profile]] once; you run this only for the
    * columns whose exact cardinality you actually need.
    */
  def exactDistincts(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)).agg(countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_.union(_))

  // --------------------------------------------------------------- q100
  // Declared profiler query over every documents column, oracled in the
  // q43 error-law style: the exact values (counts, nulls, exact distinct,
  // min/max, avg_len) compare value-for-value, and the HLL cardinality
  // estimate is pinned as a within-5% boolean against the exact count
  // (rsd 1% → ~5-sigma headroom), so the estimator itself is under test
  // without asking two engines to agree on register arithmetic.
  private val docCols = Seq("doc_id", "lang", "n_chars", "source", "text")

  private def oracleCol(c: String): String =
    s"""SELECT '$c' AS col_name,
       |       COUNT(*) AS n_rows,
       |       COUNT(*) - COUNT($c) AS n_nulls,
       |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
       |       TRUE AS distinct_within_5pct,
       |       CAST(MIN($c) AS VARCHAR) AS min_val,
       |       CAST(MAX($c) AS VARCHAR) AS max_val,
       |       CAST(SUM(LENGTH(CAST($c AS VARCHAR))) AS DOUBLE)
       |            / CAST(COUNT($c) AS DOUBLE) AS avg_len
       |FROM documents""".stripMargin

  private val q100 = GraftQuery(
    "q100_profile",
    (s, dir) => {
      // RAW accessor, not Tables.documents: the widening repartition
      // exists for CPU-heavy per-row pipelines; a profiler is scan-bound,
      // and paying the full-text exchange once per sub-scan (the main
      // pass + five exact-distinct scans) tripled the measured cost
      val docs = Tables.load(s, dir, "documents")
      profile(docs, docCols)
        .join(exactDistincts(docs, docCols), Seq("col_name"))
        .select(
          col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
          (abs(col("n_distinct_est") - col("n_distinct")) <=
            col("n_distinct") * lit(0.05)).as("distinct_within_5pct"),
          col("min_val"), col("max_val"), col("avg_len"))
        .orderBy(col("col_name"))
    },
    Some(docCols.map(oracleCol).mkString("", "\nUNION ALL\n",
      "\nORDER BY col_name")))

  // --------------------------------------------------------------- q136
  // Referential-integrity audit: per foreign-key edge, child row count,
  // orphan count (child keys with no parent), and basis-point orphan
  // rate — the warehouse-QA pass that catches a broken ingest join
  // BEFORE a downstream training query silently inner-joins the
  // orphans away. Each edge is one left-anti join on the key: orphan
  // counting shuffles only keys, the parent side broadcasts when small
  // (dims) or shuffles hash-keyed when not (AQE decides), and nulls in
  // the child key count as orphans of record (a null FK can never
  // join — the audit's job is to say so, not drop it).
  //
  // Orphan rate is integer basis points (orphans·10000 DIV n_child) so
  // the row replays with no float division.

  /** One audit row per (edge name, child df, child key, parent df,
    * parent key). */
  def integrityAudit(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "audit needs at least one FK edge")
    edges.map { case (name, child, ck, parent, pk) =>
      val orphans = child.select(col(ck).as("__k"))
        .join(parent.select(col(pk).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val total = child.agg(count(lit(1)).as("n_child"))
      total.crossJoin(orphans)
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
          expr("n_orphans * 10000L DIV n_child").as("orphan_bp"))
    }.reduce(_ unionAll _)
  }

  private val q136 = GraftQuery(
    "q136_integrity_audit",
    (s, dir) => {
      integrityAudit(Seq(
        ("lineitem.l_orderkey->orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.load(s, dir, "orders"), "o_orderkey"),
        ("orders.o_custkey->customer", Tables.load(s, dir, "orders"), "o_custkey",
          Tables.load(s, dir, "customer"), "c_custkey"),
        ("customer.c_nationkey->nation", Tables.load(s, dir, "customer"), "c_nationkey",
          Tables.load(s, dir, "nation"), "n_nationkey"),
        ("events.user_id->customer", Tables.events(s, dir), "user_id",
          Tables.load(s, dir, "customer"), "c_custkey")))
        .orderBy(col("fk_edge"))
    },
    Some("""
      WITH e AS (
        SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
               (SELECT COUNT(*) FROM lineitem) AS n_child,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders r
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = r.o_custkey))
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL
        SELECT 'events.user_id->customer',
               (SELECT COUNT(*) FROM events),
               (SELECT COUNT(*) FROM events v
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = v.user_id)))
      SELECT fk_edge, n_child, n_orphans,
             (n_orphans * 10000) // n_child AS orphan_bp
      FROM e
      ORDER BY fk_edge"""))

  val all: Seq[GraftQuery] = Seq(q100, q136)
}
