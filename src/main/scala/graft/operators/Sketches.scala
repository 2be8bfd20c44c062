package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Approximate/sketch aggregates (SURVEY §2.14): HLL++ distinct counts and
  * approximate percentiles — the constant-memory alternatives to exact
  * distinct/percentile shuffles at 100 TB. Estimates are engine-specific,
  * so there is no DuckDB oracle (driver records rows-only); the exact
  * counterparts are oracle-checked in q26/q44, and the estimate-vs-exact
  * error bound is asserted in ScalaTest.
  */
object Sketches {

  private val q43 = GraftQuery(
    "q43_approx_sketches",
    (s, dir) =>
      Tables.lineitemWide(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95_price"))
        .orderBy(col("l_returnflag")),
    None)

  // Exact counterpart (oracle-checked) so the sketch error is measurable.
  private val q44 = GraftQuery(
    "q44_exact_distinct",
    (s, dir) =>
      Tables.lineitemWide(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  val all: Seq[GraftQuery] = Seq(q43, q44)
}
