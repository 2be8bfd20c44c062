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

  // Mergeable-state HLL counterpart (SURVEY §2.14 "custom aggregate only
  // if mergeable sketch state must be exported"): same estimates family as
  // q43, but through the engine's own Aggregator whose register state can
  // be persisted per shard and folded incrementally — asserted in
  // AggregatorsSpec (merge law + ≤5% error). Estimate → rows-only check.
  private val q67 = GraftQuery(
    "q67_hll_mergeable",
    (s, dir) => {
      val hll = udaf(new graft.mr.Aggregators.HllAggregator(12),
        org.apache.spark.sql.Encoders.scalaLong)
      Tables.lineitemWide(s, dir)
        .select(col("l_returnflag"), xxhash64(col("l_partkey")).as("h"))
        .groupBy(col("l_returnflag"))
        .agg(hll(col("h")).as("est_parts"))
        .orderBy(col("l_returnflag"))
    },
    None)

  val all: Seq[GraftQuery] = Seq(q43, q44, q67)
}
