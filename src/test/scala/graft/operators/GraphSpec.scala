package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** PageRank/TextRank laws on micro-graphs; value-level parity vs DuckDB
  * is the driver's q114 oracle gate.
  */
class GraphSpec extends SparkSpec {

  test("symmetric regular graph converges to uniform rank immediately") {
    import spark.implicits._
    // undirected triangle: every node has identical in/out structure, so
    // rank stays exactly 1/3 at every iteration (the update maps uniform
    // to uniform up to the floor-quantization, which is identical per node)
    val edges = Seq(("a","b"),("b","a"),("b","c"),("c","b"),("a","c"),("c","a"))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val r = Graph.pageRank(edges, iters = 4, damping = 0.85, nNodes = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    val vals = r.values.toSeq
    assert(vals.forall(v => math.abs(v - 1.0 / 3) < 1e-9), s"non-uniform: $r")
  }

  test("hub outranks leaves on a star graph; mass is conserved") {
    import spark.implicits._
    val leaves = (1 to 8).map(i => s"l$i")
    val edges = (leaves.map(l => ("hub", l)) ++ leaves.map(l => (l, "hub")))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val r = Graph.pageRank(edges, iters = 5, damping = 0.85, nNodes = 9)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(leaves.forall(l => r("hub") > r(l)), s"hub must dominate: $r")
    // total mass ~1 (floor quantization only ever loses < 2^-40 per edge)
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass leak: ${r.values.sum}")
  }

  test("pageRank is exactly partitioning-independent (floor-scaled sums)") {
    val docs = Tables.load(spark, sf001, "documents")
    val e = Graph.coocEdges(docs, "text")
    val n = e.select(col("src")).union(e.select(col("dst"))).distinct().count()
    def run(edges: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(edges, iters = 3, damping = 0.85, nNodes = n)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = run(e)
    val b = run(e.repartition(13, col("dst")))
    assert(a == b, "bit-identical ranks required across partitionings")
  }

  test("textRank: deterministic top-k, ranks positive and descending") {
    val docs = Tables.load(spark, sf001, "documents")
    def top() = Graph.textRank(docs, "text", iters = 3, damping = 0.85, k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val a = top()
    assert(a == top(), "rerun-stable")
    assert(a.size == 10 && a.forall(_._2 > 0.0))
    assert(a.map(-_._2) == a.map(-_._2).sorted, s"not rank-descending: $a")
  }

  test("handleSinks conserves dangling mass that the default run drains (q147 law)") {
    import spark.implicits._
    // a chain into a sink: a -> b -> c, c has no out-edges
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    def total(handle: Boolean) =
      Graph.pageRank(edges, iters = 5, damping = 0.85, nNodes = 3,
        handleSinks = handle)
        .agg(org.apache.spark.sql.functions.sum("rank")).head().getDouble(0)
    val drained = total(handle = false)
    val kept = total(handle = true)
    // with redistribution the mass stays ~1 (floor-scaling loses < 1e-9);
    // without it the sink's inflow exits the system every iteration
    assert(math.abs(kept - 1.0) < 1e-6, s"handled total $kept")
    assert(drained < 0.75, s"default run should drain on this chain, got $drained")
    // symmetric graphs have no sinks: handleSinks must be a no-op there
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    def ranks(handle: Boolean) =
      Graph.pageRank(sym, iters = 3, damping = 0.85, nNodes = 3,
        handleSinks = handle)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks(handle = true) == ranks(handle = false))
  }
}
