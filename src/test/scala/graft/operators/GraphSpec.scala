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

  test("hits: bit-exact vs a driver replay of the L1 fixed-point scheme; hubs/authorities separate on a bipartite graph") {
    import spark.implicits._
    // weighted bipartite-ish digraph: h1, h2 point at a1, a2; a2 also
    // points at h1 (so h1 has nonzero authority too)
    val edgeSeq = Seq(("h1", "a1", 3L), ("h1", "a2", 1L),
      ("h2", "a1", 2L), ("h2", "a2", 5L), ("a2", "h1", 1L))
    val edges = edgeSeq.toDF("src", "dst", "w")
    val got = Graph.hits(edges, iters = 3)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // driver replay: floor(s*w*2^40) LONG folds, L1 normalize by the
    // exact LONG total — the same arithmetic in the same order
    val SCALE = 1099511627776.0
    val nodes = (edgeSeq.map(_._1) ++ edgeSeq.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0 / nodes.size).toMap
    var auth = Map.empty[String, Double]
    for (_ <- 0 until 3) {
      val ar = edgeSeq.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => math.floor((hub(e._1) * e._3.toDouble) * SCALE).toLong).sum
      }
      val at = ar.values.sum
      auth = nodes.map(v => v -> ar.getOrElse(v, 0L).toDouble / at.toDouble).toMap
      val hr = edgeSeq.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => math.floor((auth(e._2) * e._3.toDouble) * SCALE).toLong).sum
      }
      val ht = hr.values.sum
      hub = nodes.map(v => v -> hr.getOrElse(v, 0L).toDouble / ht.toDouble).toMap
    }
    for (v <- nodes) {
      assert(java.lang.Double.doubleToLongBits(got(v)._1) ==
        java.lang.Double.doubleToLongBits(auth(v)), s"auth($v): ${got(v)._1} vs ${auth(v)}")
      assert(java.lang.Double.doubleToLongBits(got(v)._2) ==
        java.lang.Double.doubleToLongBits(hub(v)), s"hub($v): ${got(v)._2} vs ${hub(v)}")
    }
    // structural law: pure hubs have ~zero authority relative to the
    // pointed-at side; a1/a2 dominate authority, h1/h2 dominate hubness
    assert(got("a1")._1 > got("h2")._1 && got("a2")._1 > got("h2")._1)
    assert(got("h1")._2 > got("a1")._2 && got("h2")._2 > got("a1")._2)
    // L1 invariant: each score vector sums to ~1 (floor loss < 1e-9)
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }
}
