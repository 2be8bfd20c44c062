package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Iterative graph analytics as engine ops (ABSENT in the reference —
  * SURVEY §2 has no iterative surface at all): weighted PageRank on an
  * edge list, and TextRank (Mihalcea & Tarau 2004) — PageRank over the
  * word co-occurrence graph — as the corpus-curation application
  * (keyword/centrality extraction; the same loop runs host-graph
  * centrality for web-corpus selection when edges are links, the
  * Common Crawl ranking use).
  *
  * Determinism discipline (the q103 exact-sum scheme, applied per
  * iteration): rank mass entering a node is summed as floor(x * 2^40)
  * LONGs, so the per-iteration aggregation is exact and
  * order-independent, and every double op around it has a fixed
  * left-assoc order — the whole k-iteration computation replays
  * bit-identically in the unrolled DuckDB oracle (q114). No
  * transcendentals anywhere.
  *
  * Scale: state per iteration is one (node, rank) frame; each step is
  * edges ⋈ ranks on src (both sides partitioned by the join key — at
  * fixed partitioning the shuffle is edges-sized, the Pregel shape)
  * followed by one hash-agg on dst. k iterations = k such steps;
  * nothing driver-side but the node count. Dangling nodes: callers
  * pass symmetric edges for undirected graphs (TextRank does), so
  * every node has out-weight; directed link graphs pass
  * `handleSinks = true` to redistribute dangling mass exactly
  * (q147) instead of silently draining it.
  */
object Graph {

  private val SCALE = 1099511627776.0 // 2^40 — lossless for these magnitudes

  /** Weighted PageRank over `edges` (src, dst, w: long); returns (node,
    * rank). `nNodes` is the rank-mass denominator (pass the graph's node
    * count — one driver long). Every node appearing as a src must have
    * positive out-weight; nodes only ever seen as dst still receive and
    * hold mass.
    *
    * `handleSinks` (VERDICT r10 next #7): with the default `false`, a
    * directed sink's mass silently drains each iteration (fine for
    * TextRank's symmetric graphs, where sinks cannot exist); with
    * `true`, each iteration redistributes the sinks' total mass equally
    * to every node IN THE SAME 2^40 integer scheme — the sink sum is an
    * exact LONG fold of floor-scaled ranks and the per-node share is an
    * integer `div` (both engines truncate non-negative identically), so
    * the sink-handling run replays bit-for-bit in an unrolled oracle
    * (q147) just like the plain one (q114). This is the standard
    * dangling-mass completion (Page et al. 1999 §2.5) that makes
    * host-graph centrality safe by default on link graphs.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
      nNodes: Long, handleSinks: Boolean = false): DataFrame = {
    require(iters >= 0 && damping > 0.0 && damping < 1.0 && nNodes > 0,
      s"need iters >= 0, 0 < damping < 1, nNodes > 0; got $iters, $damping, $nNodes")
    // Materialize the loop-invariant frames ONCE and cut lineage at every
    // iteration (forced by the node-sized count) — without this each
    // iteration re-derives the edge list from its upstream lineage and
    // the final plan re-scans the corpus ~10× per iteration (caught in
    // the round-10 PLANS.md audit: 28 file scans for 3 iterations). This
    // is the standard Spark iterative shape: per-iteration state is one
    // node-sized cached frame, previous iterations are dropped as soon
    // as the next is materialized. In a production run the caches land
    // in MEMORY_AND_DISK; edges at 100 TB-corpus vocab scale are the
    // co-occurrence aggregate, orders smaller than the corpus itself.
    val e = edges.select(col("src"), col("dst"), col("w")).persist()
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val withOw = e.join(outW, "src").persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().persist()
    // loop-invariant sink set: nodes that never appear as a src
    val sinks = if (handleSinks)
      Some(nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").persist())
    else None
    var ranks = nodes.withColumn("rank", lit(1.0 / nNodes))
    var prev: Option[DataFrame] = None
    val base = lit((1.0 - damping) / nNodes)
    for (_ <- 0 until iters) {
      val contrib = withOw
        .join(ranks.withColumnRenamed("node", "src"), "src")
        // fixed op order: ((rank * w) / ow) scaled to an exact LONG, so
        // the incoming-mass sum is order-independent
        .select(col("dst").as("node"),
          floor(((col("rank") * col("w").cast("double")) /
            col("ow").cast("double")) * lit(SCALE)).cast("long").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      val joined = nodes.join(contrib, Seq("node"), "left")
      val next = (sinks match {
        case Some(sk) =>
          // exact sink mass: LONG fold of floor-scaled sink ranks (one
          // KB row), per-node share by integer div — both truncate
          // non-negative identically in any engine
          val sinkCs = sk.join(ranks, Seq("node"))
            .agg(coalesce(sum(floor(col("rank") * lit(SCALE)).cast("long")),
              lit(0L)).as("scs"))
          joined.crossJoin(broadcast(sinkCs))
            .select(col("node"),
              (base + lit(damping) *
                ((coalesce(col("cs"), lit(0L)) +
                  expr(s"scs div CAST($nNodes AS BIGINT)")).cast("double") /
                  lit(SCALE))).as("rank"))
        case None =>
          joined.select(col("node"),
            (base + lit(damping) *
              (coalesce(col("cs"), lit(0L)).cast("double") / lit(SCALE)))
              .as("rank"))
      }).persist()
      next.count() // force: lineage cut, predecessor safe to drop
      prev.foreach(_.unpersist())
      prev = Some(next)
      ranks = next
    }
    // loop-invariant caches are no longer needed once the final ranks
    // frame is materialized; the returned (cached) frame is self-contained
    e.unpersist(); withOw.unpersist(); nodes.unpersist()
    sinks.foreach(_.unpersist())
    ranks
  }

  /** Word co-occurrence edges from adjacent token pairs, symmetric
    * (undirected TextRank graph): (src, dst, w = pair count). Self-pairs
    * dropped. One explode + one hash-agg over the corpus. */
  def coocEdges(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val pairs = toks.select(
      explode(sequence(lit(1), size(col("t")) - 1)).as("i"), col("t"))
      .select(element_at(col("t"), col("i")).as("a"),
        element_at(col("t"), col("i") + 1).as("b"))
      .filter(col("a") =!= col("b"))
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** TextRank keywords: PageRank over [[coocEdges]], top-k by (rank
    * DESC, term) via sort+limit. The vocabulary node count is one
    * driver-side long (bounded: it is the corpus vocabulary). */
  def textRank(docs: DataFrame, textCol: String, iters: Int,
      damping: Double, k: Int): DataFrame = {
    val e = coocEdges(docs, textCol)
    val n = e.select(col("src").as("node")).union(e.select(col("dst")))
      .distinct().count()
    pageRank(e, iters, damping, n)
      .orderBy(col("rank").desc, col("node"))
      .limit(k)
      .select(col("node").as("term"), col("rank"))
  }

  // ---------------------------------------------------------------- q114
  // Declared TextRank query: 3 unrolled PageRank iterations over the
  // corpus co-occurrence graph, rank doubles hash-compared. The oracle
  // needs NO generated literals: the graph, the node count, and every
  // iteration replay from the data with the same fixed-order arithmetic
  // (damping as a quoted literal, incoming mass as exact floor-scaled
  // BIGINT sums).
  private val DAMP = 0.85
  private val ITERS = 3

  private def unrolledOracle(k: Int): String = {
    val d = s"CAST('$DAMP' AS DOUBLE)"
    val iterCtes = (1 to ITERS).map { i =>
      s"""it$i AS (
         |  SELECT n.node,
         |         ((CAST('${1.0 - DAMP}' AS DOUBLE) / nn.n) + $d * (CAST(COALESCE(c.cs, 0) AS DOUBLE) / 1099511627776.0)) AS rank
         |  FROM nodes n CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |           SUM(CAST(FLOOR(((r.rank * CAST(e.w AS DOUBLE)) / CAST(o.ow AS DOUBLE)) * 1099511627776.0) AS BIGINT)) AS cs
         |    FROM edges e JOIN outw o ON e.src = o.src
         |                 JOIN it${i - 1} r ON e.src = r.node
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    s"""WITH toks AS (SELECT list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS t
       |              FROM documents),
       |occ AS (SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2),
       |pr AS (SELECT t[i] AS a, t[i+1] AS b FROM occ WHERE t[i] <> t[i+1]),
       |sym AS (SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr),
       |edges AS (SELECT src, dst, COUNT(*) AS w FROM sym GROUP BY src, dst),
       |outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |it0 AS (SELECT node, (CAST(1.0 AS DOUBLE) / nn.n) AS rank FROM nodes CROSS JOIN nn),
       |${iterCtes.mkString(",\n")}
       |SELECT node AS term, rank FROM it$ITERS
       |ORDER BY rank DESC, node
       |LIMIT $k""".stripMargin
  }

  private val q114 = GraftQuery(
    "q114_textrank",
    (s, dir) => textRank(Tables.documents(s, dir), "text",
      iters = ITERS, damping = DAMP, k = 20),
    Some(unrolledOracle(20)))

  // ---------------------------------------------------------------- q147
  // Sink-handling PageRank on a DIRECTED graph that actually has sinks:
  // the order→part bipartite graph from lineitem ('o<orderkey>' →
  // 'p<partkey>', w = line count). Every part node is a sink — without
  // redistribution ~all mass drains by iteration 2, so the query is a
  // non-vacuous exercise of the dangling-mass path. The oracle unrolls
  // the same 3 iterations with the sink CTEs: exact LONG sink-mass
  // folds, integer-div per-node share, identical double op order —
  // rank doubles hash-compare bit-for-bit, the q114 discipline.
  private def sinkOracle(k: Int): String = {
    val d = s"CAST('$DAMP' AS DOUBLE)"
    val iterCtes = (1 to ITERS).map { i =>
      s"""s$i AS (
         |  SELECT COALESCE(SUM(CAST(FLOOR(r.rank * 1099511627776.0) AS BIGINT)), 0) AS scs
         |  FROM it${i - 1} r JOIN sinks s ON r.node = s.node),
         |it$i AS (
         |  SELECT n.node,
         |         ((CAST('${1.0 - DAMP}' AS DOUBLE) / nn.n) + $d * (CAST(COALESCE(c.cs, 0) + (SELECT scs // (SELECT n FROM nni) FROM s$i) AS DOUBLE) / 1099511627776.0)) AS rank
         |  FROM nodes n CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |           SUM(CAST(FLOOR(((r.rank * CAST(e.w AS DOUBLE)) / CAST(o.ow AS DOUBLE)) * 1099511627776.0) AS BIGINT)) AS cs
         |    FROM edges e JOIN outw o ON e.src = o.src
         |                 JOIN it${i - 1} r ON e.src = r.node
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    s"""WITH edges AS (SELECT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
       |                      'p' || CAST(l_partkey AS VARCHAR) AS dst,
       |                      COUNT(*) AS w
       |               FROM lineitem GROUP BY 1, 2),
       |outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |nni AS (SELECT COUNT(*) AS n FROM nodes),
       |nn AS (SELECT CAST(n AS DOUBLE) AS n FROM nni),
       |sinks AS (SELECT node FROM nodes WHERE node NOT IN (SELECT DISTINCT src FROM edges)),
       |it0 AS (SELECT node, (CAST(1.0 AS DOUBLE) / nn.n) AS rank FROM nodes CROSS JOIN nn),
       |${iterCtes.mkString(",\n")}
       |SELECT node, rank FROM it$ITERS
       |ORDER BY rank DESC, node
       |LIMIT $k""".stripMargin
  }

  private val q147 = GraftQuery(
    "q147_pagerank_sinks",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(concat(lit("o"), col("l_orderkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val n = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct().count()
      pageRank(edges, iters = ITERS, damping = DAMP, nNodes = n,
        handleSinks = true)
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },
    Some(sinkOracle(20)))

  val all: Seq[GraftQuery] = Seq(q114, q147)
}
