package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.TextFunctions._
import graft.sources.Tables

/** End-to-end corpus dedup pipeline — the composed training-data curation
  * operator (SURVEY §2.14): exact-duplicate collapse → MinHash banding
  * candidates → exact-Jaccard verification → connected components →
  * per-cluster representative → deduplicated corpus.
  *
  * Scale design: exact (token-identical) duplicates are collapsed to one
  * canonical doc per distinct content BEFORE banding, so an m-document
  * identical cluster costs one hash-agg instead of ~4·C(m,2) band-join
  * rows (see [[exactCollapse]]); candidates come only from LSH bucket
  * collisions (never the O(n²) pair space), with oversized buckets
  * star-routed linearly; verification joins shingle sets for candidate
  * pairs only; connected components is iterative smallest-label
  * propagation over the (sparse) duplicate graph, converging in
  * O(log diameter) joins — dup clusters are tiny in practice, so this
  * terminates in 1-3 rounds on real corpora.
  */
object Curation {

  /** (doc_id, shingle) rows, tokens materialized before shingling. */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingles(col("t"))).as("s"))

  /** Exact-duplicate collapse: (doc_id, cdoc) where cdoc is the minimum
    * doc_id sharing the same token sequence. Token-identical docs have
    * identical shingle SETS, hence identical minhash signatures in EVERY
    * band — so a cluster of m exact copies would emit ~4·C(m,2) pairs
    * from the band self-join before `distinct()`. On a real 100 TB crawl,
    * million-document boilerplate clusters (empty pages, error pages,
    * licence headers) are routine, and m = 1M means ~2×10¹² join rows
    * from one hot bucket. Collapsing to one canonical doc per distinct
    * content and banding ONLY canonicals removes that quadratic entirely,
    * and is semantics-preserving: exact copies have Jaccard 1 against
    * their canonical, so they are by definition in its near-dup cluster,
    * and because the canonical is the group MINIMUM the component's final
    * label (min doc_id) is unchanged.
    *
    * Docs with < w tokens produce no shingles, were never banded, and
    * therefore never merged by the uncollapsed pipeline — they keep a
    * per-doc unique key here so the collapse cannot merge what banding
    * would not have.
    *
    * Shuffle cost: doc_id + a 32-char digest per document (~50 B/doc) —
    * the corpus text and tokens are NEVER shuffled by the collapse. The
    * canonical FILTER is applied downstream of the minhash aggregation
    * (see [[bandRows]]), where the data is already one small row per
    * document, so the collapse adds only digest-sized exchanges at any
    * corpus size.
    */
  private def exactCollapse(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(col("doc_id"),
        when(size(t) >= 3, md5(concat_ws(" ", t)))
          .otherwise(concat(lit("uniq:"), col("doc_id").cast("string"))).as("dg"))
      .withColumn("cdoc", min(col("doc_id")).over(Window.partitionBy(col("dg"))))
      .select(col("doc_id"), col("cdoc"))
  }

  /** Band buckets larger than this route to linear candidates instead of
    * the pairwise self-join, so one pathological bucket of NEAR-identical
    * (post-collapse, so not exact) docs cannot go quadratic. Routed
    * candidates are a STAR (bucket-min → member) plus a deterministic
    * hash-order CHAIN (each member → its successor in md5(doc_id) order
    * within an md5 sub-bucket): the star keeps the bucket connected
    * through its minimum when members really are mutually similar, and
    * the chain recovers member–member sub-cliques the star alone loses —
    * the adversarial geometry where minhash signatures collide but the
    * bucket minimum is BELOW threshold against a clique of mutually
    * similar members (possible because signature agreement does not
    * bound pairwise Jaccard: a small shared block can own all 8 minima).
    * Both edge families are linear in bucket size, and every candidate
    * still passes exact-Jaccard verification. Coverage is measured, not
    * assumed: CurationSpec plants that adversarial bucket and counts
    * recovered pairs (numbers in SCALE.md); [[hotBuckets]] exposes
    * exactly which buckets were routed.
    */
  val DefaultHotBucketLimit: Int = 100000

  /** Diagnostic: (band, sig, size) of every bucket above `limit` — run
    * this to see which buckets [[minhashCandidates]] star-routed.
    */
  def hotBuckets(docs: DataFrame, limit: Int = DefaultHotBucketLimit): DataFrame =
    bandRows(shingleRows(docs), Some(canonicalIds(exactCollapse(docs))))
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("size"))
      .filter(col("size") > limit)

  /** doc_ids that are their own canonical under [[exactCollapse]]. */
  private def canonicalIds(members: DataFrame): DataFrame =
    members.filter(col("doc_id") === col("cdoc")).select(col("doc_id"))

  /** LSH candidate pairs: k=8 md5-derived minhashes, 4 bands × 2 rows.
    *
    * Exact duplicates are collapsed before banding (see [[exactCollapse]])
    * and re-attached as linear (canonical → member) star candidates —
    * identical docs have Jaccard 1, so downstream verification keeps the
    * stars at any threshold ≤ 1 and connected components merges the group
    * exactly as the uncollapsed quadratic form would have.
    */
  def minhashCandidates(
      docs: DataFrame, hotBucketLimit: Int = DefaultHotBucketLimit,
      chainHexChars: Int = 3): DataFrame = {
    val members = exactCollapse(docs)
    val canonPairs = minhashCandidatesFromShingles(
      shingleRows(docs), Some(canonicalIds(members)), hotBucketLimit, chainHexChars)
    val stars = members.filter(col("doc_id") =!= col("cdoc"))
      .select(col("cdoc").as("da"), col("doc_id").as("db"))
    canonPairs.union(stars)
  }

  /** (doc_id, band, sig) rows: 8 minhashes → 4 bands of 2.
    *
    * `canonIds`, when given, keeps only exact-dup canonicals — applied
    * AFTER the minhash aggregation, where the table is already one small
    * row per document, so restricting banding to canonicals costs a
    * semi-join on (doc_id, 8 longs) rows, never a pass over text or
    * shingles. (Shingling every doc and discarding dup signatures post-agg
    * is map-side linear work; attaching canonical TEXT before shingling
    * would instead shuffle the corpus.)
    */
  private def bandRows(sh: DataFrame, canonIds: Option[DataFrame]): DataFrame = {
    val hashed = sh.select(
      col("doc_id") +:
        (0 until 8).map(i => hash60Seeded(lit(i), col("s")).as(s"h$i")): _*)
    val minhAll = hashed.groupBy(col("doc_id"))
      .agg((0 until 8).map(i => min(col(s"h$i")).as(s"mh$i")).head,
        (1 until 8).map(i => min(col(s"h$i")).as(s"mh$i")): _*)
    val minh = canonIds.fold(minhAll)(ids =>
      minhAll.join(ids, Seq("doc_id"), "left_semi"))
    minh.select(col("doc_id"),
      expr("""stack(4,
               0, concat(mh0, ',', mh1),
               1, concat(mh2, ',', mh3),
               2, concat(mh4, ',', mh5),
               3, concat(mh6, ',', mh7)) AS (band, sig)"""))
  }

  private def minhashCandidatesFromShingles(
      sh: DataFrame, canonIds: Option[DataFrame], hotBucketLimit: Int,
      chainHexChars: Int = 3): DataFrame = {
    // one window pass annotates every row with its bucket size and bucket
    // minimum; the (band, sig) clustering it establishes is the same one
    // the self-join needs, so EnsureRequirements reuses the exchange
    val w = Window.partitionBy(col("band"), col("sig"))
    val sized = bandRows(sh, canonIds)
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min(col("doc_id")).over(w))
    val small = sized.filter(col("bsz") <= hotBucketLimit)
    val pairs = small.alias("a")
      .join(small.alias("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val hot = sized.filter(col("bsz") > hotBucketLimit)
    val star = hot.filter(col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("da"), col("doc_id").as("db"))
    // chain: successor edges in md5(doc_id) order, windowed per md5
    // sub-bucket so a 1B-member hot bucket sorts as 4096 parallel chains
    // (~250k rows each), never one task. Sub-chains are disconnected from
    // each other, but each member still star-routes to the bucket min, so
    // bucket-level connectivity never regresses below star-only routing.
    // chainHexChars: 3 → 4096 sub-chains (default), 0 → one chain (test
    // scale), < 0 → star-only routing (the measured-coverage baseline).
    // Positive widths go through the shared validated long-typed bucket
    // helper (ADVICE r7: an unvalidated int cast overflowed past 7 hex
    // digits to NULL, silently collapsing every overflowed row into one
    // null sub-bucket — the single-task sort sub-chaining exists to avoid).
    if (chainHexChars < 0) pairs.union(star).distinct()
    else {
      val subB =
        if (chainHexChars == 0) lit(0)
        else DataPrep.hexPrefixBucket(col("hh"), chainHexChars)
      val chainW = Window.partitionBy(col("band"), col("sig"), col("sb"))
        .orderBy(col("hh"), col("doc_id"))
      val chain = hot
        .withColumn("hh", md5(col("doc_id").cast("string")))
        .withColumn("sb", subB)
        .withColumn("prev", lag(col("doc_id"), 1).over(chainW))
        .filter(col("prev").isNotNull)
        .select(least(col("prev"), col("doc_id")).as("da"),
          greatest(col("prev"), col("doc_id")).as("db"))
      pairs.union(star).union(chain).distinct()
    }
  }

  /** Keeps only candidate pairs whose exact shingle Jaccard ≥ threshold. */
  def verifyPairs(docs: DataFrame, candidates: DataFrame, threshold: Double): DataFrame =
    verifyPairsFromShingles(shingleRows(docs), candidates, threshold)

  private def verifyPairsFromShingles(
      sh: DataFrame, candidates: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // 64-bit hashed join keys (same rationale as q36: small shuffle keys,
    // cheap probes) but NO df-cap here: the candidate list already bounds
    // the join size, and capping inside verification has a failure mode
    // the pairwise path doesn't — a duplicate CLUSTER larger than the cap
    // has every shared shingle above it, so capped overlap counts drop to
    // 0 and exactly the largest duplicate clusters silently fail to merge
    // (ADVICE r3). The cap stays where it belongs: the q36 exact
    // SELF-join, whose blow-up it exists to prevent.
    val kept = sh.select(col("doc_id"), xxhash64(col("s")).as("sk"))
    // equi-join on (db, shingle-hash), NOT join-then-filter: the latter
    // crosses every da-shingle with every db-shingle per candidate pair
    // (~10^4 rows/pair) before filtering; including sk in the join key
    // keeps it a hash join sized by the actual intersections
    val common = candidates
      .join(kept.select(col("doc_id").as("da"), col("sk")), "da")
      .join(kept.select(col("doc_id").as("db2"), col("sk").as("sk2")),
        col("db") === col("db2") && col("sk") === col("sk2"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components of the duplicate graph.
    *
    * Hybrid strategy (same reasoning as broadcast-join thresholds): the
    * verified dup-edge list is ~O(actual duplicates), tiny relative to the
    * corpus even at 100 TB, so when it fits comfortably on the driver
    * (≤ `driverEdgeLimit`, ~16 MB) a local union-find + broadcast-mapped
    * join replaces the iterative job loop. Beyond the limit, distributed
    * smallest-label propagation takes over — one join round per hop of
    * component diameter, erroring loudly if `maxIter` rounds don't
    * converge (silent truncation would report one cluster as several).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    val e = edges.select(col("da"), col("db")).persist()
    val nEdges = e.count()
    if (nEdges <= driverEdgeLimit) {
      val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      e.unpersist()
      // path-compressed union-find over only the docs that appear in
      // edges; find is iterative — recursion would overflow the stack on
      // chain-shaped graphs approaching driverEdgeLimit
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var cur = x
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
      }
      val mapping = parent.keys.map(d => (d, find(d))).toSeq
      val spark = nodes.sparkSession
      import spark.implicits._
      val mapDf = mapping.toDF("doc_id", "rep0")
      nodes.join(broadcast(mapDf), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep0"), col("doc_id")).as("rep"))
    } else distributedCC(nodes, e, maxIter)
  }

  private def distributedCC(nodes: DataFrame, edges: DataFrame, maxIter: Int): DataFrame = {
    // undirected edge list, both directions
    val sym = edges.select(col("da").as("src"), col("db").as("dst"))
      .union(edges.select(col("db").as("src"), col("da").as("dst")))
    // initial labels are persisted too, so every iteration follows the
    // same discipline: cache next, count the diff, release the old
    var labels = nodes.select(col("doc_id"), col("doc_id").as("rep")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = sym
        .join(labels, col("src") === col("doc_id"))
        .groupBy(col("dst")).agg(min(col("rep")).as("nrep"))
      val next = labels
        .join(neighborMin, labels("doc_id") === neighborMin("dst"), "left")
        .select(labels("doc_id"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      next.cache()
      changed = next.alias("n")
        .join(labels.alias("o"), col("n.doc_id") === col("o.doc_id"))
        .filter(col("n.rep") =!= col("o.rep")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge within $iter rounds " +
          s"($changed labels still changing) — raise maxIter")
    // rounds-to-converge is the scale-relevant number (one join round per
    // hop of component diameter) — surface it for probes and ops logs
    System.err.println(s"[graft] distributed CC converged in $iter rounds")
    lastDistributedCCRounds = iter
    // optimization r19 (honest measurement, VERDICT r18 what's-wrong #6):
    // the final labels used to be RETURNED STILL CACHED — CacheManager
    // keys on the canonicalized plan, so a later bench rep of the same
    // query silently reused this rep's converged labels ("Asked to cache
    // already cached data" warnings per rep) and flattered q51b's median
    // while blocking any honest per-rep rewrite from measuring a win.
    // Materialize once outside the cache manager (localCheckpoint also
    // bounds the downstream lineage, which the cache did not), then
    // release the cached iterate.
    val out = labels.localCheckpoint()
    labels.unpersist()
    out
  }

  /** Rounds the most recent [[distributedCC]] run took to converge —
    * diagnostic only (ScaleProbe reports it next to wall time; the VALUE
    * returned by the operator never depends on it).
    *
    * DELIBERATELY module-level and last-writer-wins: two CONCURRENT
    * clusterAssignments runs in one JVM would race, and the reader could
    * see the other run's rounds. Its only consumer is the single-run
    * ScaleProbe cc mode (one probe per JVM); anything needing per-call
    * rounds under concurrency should parse the `[graft] distributed CC
    * converged` log line or extend distributedCC to return the count —
    * do NOT report this field from concurrent jobs (ADVICE r6 #3).
    */
  @volatile private[graft] var lastDistributedCCRounds: Int = -1

  /** The full pipeline: returns (doc_id, rep) where rep is the canonical
    * (minimum) doc_id of the near-duplicate cluster; docs with rep ==
    * doc_id form the deduplicated corpus.
    */
  def clusterAssignments(docs: DataFrame, threshold: Double,
      hotBucketLimit: Int = DefaultHotBucketLimit,
      driverEdgeLimit: Long = 1000000L,
      chainHexChars: Int = 3): DataFrame = {
    // exact duplicates never reach banding, verification, or CC: collapse
    // first (see exactCollapse — this is what keeps identical-document
    // mega-clusters from making the band self-join quadratic), restrict
    // banding, verification, and CC to the content-distinct canonicals,
    // and expand the canonical labels back over the membership map at the
    // end. Because each canonical is its exact-group minimum, the
    // expanded labels are bit-identical to the uncollapsed pipeline's.
    val members = exactCollapse(docs).persist()
    val canon = canonicalIds(members)
    // shingles feed candidate generation AND verification — cache once
    // instead of recomputing the tokenize→shingle→explode pipeline 3×.
    // ALL docs' shingles (map-side linear; dup signatures are discarded
    // post-minhash-agg by the canonIds semi-join, where rows are already
    // small) — canonical-only shingling would need text joined back to
    // the membership map, i.e. a full corpus shuffle.
    val sh = shingleRows(docs).persist()
    try {
      val pairs = verifyPairsFromShingles(
        sh, minhashCandidatesFromShingles(sh, Some(canon), hotBucketLimit,
          chainHexChars), threshold)
      // CC materializes its labels per iteration, so sh can be released
      val canonCC = connectedComponents(canon, pairs,
        driverEdgeLimit = driverEdgeLimit)
      members
        .join(canonCC.select(col("doc_id").as("cdoc"), col("rep")), "cdoc")
        .select(col("doc_id"), col("rep"))
    } finally { sh.unpersist(); members.unpersist() }
  }

  /** Per-stage wall + row profile of [[clusterAssignments]] — the
    * drift-triage instrumentation VERDICT r11 next #2 asked for. Each
    * stage is persisted and forced with count() so a stage's number is
    * its own cost, not its ancestors' recompute; the stage graph and
    * parameters are exactly clusterAssignments'. Diagnostic only (the
    * declared queries never call it); surfaced via ScaleProbe mode
    * `q51stages`. */
  private[graft] def stageTimings(docs: DataFrame, threshold: Double,
      hotBucketLimit: Int = DefaultHotBucketLimit,
      driverEdgeLimit: Long = 1000000L,
      chainHexChars: Int = 3): Seq[(String, Double, Long)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stage[A](name: String)(f: => (A, Long)): A = {
      val t0 = System.nanoTime()
      val (a, rows) = f
      b += ((name, (System.nanoTime() - t0) / 1e9, rows))
      a
    }
    val members = stage("exact_collapse") {
      val m = exactCollapse(docs).persist(); (m, m.count())
    }
    val canon = stage("canonical_ids") {
      val c = canonicalIds(members).persist(); (c, c.count())
    }
    val sh = stage("shingle_persist") {
      val s = shingleRows(docs).persist(); (s, s.count())
    }
    val cand = stage("minhash_candidates") {
      val c = minhashCandidatesFromShingles(sh, Some(canon), hotBucketLimit,
        chainHexChars).persist()
      (c, c.count())
    }
    val pairs = stage("jaccard_confirm") {
      val p = verifyPairsFromShingles(sh, cand, threshold).persist()
      (p, p.count())
    }
    val cc = stage("connected_components") {
      val l = connectedComponents(canon, pairs,
        driverEdgeLimit = driverEdgeLimit)
      (l, l.count())
    }
    stage("expand_labels") {
      val o = members
        .join(cc.select(col("doc_id").as("cdoc"), col("rep")), "cdoc")
        .select(col("doc_id"), col("rep"))
      (o, o.count())
    }
    Seq(members, canon, sh, cand, pairs).foreach(_.unpersist())
    b.toSeq
  }

  def dedupedCorpus(docs: DataFrame, threshold: Double): DataFrame =
    docs.join(clusterAssignments(docs, threshold)
        .filter(col("rep") === col("doc_id")).select(col("doc_id")), "doc_id")

  // ---------------------------------------------------------------- q51
  // Pipeline over the driver corpus (which DOES contain planted near-dup
  // pairs at jaccard ≈ 0.99). The oracle replays the ENTIRE pipeline in
  // SQL — md5-reproducible minhash banding, exact-jaccard verification,
  // and connected components as a recursive transitive closure — so both
  // false positives and false negatives break the match.
  private val q51 = GraftQuery(
    "q51_dedup_pipeline",
    (s, dir) =>
      clusterAssignments(Tables.documents(s, dir), threshold = 0.5)
        .orderBy(col("doc_id")),
    Some(dedupPipelineOracle))

  // --------------------------------------------------------------- q51b
  // The SAME pipeline forced onto the distributed smallest-label-
  // propagation CC path (driverEdgeLimit = 0) — the shape that runs when
  // the verified dup-edge list outgrows the driver at 100 TB. Shares
  // q51's recursive-transitive-closure oracle VERBATIM: a hash match
  // here proves the distributed path computes the identical clustering
  // the driver union-find does (VERDICT r11 next #6 — CurationSpec
  // already forces this path on a synthetic graph; this pins it with an
  // oracle-checked CORRECTNESS row on the real corpus).
  private val q51b = GraftQuery(
    "q51b_dedup_pipeline_dcc",
    (s, dir) =>
      clusterAssignments(Tables.documents(s, dir), threshold = 0.5,
        driverEdgeLimit = 0L)
        .orderBy(col("doc_id")),
    Some(dedupPipelineOracle))

  private lazy val dedupPipelineOracle: String = """
      WITH RECURSIVE
      sh AS (SELECT doc_id, unnest(sh) AS s
             FROM (SELECT doc_id,
                          list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
                   FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'),
                                                    x -> x <> '') AS t
                         FROM documents) tt
                   WHERE len(t) >= 3) s0),
      hashed AS (SELECT doc_id, i,
                        ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || s), 1, 15))::BIGINT AS h
                 FROM sh CROSS JOIN range(0, 8) r(i)),
      minh AS (SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY doc_id, i),
      bands AS (SELECT doc_id, i // 2 AS band,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
                FROM minh GROUP BY doc_id, i // 2),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      common AS (SELECT da, db, COUNT(*) AS c
                 FROM cand JOIN sh a ON a.doc_id = da
                           JOIN sh b ON b.doc_id = db AND a.s = b.s
                 GROUP BY da, db),
      edges AS (SELECT da, db FROM common
                JOIN sizes na ON na.doc_id = da JOIN sizes nb ON nb.doc_id = db
                WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5),
      sym AS (SELECT da AS src, db AS dst FROM edges
              UNION ALL SELECT db, da FROM edges),
      reach AS (SELECT doc_id AS a, doc_id AS b FROM documents
                UNION
                SELECT r.a, e.dst FROM reach r JOIN sym e ON e.src = r.b)
      SELECT a AS doc_id, MIN(b) AS rep FROM reach GROUP BY a ORDER BY doc_id"""

  val all: Seq[GraftQuery] = Seq(q51, q51b)
}
