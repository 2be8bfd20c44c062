package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** The engine's user-facing API in one place: every training-data
  * pipeline operation as a plain DataFrame/Dataset function, independent
  * of the declared-query harness. Each forwards to the operator module
  * that implements (and oracle-verifies) it — this object adds no logic,
  * only discoverability: a consumer imports `graft.Pipeline` and composes
  * these like `org.apache.spark.sql.functions`.
  *
  * Everything relational (joins, windows, aggregates, set ops, scalar
  * functions) is deliberately NOT wrapped: that surface IS the Spark
  * DataFrame API, used directly.
  */
object Pipeline {

  // ---- dedup -----------------------------------------------------------
  /** (doc_id, band, sig) MinHash/LSH band signatures (k=8, b=4×r=2). */
  def bandSigs(docs: DataFrame): DataFrame = operators.Dedup.bandSigs(docs)

  /** Admit `batch` rows with no exact or LSH-band collision in `corpus`. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame): DataFrame =
    operators.Dedup.incrementalDedup(batch, corpus)

  /** Same admission against STORED corpus signature tables (production:
    * bucket them by join key and the corpus side joins shuffle-free).
    */
  def incrementalDedupStored(batch: DataFrame, corpusHashes: DataFrame,
      corpusBands: DataFrame): DataFrame =
    operators.Dedup.incrementalDedupStored(batch, corpusHashes, corpusBands)

  /** MinHash band-collision candidate pairs for the curation pipeline. */
  def minhashCandidates(docs: DataFrame): DataFrame =
    operators.Curation.minhashCandidates(docs)

  /** Exact-Jaccard verification of candidate pairs at `threshold`. */
  def verifyPairs(docs: DataFrame, candidates: DataFrame, threshold: Double): DataFrame =
    operators.Curation.verifyPairs(docs, candidates, threshold)

  /** Duplicate-cluster ids per doc (banding → verify → connected components). */
  def clusterAssignments(docs: DataFrame, threshold: Double): DataFrame =
    operators.Curation.clusterAssignments(docs, threshold)

  /** The deduplicated corpus: one representative per near-dup cluster. */
  def dedupedCorpus(docs: DataFrame, threshold: Double): DataFrame =
    operators.Curation.dedupedCorpus(docs, threshold)

  /** SemDeDup survivors: drop same-IVF-cell neighbors above `thr` cosine. */
  def semanticDedup(embeddings: DataFrame, thr: Double, nlist: Int): DataFrame =
    operators.Similarity.semanticDedup(embeddings, thr, nlist)

  /** One corpus's shingle-set HLL registers (serialized, mergeable). */
  def shingleHllState(docs: DataFrame, p: Int = 14): Array[Byte] =
    operators.Dedup.shingleHllState(docs, p)

  /** (estA, estB, estUnion) from two serialized states — overlap triage
    * before launching a cross-corpus dedup (q106). */
  def overlapEstimates(a: Array[Byte], b: Array[Byte]): (Long, Long, Long) =
    operators.Dedup.overlapEstimates(a, b)

  // ---- similarity search ------------------------------------------------
  /** Hyperplane-LSH approximate top-k cosine neighbors (recall knobs =
    * nPlanes + hamming-1 multiprobe); bucket equi-joins, broadcast query
    * side.
    */
  def lshTopK(embeddings: DataFrame, isQuery: Column, k: Int,
      nPlanes: Int = 8, dim: Int = 64, probeRadius: Int = 1): DataFrame =
    operators.Similarity.lshTopK(embeddings, isQuery, k, nPlanes, dim, probeRadius)

  /** IVF approximate top-k cosine neighbors for the `isQuery` rows. */
  def ivfTopK(embeddings: DataFrame, isQuery: Column, k: Int,
      nlist: Int, nprobe: Int): DataFrame =
    operators.Similarity.ivfTopK(embeddings, isQuery, k, nlist, nprobe)

  /** The IVF index as a storable table: (vec_id, v, norm, cell). Persist
    * bucketed by `cell`, then probe with [[ivfTopKStored]] — index cost
    * paid once, not per query run.
    */
  def ivfAssignments(embeddings: DataFrame, nlist: Int): DataFrame =
    operators.Similarity.ivfAssignments(embeddings, nlist)

  /** IVF top-k against a stored [[ivfAssignments]] table (the production
    * probe path: corpus vectors are never re-folded against centroids).
    */
  def ivfTopKStored(assigned: DataFrame, isQuery: Column,
      cents: Array[Array[Double]], k: Int, nprobe: Int): DataFrame =
    operators.Similarity.ivfTopKStored(assigned, isQuery, cents, k, nprobe)

  // ---- curation / filtering ---------------------------------------------
  /** Drop `train` rows sharing any word n-gram with `eval`. */
  def decontaminate(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    operators.DataPrep.decontaminate(train, eval_, idCol, textCol, n)

  /** Constant-size bloom form of [[decontaminate]] for very large eval
    * suites: no false negatives ever; false positives over-drop at a
    * rate set by numBits/expectedItems. Builds the filter eagerly (one
    * job).
    */
  def decontaminateBloom(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, expectedItems: Long, numBits: Long): DataFrame =
    operators.DataPrep.decontaminateBloom(train, eval_, idCol, textCol, n,
      expectedItems, numBits)

  /** Two-phase decontamination: bloom prefilter → exact confirm on the
    * suspects only. Kept set == [[decontaminate]] exactly (no false
    * negatives), at the bloom's scan cost plus a suspect-sized gram join.
    */
  def decontaminateTwoPhase(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, expectedItems: Long, numBits: Long): DataFrame =
    operators.DataPrep.decontaminateTwoPhase(train, eval_, idCol, textCol, n,
      expectedItems, numBits)

  /** Fuzzy (near-duplicate) decontamination: drop train docs whose LSH
    * band signature collides with an eval doc's AND whose exact shingle
    * Jaccard confirms ≥ `threshold` — catches paraphrased eval leakage
    * the verbatim-gram forms miss.
    */
  def decontaminateFuzzy(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.5): DataFrame =
    operators.Dedup.decontaminateFuzzy(train, eval_, idCol, textCol, threshold)

  /** The audit/report form of [[decontaminateFuzzy]]: confirmed
    * (doc_id, eval_id, jaccard) contamination pairs.
    */
  def fuzzyContaminatedPairs(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame =
    operators.Dedup.fuzzyContaminatedPairs(train, eval_, idCol, textCol, threshold)

  /** Per-row bloom admission predicate over the blob from
    * [[operators.DataPrep.evalGramBloom]] — stateless, so legal and
    * identical in batch and Structured Streaming plans (the streaming
    * admission gate of the curation chain).
    */
  def bloomAdmit(textCol: org.apache.spark.sql.Column, bf: Array[Byte],
      n: Int): org.apache.spark.sql.Column =
    operators.DataPrep.bloomAdmit(textCol, bf, n)

  /** Paragraph-level exact dedup (RefinedWeb/CCNet line dedup): remove
    * paragraphs appearing in more than `maxDf` documents, reassemble
    * survivors in order → (id, clean_text, n_kept, n_dropped).
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      delim: String, maxDf: Long): DataFrame =
    operators.Dedup.paragraphDedup(docs, idCol, textCol, delim, maxDf)

  /** Exact repeated-substring dedup (Lee et al. 2021): remove every
    * repeated k-token span corpus-wide, keep the first occurrence →
    * (id, n_tokens, n_kept, n_dropped, clean_md5).
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    operators.Dedup.substringDedup(docs, idCol, textCol, k)

  /** [[substringDedup]] emitting the surviving text itself →
    * (id, clean_text, n_tokens, n_kept, n_dropped).
    */
  def substringDedupText(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    operators.Dedup.substringDedupText(docs, idCol, textCol, k)

  /** The full curation chain in one call: quality gate → two-phase
    * (bloom + exact-confirm) decontamination → exact+near dedup →
    * paragraph dedup → optional repeated-span dedup (`spanK` > 0) →
    * epoch mix → (id, group, n_copies).
    */
  def curationChain(docs: DataFrame, targetDocs: Long,
      spanK: Int = 0): DataFrame =
    operators.CurationChain.curationChain(docs, targetDocs, spanK)

  /** Gopher-style repetition signals per document. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.TextAnalysis.repetitionSignals(df, idCol, textCol)

  /** Corpus-statistics rarity scores per document. `minCount` > 1
    * pre-prunes the broadcast vocabulary (the Heaps-law OOM mitigation).
    */
  def rarityScores(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1L): DataFrame =
    operators.TextAnalysis.rarityScores(df, idCol, textCol, minCount)

  /** Mean smoothed bigram transition probability per document under the
    * corpus's own bigram LM (the statistical LM quality filter).
    * `minCount` > 1 pre-prunes the broadcast unigram vocabulary.
    */
  def bigramLmScores(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1L): DataFrame =
    operators.TextAnalysis.bigramLmScores(df, idCol, textCol, minCount)

  /** Positional k-gram index rows (persist bucketed by `gh`). */
  def gramIndex(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    operators.TextAnalysis.gramIndex(docs, idCol, textCol, k)

  /** Every (phrase, id, pos) exact-phrase occurrence via a [[gramIndex]]
    * (contamination forensics; phrase side broadcast, candidate-only
    * verification).
    */
  def phraseHits(docs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, phrases: Seq[String], k: Int): DataFrame =
    operators.TextAnalysis.phraseHits(docs, index, idCol, textCol, phrases, k)

  /** (id, tokens) verification artifact for [[phraseHitsStored]]
    * (persist bucketed+sorted by id next to the gram index).
    */
  def tokenTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.TextAnalysis.tokenTable(docs, idCol, textCol)

  /** Phrase probe against STORED bucketed artifacts: phrase-gram hashes
    * pushed as literal filters (bucket pruning + row-group skipping),
    * verification reads candidate buckets only — O(candidates) per query.
    */
  def phraseHitsStored(spark: org.apache.spark.sql.SparkSession,
      indexTable: String, tokensTable: String, idCol: String,
      phrases: Seq[String], k: Int, maxCandidateDocs: Int = 1000000): DataFrame =
    operators.TextAnalysis.phraseHitsStored(spark, indexTable, tokensTable,
      idCol, phrases, k, maxCandidateDocs)

  /** BM25 top-k ranked retrieval, inline form — index derived in-plan;
    * scores hash-oracled (q113). Idf/avgdl enter the plan as driver
    * literals (no transcendental in either engine). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    operators.TextAnalysis.bm25TopK(docs, idCol, textCol, terms, k, k1, b)

  /** BM25 probe against STORED bucketed postings/lengths: query-term
    * literals prune the postings read, candidate ids prune the lengths
    * read — O(postings of the query terms) per probe (Bm25Spec). */
  def bm25TopKStored(spark: org.apache.spark.sql.SparkSession,
      postingsTable: String, lengthsTable: String, idCol: String,
      terms: Seq[String], stats: operators.TextAnalysis.Bm25Stats, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxCandidateDocs: Int = 1000000): DataFrame =
    operators.TextAnalysis.bm25TopKStored(spark, postingsTable, lengthsTable,
      idCol, terms, stats, k, k1, b, maxCandidateDocs)

  /** PQ codebooks / encode / ADC shortlist top-k (q112): vectors as m
    * nibble codes (32x smaller), candidates scored by m table lookups —
    * the scan reads codes only. Train on a [[hashSample]] at scale. */
  def pqFit(embeddings: DataFrame, m: Int, dim: Int, ksub: Int,
      iters: Int, cacheKey: Option[String] = None): Array[Array[Array[Double]]] =
    operators.Similarity.pqFit(embeddings, m, dim, ksub, iters, cacheKey)

  def pqEncode(embeddings: DataFrame, books: Array[Array[Array[Double]]]): DataFrame =
    operators.Similarity.pqEncode(embeddings, books)

  def pqAdcTopK(encoded: DataFrame, isQuery: Column, k: Int,
      books: Array[Array[Array[Double]]]): DataFrame =
    operators.Similarity.pqAdcTopK(encoded, isQuery, k, books)

  /** Weighted PageRank over an edge list (src, dst, w): per-iteration
    * incoming mass summed as exact floor-scaled LONGs, so ranks are
    * bit-identical across partitionings and replayable by the unrolled
    * q114 oracle. Symmetric edges for undirected graphs; directed sinks
    * are the caller's concern (see [[operators.Graph.pageRank]]);
    * directed link graphs pass `handleSinks = true` (q147). */
  def pageRank(edges: DataFrame, iters: Int, damping: Double, nNodes: Long,
      handleSinks: Boolean = false): DataFrame =
    operators.Graph.pageRank(edges, iters, damping, nNodes, handleSinks)

  /** TextRank keyword extraction (PageRank over the word co-occurrence
    * graph) — corpus-level keyword/centrality signal (q114). */
  def textRank(docs: DataFrame, textCol: String, iters: Int,
      damping: Double, k: Int): DataFrame =
    operators.Graph.textRank(docs, textCol, iters, damping, k)

  /** IVFADC (q116): PQ codes of the residual per IVF cell; probes read
    * codes only, with per-(query, cell) ADC tables from plan literals. */
  def ivfadcEncode(embeddings: DataFrame, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame =
    operators.Similarity.ivfadcEncode(embeddings, cents, books)

  def ivfadcTopK(encoded: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]]): DataFrame =
    operators.Similarity.ivfadcTopK(encoded, queries, k, nprobe, cents, books)

  /** Square-loss linear probe on embeddings (q117): exact-scaled
    * gradients, d doubles of driver state per iteration. */
  def linearProbeFit(embeddings: DataFrame, labelExpr: Column, dim: Int,
      iters: Int, lr: Double): Array[Double] =
    operators.Similarity.linearProbeFit(embeddings, labelExpr, dim, iters, lr)

  /** Stored-IVF health report (q118): occupancy, share, quantization
    * error, imbalance factor — the data-driven refit trigger. */
  def ivfDiagnostics(assigned: DataFrame, cents: Array[Array[Double]]): DataFrame =
    operators.Similarity.ivfDiagnostics(assigned, cents)

  /** Corpus-wide top-K repeated token spans (q119) — the boilerplate
    * triage before substring dedup picks its k/threshold. */
  def frequentGrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int, topK: Int): DataFrame =
    operators.TextAnalysis.frequentGrams(docs, idCol, textCol, k, topK)

  /** Per-source HLL shingle states + all-pairs overlap estimates (q120)
    * — which corpus pairs need a cross-dedup, from KB-sized states. */
  def shingleHllStatesByGroup(docs: DataFrame, groupCol: String,
      p: Int = 14): Map[String, Array[Byte]] =
    operators.Dedup.shingleHllStatesByGroup(docs, groupCol, p)

  def overlapMatrix(states: Map[String, Array[Byte]]): Seq[(String, String, Long, Long, Long)] =
    operators.Dedup.overlapMatrix(states)

  /** Additive fold of BM25 corpus constants — the q121 append identity. */
  def bm25StatsMerge(base: operators.TextAnalysis.Bm25Stats,
      inc: operators.TextAnalysis.Bm25Stats): operators.TextAnalysis.Bm25Stats =
    operators.TextAnalysis.bm25StatsMerge(base, inc)

  /** Ordered funnel as staged min-timestamp aggregations (q122); the
    * streaming form is [[streaming.Streams.funnelStream]]. */
  def funnel(events: DataFrame, steps: Seq[String], windowSec: Long): DataFrame =
    operators.Windows.funnel(events, steps, windowSec)

  /** Trailing-window distinct from stored daily HLL states (q123). */
  def trailingDistinct(states: DataFrame, windowDays: Int, p: Int = 14): DataFrame =
    operators.Sketches.trailingDistinct(states, windowDays, p)

  def dailyUserStates(events: DataFrame, p: Int = 14): DataFrame =
    operators.Sketches.dailyUserStates(events, p)

  /** sqrt-temperature sampling weights per group. */
  def mixWeights(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    operators.DataPrep.mixWeights(df, groupCol, textCol)

  /** Materialize [[mixWeights]] into per-document repetition counts for a
    * targetDocs-sized epoch — deterministic, rerun-stable, exact quotas.
    */
  def epochMix(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, targetDocs: Long): DataFrame =
    operators.DataPrep.epochMix(docs, idCol, textCol, groupCol, targetDocs)

  /** Distributed running weight sum in (md5(id), id) order per group —
    * the two-level no-single-task-sort cumsum behind PPS sampling.
    * `weightCol` must be integral (refused loudly otherwise): sums are
    * exact LONGs, so fractional weights would be truncated per row —
    * pre-scale to integer units (e.g. micro-weights) first. */
  def md5BucketCumsum(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, cumAs: String, hexChars: Int = 3): DataFrame =
    operators.DataPrep.md5BucketCumsum(df, groupCol, idCol, weightCol, cumAs, hexChars)

  /** Weighted systematic (probability-proportional-to-size) sample: keep
    * rows whose cumulative-weight span crosses a multiple of `step`;
    * deterministic, RNG-free, selection oracle-pinned (q101). Integral
    * weights only — see [[md5BucketCumsum]]. */
  def weightedSystematicSample(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, step: Long): DataFrame =
    operators.DataPrep.weightedSystematicSample(df, groupCol, idCol, weightCol, step)

  /** PPS admission of a NEW batch laid after a frozen per-group
    * consumed-weight line — the incremental form of
    * [[weightedSystematicSample]]; chaining batches equals one systematic
    * pass over the concatenated line (law pinned in DataPrepSpec). For
    * the streaming wrapper see [[streaming.Streams.PpsAdmission]]. */
  def ppsAdmitBatch(batch: DataFrame, baseTotals: Map[String, Long],
      groupCol: String, idCol: String, weightCol: String, step: Long): DataFrame =
    operators.DataPrep.ppsAdmitBatch(batch, baseTotals, groupCol, idCol, weightCol, step)

  /** One-pass per-column profile (q100): counts, nulls, HLL cardinality
    * estimates, min/max, mean formatted length — no DISTINCT Expand. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    operators.Profiler.profile(df, cols)

  /** Exact per-column distincts (one pruned scan per column) — the
    * measurement harness for profile's estimate law. */
  def exactDistincts(df: DataFrame, cols: Seq[String]): DataFrame =
    operators.Profiler.exactDistincts(df, cols)

  /** Morton/z-order key over two 16-bit-bucketed dimensions (q102). */
  def zorder16(x: Column, y: Column): Column = plans.ScaleOps.zorder16(x, y)

  /** Approx-percentile boundaries for rank-bucketing a skewed dimension
    * into equal-population cells (q107). */
  def rankBoundaries(df: DataFrame, c: String, buckets: Int = 256): Array[Double] =
    plans.ScaleOps.rankBoundaries(df, c, buckets)

  /** Rank bucket = boundaries strictly below the value (literal fold). */
  def rankBucket(c: Column, boundaries: Array[Double]): Column =
    plans.ScaleOps.rankBucket(c, boundaries)

  /** Write z-order-clustered parquet: 2-dim box predicates prune row
    * groups by box volume (measured 7-8x vs a 1-dim sort, SCALE.md). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      files: Int = 32, rowsPerFile: Long = 4096): Unit =
    plans.ScaleOps.writeZOrdered(df, xCol, yCol, path, files, rowsPerFile)

  /** N-dim Morton key, floor(32/n) bits per dimension at write time via
    * the Seq overload; bit-compatible with zorder16 at n=2 (q110). */
  def zorderN(dims: Seq[Column], bitsPerDim: Int): Column =
    plans.ScaleOps.zorderN(dims, bitsPerDim)

  /** N-dim z-order-clustered write (3-dim box measured 5x over a 1-dim
    * sort, ScaleOpsSpec). */
  def writeZOrdered(df: DataFrame, dims: Seq[Column], path: String,
      files: Int, rowsPerFile: Long): Unit =
    plans.ScaleOps.writeZOrdered(df, dims, path, files, rowsPerFile)

  /** One-call skew-safe layout: rank boundaries + bucketing + z-ordered
    * write, boundaries persisted beside the data for batch-side reuse. */
  def writeZOrderedRank(df: DataFrame, xCol: String, yCol: String,
      path: String, buckets: Int = 256, files: Int = 32,
      rowsPerFile: Long = 4096): (Array[Double], Array[Double]) =
    plans.ScaleOps.writeZOrderedRank(df, xCol, yCol, path, buckets, files, rowsPerFile)

  /** Deterministic k-means seeds: first k vectors by (md5(id), id). */
  def kmeansInit(embeddings: DataFrame, k: Int): Array[Array[Double]] =
    operators.Similarity.kmeansInit(embeddings, k)

  /** One Lloyd iteration against centroid literals (q103): exact
    * 2^40-scaled means, (cell, dim, n, c_new) out. */
  def kmeansStep(embeddings: DataFrame, cents: Array[Array[Double]]): DataFrame =
    operators.Similarity.kmeansStep(embeddings, cents)

  /** Full k-means trainer: `iters` Lloyd rounds, k x dim driver state. */
  def kmeansFit(embeddings: DataFrame, k: Int, iters: Int): Array[Array[Double]] =
    operators.Similarity.kmeansFit(embeddings, k, iters)

  /** Upper-triangle covariance of the embedding column (q104): one scan,
    * one mergeable exact-moments buffer, no d2-keyed shuffle. */
  def covariance(embeddings: DataFrame, dim: Int): DataFrame =
    operators.Similarity.covariance(embeddings, dim)

  /** Covariance as a driver-side d x d array (bounded collect). */
  def covarianceMatrix(embeddings: DataFrame, dim: Int): Array[Array[Double]] =
    operators.Similarity.covarianceMatrix(embeddings, dim)

  /** Dominant eigenpair of a small matrix (tolerance-driven power
    * iteration, deterministic sign). */
  def pcaTopComponent(cov: Array[Array[Double]], iters: Int = 10000,
      tol: Double = 1e-14): (Array[Double], Double) =
    operators.Similarity.pcaTopComponent(cov, iters, tol)

  /** Corpus mean vector from the exact moments buffer. */
  def meanVector(embeddings: DataFrame, dim: Int): Array[Double] =
    operators.Similarity.meanVector(embeddings, dim)

  /** All-but-the-top postprocess (q105): center on the mean, remove the
    * dominant direction; stateless literal-driven scan, stream-safe. */
  def allButTheTop(embeddings: DataFrame, mean: Array[Double],
      u: Array[Double]): DataFrame =
    operators.Similarity.allButTheTop(embeddings, mean, u)

  /** Persistable per-shard moment states (~33 KB each at d=64), q109. */
  def momentShardStates(embeddings: DataFrame, dim: Int, shards: Int): DataFrame =
    operators.Similarity.momentShardStates(embeddings, dim, shards)

  /** Covariance from stored moment states: element-wise fold, history
    * never re-scanned; bit-identical to the single pass (q109). */
  def covarianceFromStates(states: DataFrame, dim: Int): DataFrame =
    operators.Similarity.covarianceFromStates(states, dim)

  /** Assign a new batch against frozen IVF centroids and append to the
    * stored assignment table — no refit, no history touch (q111). */
  def ivfAppend(newBatch: DataFrame, cents: Array[Array[Double]]): DataFrame =
    operators.Similarity.ivfAppend(newBatch, cents)

  /** Container header decode over a binary column: (format, width,
    * height, valid) from PNG/JPEG/GIF headers, codegen'd (q108). */
  def imageHeader(payload: Column): Column =
    graft.functions.ImageHeader(payload)

  def md5BucketRank(df: DataFrame, groupCol: String, idCol: String,
      rankAs: String, hexChars: Int = 3): DataFrame =
    operators.DataPrep.md5BucketRank(df, groupCol, idCol, rankAs, hexChars)

  /** Overlapping character chunks for context-window preprocessing. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, step: Int): DataFrame =
    operators.DataPrep.chunkDocs(df, idCol, textCol, chunkLen, step)

  /** Snapshot diff between two corpus versions: added / removed /
    * changed / unchanged per id by content hash (q115). Zero-exchange
    * when both snapshots are stored bucketed by id. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    operators.DataPrep.corpusDiff(oldDf, newDf, idCol, textCol)

  /** Deterministic hash-based train/val/test assignment. */
  def splitAssign(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    operators.DataPrep.splitAssign(df, idCol, trainPct, valPct)

  // ---- scale tools --------------------------------------------------------
  /** Skew-proof equi-join: explicit salt in the key, shuffle-hash pinned. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame =
    plans.ScaleOps.saltedJoin(left, right, key, factor)

  /** Custom whole-operator top-k per key (empty `keys` = global). */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    plans.TopKPerKey.topK(df, keys, order, k)

  // ---- reference-parity jobs ----------------------------------------------
  /** The reference's flagship word-count job (Unicode tokenizer parity). */
  def wordCount(corpus: Dataset[String]): Dataset[(String, Long)] =
    mr.Jobs.wordCount(corpus)

  /** The reference's max-temperature-per-year job. */
  def maxYearTemp(corpus: Dataset[String]): Dataset[(Int, Double)] =
    mr.Jobs.maxYearTemp(corpus)

  // ---- round-10 part 2 ------------------------------------------------------
  /** Dedup-canonical text normalization (CCNet-shaped): case/punct/
    * whitespace variants map to one canonical string (q133). */
  def dedupNormalized(text: Column): Column =
    functions.TextFunctions.dedupNormalized(text)

  /** Per-stage (n_in, n_drop, n_out) ledger with first-fail attribution
    * for an ordered filter cascade — one scan, one aggregate (q134). */
  def cascadeAccounting(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    operators.DataPrep.cascadeAccounting(df, stages)

  /** AND / AND-NOT boolean retrieval over (term, id, tf) postings (q129). */
  def booleanRetrieve(postings: DataFrame, idCol: String,
      must: Seq[String], mustNot: Seq[String]): DataFrame =
    operators.TextAnalysis.booleanRetrieve(postings, idCol, must, mustNot)

  /** Deterministic JL d→m projection (±1 md5 signs, exact-int outputs;
    * divide by 2⁴⁰·√m for the metric-preserving float form) (q126). */
  def jlProject(spark: org.apache.spark.sql.SparkSession, embeddings: DataFrame,
      d: Int, m: Int): DataFrame =
    operators.Similarity.jlProject(spark, embeddings, d, m)

  /** Per-dim exact-moment drift verdicts between two corpus slices
    * (`sideExpr` ∈ {0, 1}) — the data-driven refit gate (q128). */
  def embeddingDrift(embeddings: DataFrame, sideExpr: Column): DataFrame =
    operators.Similarity.embeddingDrift(embeddings, sideExpr)

  /** One-row key-skew profile + recommended salt factor (q127). */
  def keySkewProfile(df: DataFrame, keyName: String, keyCol: String,
      targetPerKey: Long): DataFrame =
    plans.ScaleOps.keySkewProfile(df, keyName, keyCol, targetPerKey)

  /** Audio/video container header decode: WAV fmt fields + mp4 brand
    * from a binary column, codegen'd, never throws (q131). */
  def mediaHeader(payload: Column): Column = functions.MediaHeader(payload)

  /** Per (event_type, day) counts + trailing-week spike verdicts (q135). */
  def ingestAnomaly(events: DataFrame): DataFrame =
    operators.Windows.ingestAnomaly(events)

  /** Per-FK-edge orphan accounting: (fk_edge, n_child, n_orphans,
    * orphan_bp) for each (name, child, childKey, parent, parentKey) (q136). */
  def integrityAudit(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    operators.Profiler.integrityAudit(edges)

  /** Per-column frequent values in ONE scan (one MG summary per column)
    * with worst-case-law verification columns (q137). */
  def frequentValues(df: DataFrame, cols: Seq[String], k: Int,
      topPerCol: Int): DataFrame =
    operators.Profiler.frequentValues(df, cols, k, topPerCol)

  /** Exact scaled-integer covariance numerators + sign verdicts for all
    * numeric column pairs in one scan (q138). */
  def columnCorrelation(df: DataFrame, cols: Seq[String]): DataFrame =
    operators.Profiler.columnCorrelation(df, cols)

  /** Per-(source, batch) token/stopword sums with >25%-relative drift
    * verdicts against the source's overall means (q140). */
  def qualityDrift(docs: DataFrame, batchExpr: Column): DataFrame =
    operators.TextAnalysis.qualityDrift(docs, batchExpr)

  /** Persistable per-(source, batch) additive quality counters — the
    * streaming/stored stage of [[qualityDrift]] (write one row per
    * trigger, fold later with [[qualityDriftFromSums]]). */
  def qualityBatchSums(docs: DataFrame, batchExpr: Column): DataFrame =
    operators.TextAnalysis.qualityBatchSums(docs, batchExpr)

  /** Drift verdicts from stored [[qualityBatchSums]] shard rows —
    * exact fold, history never re-scanned. */
  def qualityDriftFromSums(sums: DataFrame): DataFrame =
    operators.TextAnalysis.qualityDriftFromSums(sums)

  /** Per-shard correlation sum states (persist, then fold with
    * [[correlationFromSums]] — q145's stored-fold path). */
  def correlationShardSums(df: DataFrame, cols: Seq[String], idCol: Column,
      shards: Int): DataFrame =
    operators.Profiler.correlationShardSums(df, cols, idCol, shards)

  /** Correlation pair panel from stored shard sums — bit-identical to
    * the one-pass [[columnCorrelation]] (q145). */
  def correlationFromSums(sums: DataFrame, cols: Seq[String]): DataFrame =
    operators.Profiler.correlationFromSums(sums, cols)

  /** Gopher-style quality gates (length / word-length / alpha /
    * repetition) as exact integer verdicts (q148). */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.TextAnalysis.gopherQuality(docs, idCol, textCol)

  /** Per-domain document cap: keep the k md5-rank-first docs of every
    * domain, mega-domain-safe (q149). */
  def domainCap(docs: DataFrame, domainCol: String, idCol: String,
      k: Int): DataFrame =
    operators.DataPrep.domainCap(docs, domainCol, idCol, k)

  /** Length-bucketed sequence packing into fixed-budget training bins
    * (q150). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame =
    operators.DataPrep.packSequences(docs, idCol, textCol, budget)

  /** [[packSequences]] over a stored (id, n_tokens) length profile —
    * the production path (one tiny table, no double tokenize). */
  def packSized(sized: DataFrame, idCol: String, budget: Long): DataFrame =
    operators.DataPrep.packSized(sized, idCol, budget)

  /** Keep the best member of each duplicate cluster by a total order
    * (score desc, id) — TopKPerKey k=1 (q151). */
  def bestOfGroup(df: DataFrame, group: Column, order: Seq[Column]): DataFrame =
    operators.Dedup.bestOfGroup(df, group, order)

  /** Stratified eval split with exact floor(n*pct/100) per-stratum
    * allocation (q152). */
  def stratifiedSplit(docs: DataFrame, stratumCol: String, idCol: String,
      pctEval: Int): DataFrame =
    operators.DataPrep.stratifiedSplit(docs, stratumCol, idCol, pctEval)

  /** Arrival-order streaming quota admission per domain — the stream
    * form of [[domainCap]]. */
  def capAdmitBatch(batch: DataFrame, consumed: Map[String, Long],
      domainCol: String, idCol: String, k: Int): DataFrame =
    operators.DataPrep.capAdmitBatch(batch, consumed, domainCol, idCol, k)

  /** Exact winsorization cuts + clip accounting (q153); apply with
    * [[winsorizeClip]]. EAGERNESS CAVEAT (also at the impl): computing
    * the exact cuts runs bounded driver passes when you CALL this —
    * it is not a lazy frame builder; schedule it like an action. */
  def winsorizeStats(df: DataFrame, valueCol: String,
      orderCols: Seq[String], pLo: Int, pHi: Int): DataFrame =
    operators.Windows.winsorizeStats(df, valueCol, orderCols, pLo, pHi)

  /** Stateless clamp to precomputed winsorization cuts. */
  def winsorizeClip(v: Column, loCut: Double, hiCut: Double): Column =
    operators.Windows.winsorizeClip(v, loCut, hiCut)

  /** Per-group TOKEN-budget corpus selection along the md5 line (q155). */
  def tokenBudgetSelect(docs: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame =
    operators.DataPrep.tokenBudgetSelect(docs, groupCol, idCol, tokensCol,
      budgetTokens)

  /** Smallest frequency-ordered vocabulary covering each target percent
    * of token occurrences, exactly (q154). */
  def vocabCoverage(docs: DataFrame, textCol: String,
      targets: Seq[Int]): DataFrame =
    operators.TextAnalysis.vocabCoverage(docs, textCol, targets)

  /** Residual-PQ encode of a new batch against a frozen IVFADC model —
    * the append path (q146). */
  def ivfadcAppend(newBatch: DataFrame, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame =
    operators.Similarity.ivfadcAppend(newBatch, cents, books)

  /** Trailing-week spike verdicts over an already-aggregated
    * (event_type, day, n) daily table — the streaming-ingest verdict
    * stage (q135's shared core). */
  def anomalyFromDaily(daily: DataFrame): DataFrame =
    operators.Windows.anomalyFromDaily(daily)

  // ---- round-12 additions ---------------------------------------------------
  /** Full Gopher gate set (Rae et al. 2021 Table A1) — q148b. */
  def gopherQualityFull(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.TextAnalysis.gopherQualityFull(docs, idCol, textCol)

  /** Exact distributed BPE merge induction — q156. */
  def bpeMerges(docs: DataFrame, textCol: String, steps: Int): DataFrame =
    operators.TextAnalysis.bpeMerges(docs, textCol, steps)

  /** Vocabulary segmentation under the learned merges — q156b. */
  def bpeSegment(docs: DataFrame, textCol: String, steps: Int): DataFrame =
    operators.TextAnalysis.bpeSegment(docs, textCol, steps)

  /** Per-doc BPE token counts under the learned tokenizer — q156c. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      steps: Int): DataFrame =
    operators.TextAnalysis.bpeEncode(docs, idCol, textCol, steps)

  /** DSIR importance scoring vs a target slice — q157. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame =
    operators.TextAnalysis.dsirScore(docs, idCol, textCol, isTarget, buckets)

  /** The DSIR learn half as a stored artifact — pair with
    * [[dsirScoreStored]] so corpora are never re-read. */
  def dsirRatioTable(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame =
    operators.TextAnalysis.dsirRatioTable(docs, idCol, textCol, isTarget, buckets)

  /** Score a new batch against a persisted DSIR ratio table — q157b. */
  def dsirScoreStored(batch: DataFrame, idCol: String, textCol: String,
      ratio: DataFrame, buckets: Int = 4096): DataFrame =
    operators.TextAnalysis.dsirScoreStored(batch, idCol, textCol, ratio, buckets)

  /** Rendezvous (HRW) shard routing — minimal disruption on reshard (q158). */
  def rendezvousShard(id: Column, shards: Int): Column =
    plans.ScaleOps.rendezvousShard(id, shards)

  /** Deterministic (shard, file, slot) training-export manifest — q163. */
  def exportManifest(docs: DataFrame, idCol: String, shards: Int,
      docsPerFile: Long): DataFrame =
    plans.ScaleOps.exportManifest(docs, idCol, shards, docsPerFile)

  /** Interleaved (Bresenham) stratified split, exact at every prefix — q152b. */
  def stratifiedInterleaved(docs: DataFrame, stratumCol: String,
      idCol: String, pctEval: Int): DataFrame =
    operators.DataPrep.stratifiedInterleaved(docs, stratumCol, idCol, pctEval)

  /** Streaming admission form of [[stratifiedInterleaved]]. */
  def stratifiedAdmitBatch(batch: DataFrame, baseCounts: Map[String, Long],
      stratumCol: String, idCol: String, pctEval: Int): DataFrame =
    operators.DataPrep.stratifiedAdmitBatch(batch, baseCounts, stratumCol,
      idCol, pctEval)

  /** Streaming admission form of [[tokenBudgetSelect]]. */
  def tokenBudgetAdmitBatch(batch: DataFrame, baseTokens: Map[String, Long],
      groupCol: String, idCol: String, tokensCol: String,
      budgetTokens: Long): DataFrame =
    operators.DataPrep.tokenBudgetAdmitBatch(batch, baseTokens, groupCol,
      idCol, tokensCol, budgetTokens)

  /** Scale-safe stored-table cap admission + its state helpers. */
  def capAdmitBatchStored(batch: DataFrame, consumed: DataFrame,
      domainCol: String, idCol: String, k: Int): DataFrame =
    operators.DataPrep.capAdmitBatch(batch, consumed, domainCol, idCol, k)

  def domainCountsDf(batch: DataFrame, domainCol: String): DataFrame =
    operators.DataPrep.domainCountsDf(batch, domainCol)

  def foldDomainCounts(state: DataFrame, admitted: DataFrame,
      domainCol: String): DataFrame =
    operators.DataPrep.foldDomainCounts(state, admitted, domainCol)

  /** C4 cleaning rules (Raffel et al. 2020) — q160. */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String] = Seq.empty): DataFrame =
    operators.TextAnalysis.c4Clean(docs, idCol, textCol, blocklist)

  /** Hashed linear quality classifier (fastText-shape inference) — q161. */
  def linearQualityScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, bias: Long = 0L, buckets: Int = 4096,
      scale: Long = 1000L): DataFrame =
    operators.TextAnalysis.linearQualityScore(docs, idCol, textCol, weights,
      bias, buckets, scale)

  /** HITS hubs & authorities over a weighted edge list — q162. */
  def hits(edges: DataFrame, iters: Int): DataFrame =
    operators.Graph.hits(edges, iters)

  /** Encoding-damage audit (replacement/control/mojibake) — q164. */
  def encodingAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.Profiler.encodingAudit(docs, idCol, textCol)

  /** Source-concentration (HHI) audit in exact integer ppm — q165. */
  def sourceConcentration(docs: DataFrame, keyCol: String): DataFrame =
    operators.Profiler.sourceConcentration(docs, keyCol)

  /** Stored-shard fold form of [[sourceConcentration]] — q165b. */
  def sourceConcentrationFromCounts(counts: DataFrame): DataFrame =
    operators.Profiler.sourceConcentrationFromCounts(counts)

  def sourceCounts(docs: DataFrame, keyCol: String): DataFrame =
    operators.Profiler.sourceCounts(docs, keyCol)

  /** Flesch-Kincaid readability in exact centi-integer arithmetic — q166. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.TextAnalysis.readability(docs, idCol, textCol)

  /** Canonical URL (case/www/port/fragment/tracking-param/slash fold). */
  def canonicalizeUrl(url: Column): Column =
    operators.UrlOps.canonicalizeUrl(url)

  /** Canonical host of a URL (lowercased, www/port stripped). */
  def urlHost(url: Column): Column = operators.UrlOps.urlHost(url)

  /** Crawl-hygiene URL-level dedup (keep-first per canonical URL) — q167. */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    operators.UrlOps.urlDedup(docs, urlCol, idCol)

  /** Per-host profile + representative with `v:`-encoded key — q168. */
  def hostProfile(docs: DataFrame, urlCol: String, idCol: String,
      charsCol: String): DataFrame =
    operators.UrlOps.hostProfile(docs, urlCol, idCol, charsCol)

  /** Learn the stored char-n-gram language-ID model — q169. */
  def langIdModel(docs: DataFrame, textCol: String, langCol: String,
      buckets: Int = 4096, scale: Long = 1000000L): DataFrame =
    operators.LangId.langIdModel(docs, textCol, langCol, buckets, scale)

  /** Score a batch against a stored [[langIdModel]] — q169. */
  def langIdScore(batch: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    operators.LangId.langIdScore(batch, idCol, textCol, model)

  /** Additive per-shard language-ID trigram counts (stored artifact) — q169b. */
  def langIdCountShard(docs: DataFrame, textCol: String, langCol: String,
      buckets: Int = 4096): DataFrame =
    operators.LangId.langIdCountShard(docs, textCol, langCol, buckets)

  /** Fold stored count shards into the scoring model (≡ learn-once) — q169b. */
  def langIdModelFromShards(shards: DataFrame,
      scale: Long = 1000000L): DataFrame =
    operators.LangId.langIdModelFromShards(shards, scale)

  /** Drop docs whose host is on a stored `(host_key, rule)` blocklist — q170. */
  def hostGate(docs: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame =
    operators.UrlOps.hostGate(docs, urlCol, blocklist)

  /** Keep ONLY docs whose host is on a stored allowlist — q170 twin. */
  def hostAllowGate(docs: DataFrame, urlCol: String,
      allowlist: DataFrame): DataFrame =
    operators.UrlOps.hostAllowGate(docs, urlCol, allowlist)

  /** Per-rule drop ledger for [[hostGate]] (q134 cascade shape) — q170b. */
  def hostGateLedger(docs: DataFrame, urlCol: String,
      blocklist: DataFrame): DataFrame =
    operators.UrlOps.hostGateLedger(docs, urlCol, blocklist)

  /** Canonical path of a URL (fragment dropped, trailing slash folded). */
  def urlPath(url: Column): Column = operators.UrlOps.urlPath(url)

  /** Drop docs matching stored (host, path-prefix) block rules — q174. */
  def pathPrefixGate(docs: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame =
    operators.UrlOps.pathPrefixGate(docs, urlCol, rules)

  /** Extracted visible text of an HTML column (script/style/tag strip,
    * entity decode, whitespace fold) — q171. */
  def htmlText(html: Column): Column = operators.Extraction.htmlText(html)

  /** Per-doc HTML extraction audit (lengths + md5 of extracted text) — q171. */
  def htmlExtract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    operators.Extraction.htmlExtract(docs, idCol, htmlCol)

  /** Fixed char-window chunking with overlap — q172. */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame =
    operators.Extraction.chunkText(docs, idCol, textCol, window, overlap)

  /** Unicode NFC canonical form (codegen'd; the pre-hash normalization
    * for byte-keyed dedup) — q173, SQL name `nfc_normalize`. */
  def nfcNormalize(text: Column): Column = functions.NfcNormalize(text)

  // ---- streaming ------------------------------------------------------------
  /** Ingestion-side dedup of a document stream against a static corpus. */
  def incrementalDedupStream(docs: DataFrame, corpusHashes: DataFrame): DataFrame =
    streaming.Streams.incrementalDedupStream(docs, corpusHashes)
}
