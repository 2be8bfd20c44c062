package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Character-n-gram language identification as a STORED-MODEL scorer —
  * the last widely-used quality-gate filter the engine lacked (VERDICT
  * r12 next #8). The shape is the classic n-gram LID (Cavnar & Trenkle
  * 1994; the CLD/fastText-langid lineage all reduce to it): per
  * language, a table of character-trigram frequencies learned from a
  * labeled corpus; a new document scores against every language's
  * table and takes the argmax.
  *
  * Engine-exact discipline (the q161/q157 conventions): trigram
  * features hash to `buckets` md5 buckets; the stored weight is the
  * add-1-smoothed frequency as a SCALED INTEGER,
  * `w = ((c+1)·scale) div (total+buckets)`, so a document's per-language
  * score `Σ cnt·w` is an exact LONG — no float accumulation, no
  * transcendentals, bit-identical under any partitioning, and the
  * DuckDB oracle replays it verbatim. (A true naive Bayes sums LOG
  * probabilities; `ln` is libm-dependent and not bit-replayable across
  * engines, so declared semantics use the frequency-sum form — a
  * monotone-per-gram surrogate that ranks languages by how much of the
  * document's trigram mass each language's model covers.)
  *
  * Scale: the model is DENSE — `langs × buckets` rows (5×4096 here;
  * a production 200-language model at 2^16 buckets is ~13M 24-byte
  * rows, still one broadcast) — so scoring is explode(trigrams) →
  * (doc,bkt) hash-agg → broadcast join → (doc,lang) hash-agg →
  * per-doc argmax window. The wordcount shuffle class; the argmax
  * window partitions by doc_id (millions of tiny groups — hash
  * exchange, no skew, never a global sort). Corpora are read once at
  * learn time and never again: [[langIdModel]] is the persist-once
  * artifact, [[langIdScore]] the per-batch probe (the q121/q157b
  * stored-state discipline).
  *
  * Overflow headroom: learn side needs `(c+1)·scale < 2^63` — at
  * scale 10^6 that is c < 9.2·10^12 trigrams per (language, bucket),
  * i.e. ~4·10^16 corpus chars per language before pre-scaling is
  * needed. Score side: `Σ cnt·w ≤ n_trigrams·scale` — a 10^9-char
  * document is still 10^15, five orders inside LONG.
  */
object LangId {

  private def triBuckets(textCol: String, buckets: Int) = {
    // one row per character-trigram position; docs shorter than 3
    // chars contribute nothing (sequence(1, len-2) needs len >= 3).
    // `lower(text)` is materialized as a column BEFORE the explode:
    // referencing lower($textCol) inside the post-explode projection
    // would re-lowercase the WHOLE document once per trigram row —
    // O(len²) chars per doc (measured ~25% of q169's decade wall).
    // The length guard runs on the MATERIALIZED __lo, not the raw text:
    // Unicode lowercasing can change string length (U+0130 lowercases
    // to 'i' + U+0307), and the declared semantics — replayed by the
    // oracle's `len(lo) >= 3` — are "at least one trigram of the
    // lowercased text" (ADVICE r13).
    (df: DataFrame) => {
      val keep = df.columns.filterNot(_ == textCol).map(col)
      df
        .select(keep :+ lower(col(textCol)).as("__lo"): _*)
        .filter(length(col("__lo")) >= 3)
        .select((keep :+ col("__lo")) :+
          explode(sequence(lit(1), length(col("__lo")) - 2)).as("__i"): _*)
        .select(keep :+
          pmod(conv(substring(md5(col("__lo").substr(col("__i"), lit(3))),
            1, 6), 16, 10).cast("long"), lit(buckets.toLong)).as("bkt"): _*)
    }
  }

  /** SPARSE per-shard trigram counts — the ADDITIVE stored artifact a
    * batch model refresh folds instead of re-reading the labeled corpus
    * (the q121/`bm25StatsMerge` stored-shard discipline; VERDICT r13
    * next #5). One row per OBSERVED (lang, bkt) with its raw count `c`
    * and the learn-time `buckets` hash-space pin; shards from different
    * hash spaces refuse to fold in [[langIdModelFromShards]]. Rows with
    * NULL lang are refused at execution — silently learning a "null"
    * language would swallow unlabeled docs into a phantom class.
    * Parquet round-trip safe (LONG counts, no floats). */
  def langIdCountShard(docs: DataFrame, textCol: String, langCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets in [2, 2^20], got $buckets")
    // NULL labels refuse at execution (raise_error keeps the builder
    // lazy) — a filter would silently fold unlabeled docs away, a
    // String.valueOf-style key would learn a phantom "null" language
    val labeled = docs.select(
      when(col(langCol).isNull,
        raise_error(lit("langIdCountShard: NULL lang label — label or " +
          "drop unlabeled docs explicitly before learning")).cast("string"))
        .otherwise(col(langCol)).as("lang"),
      col(textCol))
    triBuckets(textCol, buckets)(labeled)
      .groupBy(col("lang"), col("bkt")).agg(count(lit(1)).as("c"))
      .withColumn("buckets", lit(buckets))
  }

  /** Fold stored [[langIdCountShard]]s into the DENSE scoring model:
    * counts are additive per (lang, bkt), so `model(fold(shards)) ≡
    * model(learn-once over the union corpus)` exactly — integer sums in
    * any order, then one deterministic `div`. Refuses shards whose
    * `buckets` pins disagree (different hash spaces must not fold).
    * Languages whose shards carry zero trigrams are absent (same as
    * learn-once: nothing to smooth against). The totals pass is a
    * second hash-agg over the (langs × buckets)-bounded folded counts,
    * never over the corpus. */
  def langIdModelFromShards(shards: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    // Fold once and PERSIST the folded frame (≤ langs×buckets rows —
    // model-sized, already broadcast downstream): the pin read below,
    // [[langIdScore]]'s own pin read, and the final plan would each
    // otherwise re-evaluate the shard pipeline — for shards built
    // inline from a corpus that is three corpus explodes per action
    // (measured 7.3 s vs 2.3 s on the q169b/q169 pair at sf0.1).
    val folded = shards.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("c")).as("c"),
        min(col("buckets")).as("__bmin"), max(col("buckets")).as("__bmax"))
      .persist()
    try {
      // bounded driver read: one row of global pin extremes
      val pins = folded.agg(min(col("__bmin")), max(col("__bmax"))).collect().head
      require(!pins.isNullAt(0), "langIdModelFromShards: no shards — learn " +
        "at least one langIdCountShard over a >= 3-char labeled corpus")
      require(pins.getInt(0) == pins.getInt(1),
        "langIdModelFromShards: shards from different hash spaces " +
          s"(buckets pins ${pins.getInt(0)}..${pins.getInt(1)}) — " +
          "refold per space")
      val buckets = pins.getInt(0)
      val counts = folded.select(col("lang"), col("bkt"), col("c"))
      val langs = counts.select(col("lang")).distinct()
      val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
      langs.crossJoin(
          langs.sparkSession.range(buckets.toLong).select(col("id").as("bkt")))
        .join(counts, Seq("lang", "bkt"), "left")
        .join(totals, Seq("lang"))
        .select(col("lang"), col("bkt"),
          expr(s"((coalesce(c, 0L) + 1L) * ${scale}L) div (tot + ${buckets}L)")
            .as("w"),
          lit(buckets).as("buckets"), lit(scale).as("scale"))
        // eagerly materialize the (model-sized) result and cut lineage so
        // the folded cache can be RELEASED in the finally below — no
        // cached frame outlives this call (code-review r14; the graph
        // house rule). localCheckpoint blocks free with the model's GC.
        .localCheckpoint()
    } finally folded.unpersist()
  }

  /** Learn the stored LID model from a labeled corpus: one row per
    * (lang, bkt) — DENSE over every language seen and every bucket —
    * with the scaled-integer smoothed frequency `w` plus the
    * learn-time `buckets`/`scale` pins, which [[langIdScore]]
    * require()s match (the dsirScoreStored discipline: a scorer run in
    * a different hash space must refuse loudly, not silently
    * mis-hash). Defined AS the one-shard fold so the incremental path
    * can never drift from the learn-once path. */
  def langIdModel(docs: DataFrame, textCol: String, langCol: String,
      buckets: Int = 4096, scale: Long = 1000000L): DataFrame =
    langIdModelFromShards(
      langIdCountShard(docs, textCol, langCol, buckets), scale)

  /** Score a batch against a persisted [[langIdModel]]: per document,
    * the argmax language (ties break to the lexicographically smallest
    * language — deterministic, oracle-replayed) and its exact LONG
    * score. Documents with < 3 chars produce no trigrams and are
    * absent from the output (nothing to identify — refusing beats
    * emitting an arbitrary language at score 0). */
  def langIdScore(batch: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val r = row_number().over(
      Window.partitionBy(col(idCol))
        .orderBy(col("score").desc, col("lang")))
    perLangScores(batch, idCol, textCol, model)
      .withColumn("__r", r).filter(col("__r") === 1)
      .select(col(idCol), col("lang").as("pred_lang"), col("score"))
  }

  /** Shared (doc, lang, score) frame behind [[langIdScore]] /
    * [[langIdScoreMargin]]: explode trigrams, per-doc bucket counts,
    * broadcast-join the dense model, one hash-agg. Exact LONG scores. */
  private def perLangScores(batch: DataFrame, idCol: String,
      textCol: String, model: DataFrame): DataFrame = {
    val pins = model.select(col("buckets"), col("scale")).limit(1).collect()
    require(pins.nonEmpty, "langIdScore: model table is empty — " +
      "langIdModel over a corpus with no >= 3-char labeled documents " +
      "produces no rows; rebuild the stored artifact")
    val buckets = pins.head.getInt(0)
    val dc = triBuckets(textCol, buckets)(batch.select(col(idCol), col(textCol)))
      .groupBy(col(idCol), col("bkt")).agg(count(lit(1)).as("cnt"))
    // dense model => inner join covers every (doc bucket, lang) pair
    dc.join(broadcast(model.select(col("lang"), col("bkt"), col("w"))),
        Seq("bkt"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("cnt") * col("w")).as("score"))
  }

  /** [[langIdScore]] with CONFIDENCE fields (VERDICT r14 next #4 — the
    * CCNet p>0.5 analog, in the house exact-integer scheme): per doc,
    * the argmax language plus
    *   - `margin` — top-1 score − top-2 score as an exact LONG; NULL
    *     when the model knows a single language (no runner-up exists —
    *     refuse-visibly rather than claim an infinite margin),
    *   - `confident` — true iff the top language holds a strict
    *     majority of the doc's total trigram-coverage mass across ALL
    *     model languages: `2·score₁ > Σ_lang score` — one exact integer
    *     comparison, no division, bit-replayable. (Headroom: score ≤
    *     n_trigrams·scale ≈ 10¹⁵ for a 10⁹-char doc; ×2 and a 200-lang
    *     total stay orders inside LONG.)
    * Docs below the trigram floor (< 3 chars of lowercased text)
    * produce no trigrams and are ABSENT, exactly as in [[langIdScore]]:
    * an evidence-free doc gets no confident-looking row at all.
    * Same plan shape as langIdScore plus one per-doc window sum. */
  def langIdScoreMargin(batch: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val ordered = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("lang"))
    val whole = Window.partitionBy(col(idCol))
    perLangScores(batch, idCol, textCol, model)
      .withColumn("__r", row_number().over(ordered))
      .withColumn("__s2", lead(col("score"), 1).over(ordered))
      .withColumn("__tot", sum(col("score")).over(whole))
      .filter(col("__r") === 1)
      .select(col(idCol), col("lang").as("pred_lang"), col("score"),
        (col("score") - col("__s2")).as("margin"),
        (col("score") * lit(2L) > col("__tot")).as("confident"))
  }

  // ---------------------------------------------------------------- q169
  // Declared query: learn from the even-doc_id half (the q157b split
  // convention), score the odd half, report the prediction against the
  // planted label. The oracle replays learn + score + argmax verbatim;
  // the assembled SQL gets AS MATERIALIZED on every multi-referenced
  // CTE from the central OracleSql rewrite.
  private def scoreOddHalf(docs: DataFrame, model: DataFrame): DataFrame =
    langIdScore(docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", model)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("score"),
        (col("pred_lang") === col("lang")).as("is_correct"))
      .orderBy(col("doc_id"))

  /** DuckDB replay of learn-then-argmax-score as a reusable CTE chunk
    * (for COMPOSED oracles, e.g. the q93c crawl chain): learn a
    * 4096-bucket model from `learnSrc` (must expose `lang`, `text`),
    * score `scoreSrc` (must expose `doc_id` and `scoreText`), and
    * define CTE `out` = `(doc_id, pred_lang, score)`. Same arithmetic
    * as [[langIdModel]]/[[langIdScore]] defaults, verbatim. */
  private[operators] def langIdSqlCtes(learnSrc: String, scoreSrc: String,
      scoreText: String, out: String): String = s"""
      ${out}_ltri AS MATERIALIZED (SELECT lang,
               ('0x' || substr(md5(substring(lo, i, 3)), 1, 6))::BIGINT % 4096 AS bkt
             FROM (SELECT lang, lo, unnest(range(1, len(lo) - 1)) AS i
                   FROM (SELECT lang, lower(text) AS lo FROM $learnSrc)
                   WHERE len(lo) >= 3)),
      ${out}_cnts AS MATERIALIZED (SELECT lang, bkt, CAST(COUNT(*) AS BIGINT) AS c
             FROM ${out}_ltri GROUP BY lang, bkt),
      ${out}_langs AS MATERIALIZED (SELECT DISTINCT lang FROM $learnSrc),
      ${out}_tot AS MATERIALIZED (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot
             FROM ${out}_cnts GROUP BY lang),
      ${out}_model AS MATERIALIZED (SELECT l.lang, b.range AS bkt,
               CAST(((COALESCE(c.c, 0) + 1) * 1000000) // (t.tot + 4096) AS BIGINT) AS w
             FROM ${out}_langs l CROSS JOIN range(4096) b
             LEFT JOIN ${out}_cnts c ON c.lang = l.lang AND c.bkt = b.range
             JOIN ${out}_tot t ON t.lang = l.lang),
      ${out}_dc AS MATERIALIZED (SELECT doc_id, bkt, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM (SELECT doc_id,
                          ('0x' || substr(md5(substring(lo, i, 3)), 1, 6))::BIGINT % 4096 AS bkt
                   FROM (SELECT doc_id, lo, unnest(range(1, len(lo) - 1)) AS i
                         FROM (SELECT doc_id, lower($scoreText) AS lo FROM $scoreSrc)
                         WHERE len(lo) >= 3))
             GROUP BY doc_id, bkt),
      ${out}_sc AS MATERIALIZED (SELECT dc.doc_id, m.lang,
               CAST(SUM(dc.cnt * m.w) AS BIGINT) AS score
             FROM ${out}_dc dc JOIN ${out}_model m ON dc.bkt = m.bkt
             GROUP BY dc.doc_id, m.lang),
      $out AS MATERIALIZED (SELECT doc_id, pred_lang, score
             FROM (SELECT doc_id, lang AS pred_lang, score,
                          ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, lang) AS r
                   FROM ${out}_sc)
             WHERE r = 1)"""

  /** ONE learn+score cascade for the q169/q169b/q169c oracles,
    * expressed through the SAME generator the composed oracles (q93c)
    * use — a smoothing or bucket change can no longer drift between
    * the standalone and composed replays (code-review r15). Exposes
    * `lid` (argmax rows) and `lid_sc` (per-(doc, lang) exact scores). */
  private lazy val lidCtes = langIdSqlCtes(
    "(SELECT lang, text FROM documents WHERE doc_id % 2 = 0)",
    "(SELECT doc_id, text FROM documents WHERE doc_id % 2 <> 0)",
    "text", "lid")

  private lazy val langIdOracle = s"""
      WITH $lidCtes
      SELECT b.doc_id, b.pred_lang, b.score,
             b.pred_lang = d.lang AS is_correct
      FROM lid b JOIN documents d ON b.doc_id = d.doc_id
      ORDER BY b.doc_id"""

  // margin/confidence tail: identical score frame, plus LEAD for the
  // runner-up gap and a per-doc total for the exact majority test.
  // DuckDB's window SUM(BIGINT) is HUGEINT, so the majority comparison
  // lifts score to HUGEINT explicitly; margin stays BIGINT − BIGINT.
  private lazy val langIdMarginOracle = s"""
      WITH $lidCtes,
      best AS (SELECT doc_id, lang AS pred_lang, score,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) AS r,
                      LEAD(score) OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, lang) AS s2,
                      SUM(score) OVER (PARTITION BY doc_id) AS tot
               FROM lid_sc)
      SELECT doc_id, pred_lang, score,
             CAST(score - s2 AS BIGINT) AS margin,
             (2 * CAST(score AS HUGEINT) > tot) AS confident
      FROM best
      WHERE r = 1
      ORDER BY doc_id"""

  private val q169 = GraftQuery(
    "q169_langid_ngram",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      scoreOddHalf(docs,
        langIdModel(docs.filter(col("doc_id") % 2 === 0), "text", "lang"))
    },
    Some(langIdOracle))

  // ---------------------------------------------------------------- q169b
  // Stored-shard fold law, oracle-pinned: the model folded from TWO
  // disjoint count shards of the even half (doc_id % 4 == 0 / == 2)
  // must score bit-identically to the learn-once model — so q169b
  // shares q169's oracle verbatim. The spec additionally pins the
  // parquet round-trip (shards written + re-read fold identically).
  private val q169b = GraftQuery(
    "q169b_langid_shard_fold",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val shardA = langIdCountShard(
        docs.filter(col("doc_id") % 4 === 0), "text", "lang")
      val shardB = langIdCountShard(
        docs.filter(col("doc_id") % 4 === 2), "text", "lang")
      scoreOddHalf(docs,
        langIdModelFromShards(shardA.unionByName(shardB)))
    },
    Some(langIdOracle))

  // ---------------------------------------------------------------- q169c
  // Confidence-margin scoring (VERDICT r14 next #4): same even-half
  // model, odd-half batch as q169, emitting the top-1/top-2 score gap
  // and the exact-majority `confident` flag. Hash-compares the margin
  // LONGs and the flag; the 5-language planted corpus guarantees a
  // runner-up exists, so NULL margins appear only via the single-language
  // law pinned in LangIdSpec.
  private val q169c = GraftQuery(
    "q169c_langid_margin",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      langIdScoreMargin(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text",
        langIdModel(docs.filter(col("doc_id") % 2 === 0), "text", "lang"))
        .orderBy(col("doc_id"))
    },
    Some(langIdMarginOracle))

  val all: Seq[GraftQuery] = Seq(q169, q169b, q169c)
}
