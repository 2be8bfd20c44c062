package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.GraftQuery
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Training-data preparation operators beyond dedup/similarity (SURVEY
  * §2.14 extension set): deterministic sampling, per-source quotas,
  * sequence packing, n-gram frequencies, embedding quantization, and PII
  * redaction — the curation steps a 100 TB pretraining pipeline runs
  * between raw crawl and tokenizer.
  *
  * Scale design: sampling/quantization/redaction are stateless scans
  * (no shuffle, WholeStageCodegen end to end); quotas and packing shuffle
  * once on their natural key (source / lang); bigram counting is
  * explode → hash-agg with map-side partials. Sampling decisions are
  * md5-derived (hash60), so they are engine-reproducible, rerun-stable,
  * and consistent across incremental runs — no RNG state to checkpoint,
  * unlike `df.sample`.
  */
object DataPrep {

  /** The q61 sampling predicate as a reusable column expression: being a
    * stateless row-local function, it applies unchanged to a streaming
    * relation (asserted in StreamingSpec) — deterministic sampling needs
    * no RNG state, so batch backfill and the live stream pick the SAME
    * documents.
    */
  def sampleKeep(docId: org.apache.spark.sql.Column, mod: Int = 10): org.apache.spark.sql.Column =
    pmod(hash60Seeded(lit("sample"), docId.cast("string")), lit(mod)) === 0

  private[operators] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val numRe = "\\d{4,}"

  /** q66's redaction as a reusable column expression (stateless — same
    * batch/stream property as [[sampleKeep]]). */
  def redact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(text, emailRe, "[EMAIL]"), numRe, "[NUM]")

  // ---------------------------------------------------------------- q61
  // Deterministic hash sampling: keep doc iff hash60("sample:" || id) ≡ 0
  // (mod 10) — a 10% sample that is identical on every rerun and every
  // engine, and composes with incremental ingestion (a doc's fate never
  // depends on what else is in the batch).
  private val q61 = GraftQuery(
    "q61_hash_sample",
    (s, dir) =>
      Tables.documents(s, dir)
        .filter(sampleKeep(col("doc_id")))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, lang, source
      FROM documents
      WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q62
  // Per-source quota (training-mix curation): keep at most K docs per
  // source, chosen by hash order — a deterministic uniform subsample per
  // stratum, not "first K by id" (which would bias toward old data). One
  // shuffle on source. Unlike q91's unbounded ranking, this window keeps
  // its plain per-group shape ON PURPOSE: the rn <= K filter lets Spark's
  // InferWindowGroupLimit insert a PARTIAL WindowGroupLimit before the
  // exchange — each map task retains ≤ K rows per source, so the shuffled
  // set and the final sort are ≤ K×tasks rows per source at any corpus
  // size (plan-asserted in DataPrepSpec).
  private val q62 = {
    val K = 50
    GraftQuery(
      "q62_source_quota",
      (s, dir) => {
        val h = hash60Seeded(lit("quota"), col("doc_id").cast("string"))
        val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
        Tables.documents(s, dir)
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter(col("rn") <= K)
          .select(col("source"), col("rn"), col("doc_id"))
          .orderBy(col("source"), col("rn"))
      },
      Some(s"""
        SELECT source, rn, doc_id
        FROM (SELECT source, doc_id,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                                doc_id) AS INT) AS rn
              FROM documents) t
        WHERE rn <= $K
        ORDER BY source, rn"""))
  }

  // ---------------------------------------------------------------- q63
  // Sequence packing: assign docs to fixed token-budget packs (context
  // windows) per language — pack_id = exclusive-prefix-sum of token
  // counts DIV budget, in doc_id order. Streaming-chunking semantics
  // (a straddling doc starts in the pack its prefix lands in), chosen
  // over exact first-fit because it is expressible as ONE window cumsum —
  // no sequential driver loop — and packs stay within budget + one doc.
  // Partitioned by lang: each group's window is independent, so the
  // cumsum parallelizes across groups at scale.
  private val q63 = {
    val B = 2048
    GraftQuery(
      "q63_seq_packing",
      (s, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), tokenCount(col("text")).as("n_tokens"))
          .withColumn("cum_excl", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .select(col("lang"), col("doc_id"), col("n_tokens"),
            expr(s"CAST(cum_excl DIV $B AS INT)").as("pack_id"))
          .orderBy(col("lang"), col("doc_id"))
      },
      Some(s"""
        SELECT lang, doc_id, n_tokens, CAST(cum_excl // $B AS INT) AS pack_id
        FROM (SELECT lang, doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
              FROM (SELECT lang, doc_id,
                           CAST(len(list_filter(string_split_regex(lower(text), '\\W+'),
                                                x -> x <> '')) AS INT) AS n_tokens
                    FROM documents) tok) c
        ORDER BY lang, doc_id"""))
  }

  // ---------------------------------------------------------------- q64
  // Corpus bigram frequencies (vocabulary/boilerplate analysis): top-40
  // bigrams by count. Explode → hash-agg (map-side partials collapse the
  // shuffle to distinct bigrams per partition) → TakeOrdered.
  private val q64 = GraftQuery(
    "q64_bigram_freq",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(tokens(col("text")).as("t"))
        .select(explode(graft.functions.WordNGrams(col("t"), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(40)
    },
    Some("""
      WITH toks AS (SELECT list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS t
                    FROM documents),
      b AS (SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS bigram
            FROM toks WHERE len(t) >= 2)
      SELECT bigram, COUNT(*) AS cnt
      FROM b
      GROUP BY bigram
      ORDER BY cnt DESC, bigram
      LIMIT 40"""))

  // ---------------------------------------------------------------- q65
  // Symmetric int8 quantization of embeddings (the storage/serving format
  // for ANN at scale: 4× smaller than float32, 8× than float64): per
  // vector, scale by 127/max|x| and floor. Exactness: max|x| is a
  // sequential greatest-fold (order-identical in both engines), and
  // x*127/mx is two IEEE ops in the same order — bit-identical inputs to
  // floor. Zero vectors are excluded (scale undefined). Emitted exploded
  // (vec_id, dim, qval) — scalar rows, no cross-engine array formatting.
  private val q65 = GraftQuery(
    "q65_embed_quantize",
    (s, dir) => {
      val mx = aggregate(col("v"), lit(0.0), (a, x) => greatest(a, abs(x)))
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("mx", mx)
        .filter(col("mx") > 0)
        .select(col("vec_id"), col("mx"), posexplode(col("v")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim"),
          greatest(lit(-127), least(lit(127),
            floor(col("x") * lit(127.0) / col("mx")))).cast("int").as("qval"))
        .orderBy(col("vec_id"), col("dim"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                          list_transform(embedding::DOUBLE[], x -> abs(x))),
                          (a, x) -> greatest(a, x)) AS mx
                 FROM embeddings)
      SELECT vec_id, CAST(i - 1 AS INT) AS dim,
             CAST(greatest(-127, least(127, floor(x * 127.0 / mx))) AS INT) AS qval
      FROM (SELECT vec_id, mx, generate_subscripts(v, 1) AS i, unnest(v) AS x
            FROM e WHERE mx > 0) t
      ORDER BY vec_id, dim"""))

  // ---------------------------------------------------------------- q66
  // PII redaction: mask email addresses and long digit runs, reporting
  // match counts and an md5 of the redacted text (proves byte-identical
  // redaction across engines without emitting the full text). Patterns
  // use only constructs with identical semantics in Java regex (Spark)
  // and RE2 (DuckDB) — no lookaround, no backrefs. Stateless scan.
  private val q66 = GraftQuery(
    "q66_pii_redact",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_count(col("text"), lit(emailRe)).cast("int").as("n_emails"),
          regexp_count(col("text"), lit(numRe)).cast("int").as("n_nums"),
          md5(redact(col("text"))).as("redacted_md5"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '$emailRe')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text, '$numRe')) AS INT) AS n_nums,
             md5(regexp_replace(regexp_replace(text, '$emailRe', '[EMAIL]', 'g'),
                                '$numRe', '[NUM]', 'g')) AS redacted_md5
      FROM documents
      ORDER BY doc_id"""))

  /** (id, gramHash) rows: 64-bit hashes of the word `n`-grams of
    * `textCol` (8-byte shuffle/join keys, never gram strings).
    */
  private[operators] def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("t"))
      .select(col("__id"),
        explode(graft.functions.WordNGrams(col("t"), n)).as("g"))
      .select(col("__id"), xxhash64(col("g")).as("gh"))

  /** Benchmark decontamination, the general two-corpus form: rows of
    * `train` that share NO word `n`-gram of `textCol` with any row of
    * `eval` (the standard overlap filter run before pretraining; real
    * pipelines use n = 8–13).
    *
    * Shape at 100 TB: grams are 64-bit hashes; the eval gram set is tiny
    * relative to the corpus, so the semi-join (find contaminated ids)
    * pins a broadcast of it. The anti-join side is different: the
    * contaminated-id set is bounded by the TRAINING corpus, not the eval
    * set — a high-contamination corpus could be millions of ids — so
    * that join is left to AQE, which broadcasts when the measured size
    * allows and falls back to a shuffle of the 8-byte id column (never
    * the corpus text) when it doesn't (ADVICE r5). xxhash64 collisions
    * could only FALSE-POSITIVE a drop (~1e-9 at 1e5 grams), never leak
    * contamination through.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val evalGrams = gramHashes(eval_, idCol, textCol, n)
      .select(col("gh")).distinct()
    val contaminated = gramHashes(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gh"), "left_semi")
      .select(col("__id").as(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------- q79
  // Decontamination as a declared query: eval membership is
  // doc_id % 97 = 0; gram size 4 (this corpus's vocabulary needs 4 to
  // produce a non-trivial split).
  private val q79 = GraftQuery(
    "q79_decontaminate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 4)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                    FROM documents),
      grams AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))) AS g
                FROM toks WHERE len(t) >= 4),
      eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      contaminated AS (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams))
      SELECT d.doc_id, d.source, d.lang, d.n_chars
      FROM documents d
      WHERE d.doc_id % 97 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      ORDER BY d.doc_id"""))

  /** Bloom-filter decontamination — the constant-size form of
    * [[decontaminate]] for eval suites too large to ship as an exact gram
    * set: the eval grams fold into an m-bit bloom filter (Spark's native
    * `BloomFilterAggregate`, one binary blob of numBits/8 bytes
    * regardless of eval size), and a train doc drops when ANY of its
    * gram hashes might be in the filter.
    *
    * Error direction is ONE-SIDED and safe: a bloom filter has no false
    * negatives, so every truly contaminated doc is dropped — the
    * guarantee that matters for benchmark integrity. False positives
    * over-drop clean docs at a rate set by numBits/expectedItems (size
    * for ≲1% and the over-drop is noise at corpus scale; the q89 oracle
    * hash-pins the no-miss law, BloomDecontaminationSpec pins the FP
    * bound).
    *
    * NOTE: building the filter runs ONE Spark job eagerly inside this
    * call (the aggregated blob must be embedded as a plan literal —
    * Spark's `BloomFilterMightContain` accepts only constants/scalar
    * subqueries, and `DataFrameStatFunctions.bloomFilter` does the same
    * collect). Driver state is the blob itself: numBits/8 bytes,
    * independent of both corpora — the same bounded-sketch reasoning as
    * the q67 HLL registers.
    */
  def decontaminateBloom(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, expectedItems: Long, numBits: Long): DataFrame =
    train.join(bloomContaminatedIds(train, eval_, idCol, textCol, n,
      expectedItems, numBits), Seq(idCol), "left_anti")

  /** Two-phase decontamination — the 100 TB production form: the
    * constant-size bloom literal prefilters the corpus to SUSPECTS
    * (stateless scan, no shuffle), and the exact gram join confirms only
    * those. Because the bloom has no false negatives, the kept set is
    * EXACTLY [[decontaminate]]'s (bloom false positives are weeded by
    * the confirm), while the expensive corpus-wide gram join shrinks to
    * the suspect set — true contaminated docs plus FPs at the sized
    * rate, ≪ corpus. Equivalence is spec-asserted (DataPrepSpec) and
    * oracle-pinned through the q93 chain.
    */
  def decontaminateTwoPhase(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, expectedItems: Long, numBits: Long): DataFrame = {
    val suspects = bloomContaminatedIds(train, eval_, idCol, textCol, n,
      expectedItems, numBits)
    val evalGrams = gramHashes(eval_, idCol, textCol, n)
      .select(col("gh")).distinct()
    val confirmed = gramHashes(
        train.join(suspects, Seq(idCol), "left_semi"), idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gh"), "left_semi")
      .select(col("__id").as(idCol)).distinct()
    train.join(confirmed, Seq(idCol), "left_anti")
  }

  /** Fold the eval set's n-gram hashes into one bloom blob (the constant
    * plan literal both decontamination forms probe). None iff the eval
    * set has no n-grams — which cannot contaminate anything.
    */
  def evalGramBloom(eval_ : DataFrame, idCol: String, textCol: String,
      n: Int, expectedItems: Long, numBits: Long): Option[Array[Byte]] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
    Option(gramHashes(eval_, idCol, textCol, n)
      .agg(columnOf(new BloomFilterAggregate(
        expressionOf(col("gh")), Literal(expectedItems), Literal(numBits))
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf"))
  }

  /** Per-ROW bloom admission predicate: TRUE iff no word n-gram of
    * `textCol` might be in the eval bloom `bf`. A pure column expression
    * over one row — no explode, no distinct, no state — so it is legal
    * and IDENTICAL in batch and Structured Streaming plans: the curation
    * chain's streaming admission gate is `stream.filter(bloomAdmit(...))`
    * against the blob built in batch by [[evalGramBloom]]
    * (batch/stream parity asserted in StreamingSpec). Drop-direction
    * parity with [[decontaminateBloom]] is exact: both probe the same
    * xxhash64 gram hashes against the same blob.
    */
  def bloomAdmit(textCol: Column, bf: Array[Byte], n: Int): Column = {
    require(bf != null, "bf must be a bloom blob from evalGramBloom")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
    val bfLit = Literal(bf, org.apache.spark.sql.types.BinaryType)
    !exists(graft.functions.WordNGrams(tokens(textCol), n),
      g => columnOf(BloomFilterMightContain(bfLit, expressionOf(xxhash64(g)))))
  }

  /** The ids [[decontaminateBloom]] would drop (exposed for the q89
    * no-miss audit query).
    */
  def bloomContaminatedIds(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, expectedItems: Long, numBits: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
    evalGramBloom(eval_, idCol, textCol, n, expectedItems, numBits) match {
      case None =>
        // an eval set with no n-grams cannot contaminate anything — match
        // the exact operator's no-op semantics instead of erroring
        train.select(col(idCol)).limit(0)
      case Some(bf) =>
        gramHashes(train, idCol, textCol, n)
          .filter(columnOf(BloomFilterMightContain(
            Literal(bf, org.apache.spark.sql.types.BinaryType),
            expressionOf(col("gh")))))
          .select(col("__id").as(idCol)).distinct()
    }
  }

  // ---------------------------------------------------------------- q89
  // Bloom decontamination audit query. The kept/dropped SET is
  // bloom-dependent (false positives), so the oracle can't replay it —
  // what it CAN hash-pin is the one-sided error law: per train doc,
  // `contaminated_exact` (replayed exactly, q79's semantics) and
  // `missed` = contaminated-but-kept, which the bloom guarantees FALSE
  // for every row. Any false negative — the failure mode that would leak
  // benchmark data into training — flips a boolean and fails the hash.
  // The false-positive RATE (over-dropping) is pinned in
  // DataPrepSpec instead; it is deterministic but not SQL-replayable.
  private val q89 = GraftQuery(
    "q89_decontaminate_bloom",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val evalSet = docs.filter(col("doc_id") % 97 === 0)
      val bloomDropped = bloomContaminatedIds(train, evalSet, "doc_id", "text",
          n = 4, expectedItems = 100000L, numBits = 1600000L)
        .withColumn("bdrop", lit(true))
      // exact contamination, same shape as decontaminate's semi-join
      val evalGrams = gramHashes(evalSet, "doc_id", "text", 4)
        .select(col("gh")).distinct()
      val exact = gramHashes(train, "doc_id", "text", 4)
        .join(broadcast(evalGrams), Seq("gh"), "left_semi")
        .select(col("__id").as("doc_id")).distinct()
        .withColumn("cexact", lit(true))
      train.select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(bloomDropped, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cexact"), lit(false)).as("contaminated_exact"),
          (coalesce(col("cexact"), lit(false)) &&
            !coalesce(col("bdrop"), lit(false))).as("missed"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                    FROM documents),
      grams AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))) AS g
                FROM toks WHERE len(t) >= 4),
      eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      contaminated AS (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams))
      SELECT doc_id,
             doc_id IN (SELECT doc_id FROM contaminated) AS contaminated_exact,
             FALSE AS missed
      FROM documents
      WHERE doc_id % 97 <> 0
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q98
  // The two-phase composition as its OWN declared row (VERDICT r7 #5):
  // until now its only oracle coverage was inside q93's chain. The bloom
  // pass has no false negatives and the exact pass confirms every
  // suspect, so [[decontaminateTwoPhase]] is spec-equal to
  // [[decontaminate]] — the oracle IS q79's exact semantics, pinned here
  // independently of any chain refactor.
  private val q98 = GraftQuery(
    "q98_decontaminate_two_phase",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      decontaminateTwoPhase(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 4, expectedItems = 100000L, numBits = 1600000L)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                    FROM documents),
      grams AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))) AS g
                FROM toks WHERE len(t) >= 4),
      eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      contaminated AS (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams))
      SELECT d.doc_id, d.source, d.lang, d.n_chars
      FROM documents d
      WHERE d.doc_id % 97 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      ORDER BY d.doc_id"""))

  // ---------------------------------------------------------------- q80
  /** Per-group token totals and sqrt-temperature sampling weights over
    * `textCol`, grouped by `groupCol` — the multilingual/multi-source
    * rebalancing mix. One partial-aggregating groupBy; the normalizer is
    * a broadcast scalar summed as DECIMAL(38,6) (exact and
    * order-independent where a double sum varies in ULPs with partial-agg
    * ordering). Output: (groupCol, n_tokens, weight).
    */
  def mixWeights(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ps = df
      .select(col(groupCol), size(tokens(col(textCol))).as("ntok"))
      .groupBy(col(groupCol)).agg(sum(col("ntok")).as("n_tokens"))
      .select(col(groupCol), col("n_tokens"),
        sqrt(col("n_tokens")).cast("decimal(38,6)").as("sq"))
    val tot = ps.agg(sum(col("sq")).as("tot"))
    ps.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_tokens"),
        (col("sq").cast("double") / col("tot").cast("double")).as("weight"))
  }

  private val q80 = GraftQuery(
    "q80_source_mix_weights",
    (s, dir) => mixWeights(Tables.documents(s, dir), "source", "text")
      .orderBy(col("source")),
    Some("""
      WITH toks AS (SELECT source, len(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS ntok
                    FROM documents),
      ps AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM toks GROUP BY source),
      sq AS (SELECT source, n_tokens, CAST(sqrt(n_tokens) AS DECIMAL(38,6)) AS sq FROM ps)
      SELECT source, n_tokens,
             CAST(sq AS DOUBLE) / CAST((SELECT SUM(sq) FROM sq) AS DOUBLE) AS weight
      FROM sq ORDER BY source"""))

  /** Materialize [[mixWeights]] into an actual epoch sample: per-document
    * repetition counts such that each group contributes
    * floor(weight × targetDocs) rows to the epoch — the step that turns
    * sampling WEIGHTS into the training mix a data loader reads.
    *
    * Deterministic and rerun-stable, no RNG: within each group every doc
    * gets the same base count (quota / n_docs); the remainder goes to the
    * quota-mod-n docs that rank first by md5(doc_id) — the same
    * hash-ordering trick as q61's sampling, so re-running over a
    * repartitioned corpus reproduces the epoch bit-for-bit. Groups with
    * quota < n_docs downsample (some docs get 0 copies); groups with
    * quota > n_docs upsample (all docs ≥ base copies) — both directions
    * handled by the same arithmetic.
    *
    * Output: (idCol, groupCol, n_copies). Sum(n_copies) per group ==
    * floor(weight × targetDocs) exactly. Shape at 100 TB: the quota
    * table is one row per group (broadcast); the remainder ranking is the
    * two-level [[md5BucketRank]] — parallel within (group, md5-prefix
    * bucket), offsets broadcast — NOT a per-group window, which would
    * sort a billion-document source in one task. The corpus text is read
    * only by the token-count aggregation inside mixWeights.
    */
  /** Distributed deterministic rank: row_number over
    * `PARTITION BY groupCol ORDER BY md5(idCol), idCol`, computed WITHOUT
    * a per-group single-task sort. A plain Spark window partitioned by
    * group shuffles every row of a group into ONE task — at the target
    * regime (a 100 TB corpus with a handful of sources) that is a
    * 50–500 GB single-task sort. Instead: two-level ranking.
    *
    *  1. Bucket each row by the first `hexChars` hex digits of the SAME
    *     md5 that orders the rank. Because the bucket is a prefix of the
    *     primary sort key, ordering by (bucket, md5, id) IS ordering by
    *     (md5, id) — every row of bucket b sorts before every row of
    *     bucket b+1.
    *  2. Rank within (group, bucket) in parallel — 16^hexChars
    *     independent sorts per group, each ~1/4096th of the group at the
    *     default 3 hex digits.
    *  3. Count rows per (group, bucket) — a groups×buckets-sized table
    *     built by a partial-aggregated hash-agg on the scan (≤ a few MB
    *     even at thousands of groups) — exclusive-prefix-sum it per group
    *     (a window over the TINY counts table, not the data), and
    *     broadcast-join the offsets back: rank = offset + local rank.
    *
    * Output = input plus `rankAs` (1-based LongType). Identical values to
    * the naive window for every row, so oracles pinned to the (md5, id)
    * order are unchanged. `idCol` must be non-null: a null id hashes to a
    * null bucket and would be DROPPED by the offsets equi-join (the naive
    * window would instead rank it first) — every current caller ranks
    * primary-key ids, which are non-null by construction. A null GROUP
    * key, by contrast, is a real case (crawl docs with no domain): the
    * offsets join is null-SAFE on the group column, so null-group rows
    * rank among themselves exactly like the naive window's null
    * partition (code-review r11 — the plain equi-join silently deleted
    * them).
    */
  /** md5-hex-prefix bucket id as a LONG column, shared by [[md5BucketRank]]
    * and Curation's hot-bucket sub-chaining. Long, not int: 8 hex digits
    * reach 0xFFFFFFFF, which overflows Int and (non-ANSI) casts to NULL —
    * downstream that is silent row loss (an equi-join drops null keys) or
    * a collapsed single window partition (ADVICE r7). 15 hex digits is the
    * last width that cannot overflow a signed long.
    */
  private[graft] def hexPrefixBucket(hexCol: Column, hexChars: Int): Column = {
    require(hexChars >= 1 && hexChars <= 15, s"hexChars in [1,15], got $hexChars")
    conv(substring(hexCol, 1, hexChars), 16, 10).cast("long")
  }

  def md5BucketRank(df: DataFrame, groupCol: String, idCol: String,
      rankAs: String, hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars in [1,8], got $hexChars")
    val withKey = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__b", hexPrefixBucket(col("__h"), hexChars))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    val counts = withKey.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select(col(groupCol), col("__b"), col("__off"))
    val off = offsets
      .withColumnRenamed(groupCol, "__g2")
      .withColumnRenamed("__b", "__b2")
    withKey
      .withColumn("__lr", row_number().over(localW).cast("long"))
      .join(broadcast(off),
        col(groupCol) <=> col("__g2") && col("__b") === col("__b2"))
      .withColumn(rankAs, col("__off") + col("__lr"))
      .drop("__h", "__b", "__lr", "__off", "__g2", "__b2")
  }

  /** Distributed deterministic running sum: SUM(weightCol) over
    * `PARTITION BY groupCol ORDER BY md5(idCol), idCol ROWS UNBOUNDED
    * PRECEDING`, computed with the same two-level trick as
    * [[md5BucketRank]] (local cumsum within (group, md5-prefix bucket) +
    * broadcast exclusive-prefix-summed bucket totals) — a plain
    * partitioned window would pull every row of a group through ONE task.
    * `weightCol` is summed as LONG (exact at any corpus size; a double
    * running sum would drift with partial ordering); `idCol` must be
    * non-null (same precondition and reason as md5BucketRank).
    */
  def md5BucketCumsum(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, cumAs: String, hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars in [1,8], got $hexChars")
    // exact-LONG summation is the whole point (order-independent, oracle-
    // replayable); a fractional weight column would be silently truncated
    // per row by the cast, so refuse it loudly (ADVICE r9)
    df.schema.find(_.name == weightCol).foreach { f =>
      require(f.dataType match {
        case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
             _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
        case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
        case _ => false
      }, s"weightCol '$weightCol' must be integral (got ${f.dataType.simpleString}): " +
        "fractional weights would be truncated per row before summation — " +
        "pre-scale to integer units (e.g. micro-weights) instead")
    }
    val withKey = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__b", hexPrefixBucket(col("__h"), hexChars))
      .withColumn("__w", col(weightCol).cast("long"))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = withKey.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__w")).as("__c"))
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select(col(groupCol), col("__b"), col("__off"))
    // null-safe on the group key, like md5BucketRank (code-review r11)
    val off = offsets
      .withColumnRenamed(groupCol, "__g2")
      .withColumnRenamed("__b", "__b2")
    withKey
      .withColumn("__lc", sum(col("__w")).over(localW))
      .join(broadcast(off),
        col(groupCol) <=> col("__g2") && col("__b") === col("__b2"))
      .withColumn(cumAs, col("__off") + col("__lc"))
      .drop("__h", "__b", "__w", "__lc", "__off", "__g2", "__b2")
  }

  /** Weighted systematic sampling (probability-proportional-to-size): lay
    * every row of a group along a line in deterministic (md5(id), id)
    * order, each row occupying `weightCol` units, and keep the rows whose
    * span crosses a multiple of `step` — classic systematic PPS sampling
    * with the hash order standing in for the random permutation. Each row
    * is kept with probability ≈ weight/step (exactly 1 for weight ≥
    * step), the sample size is tightly concentrated at
    * total_weight/step, and — like every sampler in this file — the
    * decision is rerun-stable and engine-reproducible: no RNG state,
    * identical output on any partitioning.
    *
    * All arithmetic is integer (LONG cumsum, integer DIV), so an oracle
    * replaying the same formula matches bit-for-bit — no transcendental
    * key (the exponential-variate weighted-sampling trick needs pow/log,
    * whose last-ulp differs across engines). Weights must be ≥ 0;
    * zero-weight rows are never selected (their span is empty).
    *
    * Scale: one [[md5BucketCumsum]] (parallel within md5-prefix buckets,
    * broadcast offsets) + a stateless row-local predicate — no global
    * sort, no per-group single-task window, nothing driver-sided.
    */
  def weightedSystematicSample(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    md5BucketCumsum(df, groupCol, idCol, weightCol, "__cw")
      .filter(expr(s"__cw DIV $step") >
        expr(s"(__cw - CAST($weightCol AS LONG)) DIV $step"))
      .drop("__cw")
  }

  // --------------------------------------------------------------- q101
  // Declared weighted-sampling query: one document per ~2k chars of each
  // source, proportional to document length. The oracle replays the exact
  // integer arithmetic over the same (md5, id) order — selection is
  // hash-pinned, not just count-checked.
  private val q101 = GraftQuery(
    "q101_weighted_sample",
    (s, dir) => weightedSystematicSample(Tables.documents(s, dir),
        "source", "doc_id", "n_chars", step = 2000L)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")),
    Some("""
      WITH c AS (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cw
        FROM documents)
      SELECT doc_id, source, n_chars FROM c
      WHERE cw // 2000 > (cw - n_chars) // 2000
      ORDER BY doc_id"""))

  /** PPS admission of a NEW batch of rows laid AFTER a frozen per-group
    * consumed-weight line — the incremental/streaming form of
    * [[weightedSystematicSample]] (the q111/q81 stored-artifact
    * discipline applied to sampling). `baseTotals` maps group → weight
    * units already laid down by every previously admitted-from batch
    * (missing groups start at 0); the batch's rows are placed along the
    * line in (md5(id), id) order starting at that base, and a row is
    * kept iff its span crosses a multiple of `step` — so chaining
    * batches b1..bk IS one systematic pass over the concatenated line
    * (law pinned in DataPrepSpec: chained ≡ one-shot over (batch, md5,
    * id) order), with each row still kept w.p. ≈ weight/step and no RNG.
    *
    * `baseTotals` is a driver-side map because groups here are SOURCES
    * (bounded, like [[mixWeights]]'s groups): it enters the plan as a
    * broadcast literal, not a join. Scale: one [[md5BucketCumsum]] per
    * batch + a stateless predicate — nothing global, nothing sorted.
    * Advance the line with [[ppsGroupTotals]] after each batch.
    */
  /** Frozen-base lookup shared by the map-form admit functions
    * ([[ppsAdmitBatch]], [[tokenBudgetAdmitBatch]],
    * [[stratifiedAdmitBatch]]). Base maps use the SAME collision-free
    * [[domainKey]] encoding as [[capAdmitBatch]] ("v:"+value, "n" for
    * null — r12 advice closed the last String.valueOf keying, where a
    * group literally named "null" silently shared a line with the NULL
    * group): build and advance them with [[ppsGroupTotals]], never with
    * raw group names — a raw key misses every lookup, reads base 0, and
    * silently breaks the chained ≡ one-shot law, so it is refused
    * loudly here (the capAdmitBatch guard).
    *
    * MIGRATION (r13 keying change): consumed-state lines persisted by
    * pre-r13 versions (e.g. Streams.PpsAdmission state tables) carry
    * RAW group keys and are invalid under this encoding — this guard
    * throws on the first admit rather than silently reading base 0.
    * Re-key stored lines (`raw → "v:"+raw`, NULL group → `"n"`) or
    * rebuild the line by replaying ppsGroupTotals over the admitted
    * batches; do not suppress the guard. */
  private def frozenBase(baseTotals: Map[String, Long],
      groupCol: String): Column = {
    baseTotals.keys.find(kk => !(kk == "n" || kk.startsWith("v:"))).foreach { bad =>
      throw new IllegalArgumentException(
        s"base-totals key '$bad' is not domainKey-encoded ('v:'+group or " +
          "'n' for null) — build and advance the map with " +
          "ppsGroupTotals(...), never with raw group names (they would " +
          "read as base 0 and break chained admission)")
    }
    if (baseTotals.isEmpty) lit(0L)
    else coalesce(
      element_at(typedLit(baseTotals), domainKey(col(groupCol))), lit(0L))
  }

  def ppsAdmitBatch(batch: DataFrame, baseTotals: Map[String, Long],
      groupCol: String, idCol: String, weightCol: String, step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val base = frozenBase(baseTotals, groupCol)
    md5BucketCumsum(batch, groupCol, idCol, weightCol, "__cw")
      .withColumn("__acw", base + col("__cw"))
      .filter(expr(s"__acw DIV $step") >
        expr(s"(__acw - CAST($weightCol AS LONG)) DIV $step"))
      .drop("__cw", "__acw")
  }

  /** Per-group total weight of a batch — the increment to fold into the
    * [[ppsAdmitBatch]] base line after the batch is admitted. Driver
    * result is O(groups) (bounded, see ppsAdmitBatch). Keys carry the
    * [[domainKey]] encoding ("v:"+group, "n" for null), matching what
    * the admit functions look up — fold these maps together verbatim,
    * never rebuild them from raw group names. */
  def ppsGroupTotals(batch: DataFrame, groupCol: String,
      weightCol: String): Map[String, Long] =
    batch.groupBy(domainKey(col(groupCol)).as("__k"))
      .agg(sum(col(weightCol).cast("long")).as("__t"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  def epochMix(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, targetDocs: Long): DataFrame = {
    require(targetDocs > 0, s"targetDocs must be positive, got $targetDocs")
    val quota = mixWeights(docs, groupCol, textCol)
      .join(docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs")), groupCol)
      .select(col(groupCol),
        floor(col("weight") * lit(targetDocs)).cast("long").as("target"),
        col("n_docs"))
    // Two-level distributed ranking — same (md5, id) total order as a
    // per-group window, but no single-task-per-group sort (the 100 TB
    // scale-killer a plain Window.partitionBy(group) would be here).
    md5BucketRank(docs.select(col(idCol), col(groupCol)), groupCol, idCol, "rk")
      .join(broadcast(quota), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        // integer DIV, not floor(double /): exact at any quota magnitude
        // (a double quotient loses exactness past 2^53)
        (expr("target DIV n_docs") +
          when(col("rk") <= pmod(col("target"), col("n_docs")), 1L).otherwise(0L))
          .cast("long").as("n_copies"))
  }

  // ---------------------------------------------------------------- q91
  // Epoch materialization as a declared query: 1000-doc target epoch over
  // the source-mix weights. The oracle replays the whole chain — q80's
  // decimal-exact weights, the per-source quotas, and the md5 remainder
  // ranking — so both the arithmetic and the deterministic tie-break are
  // hash-pinned.
  private val q91 = GraftQuery(
    "q91_epoch_mix",
    (s, dir) => epochMix(Tables.documents(s, dir), "doc_id", "text",
        "source", targetDocs = 1000L)
      .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (SELECT source, len(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS ntok
                    FROM documents),
      ps AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM toks GROUP BY source),
      sq AS (SELECT source, CAST(sqrt(n_tokens) AS DECIMAL(38,6)) AS sq FROM ps),
      wts AS (SELECT source,
                     CAST(sq AS DOUBLE) / CAST((SELECT SUM(sq) FROM sq) AS DOUBLE) AS weight
              FROM sq),
      quota AS (SELECT w.source,
                       CAST(floor(w.weight * 1000) AS BIGINT) AS target,
                       c.n_docs
                FROM wts w JOIN (SELECT source, COUNT(*) AS n_docs
                                 FROM documents GROUP BY source) c
                  ON w.source = c.source),
      ranked AS (SELECT doc_id, source,
                        ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                 FROM documents)
      SELECT r.doc_id, r.source,
             CAST(target // n_docs + CASE WHEN rk <= target % n_docs THEN 1 ELSE 0 END AS BIGINT) AS n_copies
      FROM ranked r JOIN quota q ON r.source = q.source
      ORDER BY r.doc_id"""))

  /** Overlapping character chunks of `textCol` for context-window
    * preprocessing: chunks of `chunkLen` starting every `step` chars
    * (overlap = chunkLen - step), 1-based offsets, the tail chunk
    * may be shorter. Pure per-row arithmetic — embarrassingly parallel,
    * no shuffle at any corpus size.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, step: Int): DataFrame = {
    require(chunkLen > 0 && step > 0 && step <= chunkLen,
      s"need 0 < step <= chunkLen, got step=$step chunkLen=$chunkLen")
    df.select(col(idCol), col(textCol).as("__text"))
      // Spark's sequence(1, 0, step) THROWS rather than yielding empty;
      // an empty doc has no chunks on either engine, so drop it up front
      .filter(length(col("__text")) >= 1)
      .select(col(idCol),
        explode(sequence(lit(1), length(col("__text")), lit(step))).as("start"),
        col("__text"))
      .select(col(idCol),
        ((col("start") - 1) / step).cast("int").as("chunk_id"),
        col("start").cast("long").as("start"),
        length(expr(s"substring(__text, start, $chunkLen)")).cast("long").as("chunk_len"),
        md5(expr(s"substring(__text, start, $chunkLen)")).as("chunk_md5"))
  }

  // ---------------------------------------------------------------- q84
  // Chunking as a declared query: 200-char chunks every 150 chars (50
  // overlap). The md5 per chunk proves byte-identical chunk content
  // across engines without emitting the text.
  private val q84 = GraftQuery(
    "q84_doc_chunking",
    (s, dir) => chunkDocs(Tables.documents(s, dir), "doc_id", "text",
      chunkLen = 200, step = 150)
      .orderBy(col("doc_id"), col("chunk_id")),
    Some("""
      SELECT doc_id,
             CAST((s - 1) // 150 AS INT) AS chunk_id,
             CAST(s AS BIGINT) AS start,
             CAST(len(substr(text, s, 200)) AS BIGINT) AS chunk_len,
             md5(substr(text, s, 200)) AS chunk_md5
      FROM documents, UNNEST(range(1, len(text) + 1, 150)) AS u(s)
      ORDER BY doc_id, chunk_id"""))

  // ---------------------------------------------------------------- q85
  // The end-to-end prep pipeline a training run actually executes,
  // composed from the verified building blocks: quality gate (q33's
  // keep rule + language filter) → benchmark decontamination (the q79
  // public operator) → exact dedup keep-first (q35's rule) → sequence
  // packing (q63's exclusive-prefix-sum rule, per source). Every stage
  // is individually oracle-checked elsewhere; this query pins their
  // COMPOSITION — the DuckDB oracle replays the whole chain.
  //
  // Shape at 100 TB: filter is a stateless scan; decontamination
  // broadcasts the eval gram set; dedup is one hash-agg on a 16-byte
  // digest + a semi-join; packing is one window cumsum partitioned by
  // source. No stage shuffles the corpus text more than once.
  private val q85 = GraftQuery(
    "q85_prep_pipeline",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = tokens(col("text"))
      val en = Seq("the", "a", "and", "of", "to", "is", "in")
      val stopCnt = size(filter(toks, t => array_contains(array(en.map(lit): _*), t)))
      val kept = docs
        .withColumn("n_tokens", size(toks))
        .withColumn("sr", stopCnt.cast("double") / col("n_tokens"))
        .filter(col("lang") === "en" && col("n_tokens").between(20, 1000) &&
          col("sr") > 0.02)
      val clean = decontaminate(
        kept.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 4)
      val minIds = clean.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val deduped = clean.join(minIds, Seq("doc_id"), "left_semi")
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      deduped
        .withColumn("cum_excl",
          coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"),
          col("n_tokens").cast("int").as("n_tokens"),
          expr("CAST(cum_excl DIV 2048 AS INT)").as("pack_id"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (SELECT doc_id, source, lang, text,
                          list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                   FROM documents),
      kept AS (SELECT doc_id, source, text, len(t) AS n_tokens FROM tok
               WHERE lang = 'en' AND len(t) BETWEEN 20 AND 1000
                 AND CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','is','in'], x))) AS DOUBLE) / len(t) > 0.02),
      grams AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))) AS g
                FROM tok WHERE len(t) >= 4),
      eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      contaminated AS (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams)),
      clean AS (SELECT * FROM kept
                WHERE doc_id % 97 <> 0
                  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      dedup AS (SELECT c.* FROM clean c
                JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keep
                      FROM clean GROUP BY md5(text)) k ON c.doc_id = k.keep)
      SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS INT) AS pack_id
      FROM dedup
      ORDER BY doc_id"""))

  /** Deterministic train/val/test assignment: bucket = the first 4 md5
    * hex digits of the id as an int mod 100, split by cumulative ratio
    * bounds (80/10/10 default). Hash-based, so membership is stable
    * under reprocessing, ingestion order, and partitioning — the
    * property random() splits lack — and any engine reproduces it.
    */
  def splitAssign(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"need 0 < train, 0 < val, train+val < 100; got $trainPct/$valPct")
    val bucket = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 4), 16, 10) AS INT) % 100")
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  // ---------------------------------------------------------------- q86
  private val q86 = GraftQuery(
    "q86_split_assign",
    (s, dir) => splitAssign(Tables.documents(s, dir), "doc_id")
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, source,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, source,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS b
            FROM documents) t
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q115
  // Corpus snapshot diff: between two versions of a corpus, classify
  // every id as added / removed / changed / unchanged by content hash —
  // the version-triage primitive before an incremental rebuild (what
  // must re-embed, re-dedup, re-score after a crawl refresh; the q81/
  // q111 incremental discipline needs exactly this delta as its input).
  //
  // Scale: one full-outer equi-join of two (id, 16-byte-digest) frames —
  // the text never shuffles. Persist both snapshot digest tables
  // bucketed by id (ScaleOps.writeBucketed) and the join is
  // zero-exchange; AQE handles the skewless id key either way.
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def digests(df: DataFrame, h: String) =
      df.select(col(idCol), md5(col(textCol)).as(h))
    digests(oldDf, "h1").join(digests(newDf, "h2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged").as("status"))
  }

  // Declared query: two deterministic snapshot views of the documents
  // table (v1 misses the %11 ids — "added" later; v2 misses the %13 ids
  // — "removed" — and rewrites the %5 texts — "changed"), so the oracle
  // replays both snapshots and the full-outer classification from the
  // same parquet with no generated state.
  private val q115 = GraftQuery(
    "q115_corpus_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val v1 = docs.filter(col("doc_id") % 11 =!= 0)
      val v2 = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      corpusDiff(v1, v2, "doc_id", "text").orderBy(col("doc_id"))
    },
    Some("""
      WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 11 <> 0),
      v2 AS (SELECT doc_id,
                    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h2
             FROM documents WHERE doc_id % 13 <> 0)
      SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN v1.h1 <> v2.h2 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q124
  // Incremental curation PREFIX — the pipeline-level form of the q121
  // append identity: the curation chain's per-document stages (quality
  // gate + two-phase decontamination against a FIXED eval set) commute
  // with batching, so prefix(base) ∪ prefix(batch) == prefix(base ∪
  // batch) EXACTLY. That is the crawl-refresh contract: after q115's
  // diff, only the added/changed docs run the prefix; the corpus-level
  // stages downstream (dedup, mix) re-run over survivors (their own
  // incremental forms are q81/q111/q120's territory). The declared query
  // computes the split-and-union side; the oracle replays the whole
  // train set from scratch — hash equality IS the identity.
  def curationPrefix(docs: DataFrame, evalSet: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val en = Seq("the", "a", "and", "of", "to", "is", "in")
    val stopCnt = size(filter(toks, t => array_contains(array(en.map(lit): _*), t)))
    val gated = docs
      .withColumn("n_tokens", size(toks))
      .withColumn("sr", stopCnt.cast("double") / col("n_tokens"))
      .filter(col("lang") === "en" && col("n_tokens").between(20, 1000) &&
        col("sr") > 0.02)
      .select(col("doc_id"), col("source"), col("text"))
    decontaminateTwoPhase(gated, evalSet, "doc_id", "text",
      n = 4, expectedItems = 100000L, numBits = 1600000L)
  }

  private val q124 = GraftQuery(
    "q124_incremental_prefix",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val base = train.filter(col("doc_id") % 10 < 8)
      val batch = train.filter(col("doc_id") % 10 >= 8)
      curationPrefix(base, evalSet)
        .unionByName(curationPrefix(batch, evalSet))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (SELECT doc_id, source, lang, text,
                          list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                   FROM documents),
      kept AS (SELECT doc_id, source FROM tok
               WHERE lang = 'en' AND len(t) BETWEEN 20 AND 1000
                 AND CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','is','in'], x))) AS DOUBLE) / len(t) > 0.02),
      grams AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))) AS g
                FROM tok WHERE len(t) >= 4),
      eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      contaminated AS (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams))
      SELECT doc_id, source FROM kept
      WHERE doc_id % 97 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
      ORDER BY doc_id"""))

  // --------------------------------------------------------------- q134
  // Filter-cascade drop accounting — curation OBSERVABILITY: a corpus
  // filter stack is only debuggable when every document's drop is
  // attributed to the FIRST stage that rejected it, and the per-stage
  // in/drop/out ledger is exact. One scan computes every stage flag,
  // one hash-agg counts first-fail attributions, and the ledger rows
  // are pure arithmetic over that single aggregate row — no per-stage
  // re-scan (the naive form scans the corpus once per filter).
  //
  // Threshold comparisons are integer cross-multiplications (stop·50 ≥ n
  // for ratio ≥ 0.02, distinct·100 ≥ n·35 for TTR ≥ 0.35) so the oracle
  // replays them with no float boundary risk.

  /** Per-stage ledger (stage, name, n_in, n_drop, n_out) for a cascade
    * of predicates evaluated in order with first-fail attribution.
    * A NULL predicate result counts as PASS (only a definite false
    * drops): each stage flag is coalesced to TRUE inside the operator,
    * so the policy holds in ANY replay — without the coalesce, a NULL
    * f0 with a false f1 is attributed to stage 1 by Spark's CaseWhen
    * (NULL condition skipped) but to NO stage by a SQL
    * `CASE WHEN f0 AND NOT f1` chain (NULL propagates), and the
    * ledgers diverge (ADVICE r10). Wrap inputs in explicit
    * `coalesce(p, false)` if unknown-means-drop is the intended
    * policy. */
  def cascadeAccounting(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty && stages.size <= 16, "1..16 cascade stages")
    val flagged = df.select(stages.zipWithIndex.map {
      case ((_, p), i) => coalesce(p, lit(true)).as(s"__f$i") }: _*)
    val firstFail = stages.indices
      .foldLeft(when(lit(false), lit(-1))) { (w, i) =>
        w.when(!col(s"__f$i"), lit(i)) }
      .otherwise(lit(-1))
    val counts = flagged.agg(
      count(lit(1)).as("__total"),
      stages.indices.map(i =>
        sum(when(firstFail === i, 1L).otherwise(0L)).as(s"__d$i")): _*)
    // running n_in per stage from the one aggregate row
    val ledger = stages.indices.map { i =>
      val nIn = (0 until i).foldLeft(col("__total")) { (c, j) => c - col(s"__d$j") }
      struct(lit(i).as("stage"), lit(stages(i)._1).as("name"),
        nIn.as("n_in"), col(s"__d$i").as("n_drop"),
        (nIn - col(s"__d$i")).as("n_out"))
    }
    counts.select(explode(array(ledger: _*)).as("r"))
      .select(col("r.stage"), col("r.name"), col("r.n_in"),
        col("r.n_drop"), col("r.n_out"))
      .orderBy(col("stage"))
  }

  private val q134 = GraftQuery(
    "q134_filter_cascade",
    (s, dir) => {
      import graft.functions.TextFunctions.tokens
      val d = Tables.documents(s, dir)
        .withColumn("__t", tokens(col("text")))
        .withColumn("__n", size(col("__t")))
        .withColumn("__stop", size(filter(col("__t"),
          t => t.isin("the", "a", "and", "of", "to", "is", "in"))))
        .withColumn("__nd", size(array_distinct(col("__t"))))
      cascadeAccounting(d, Seq(
        "len_gate" -> (col("__n") >= 25 && col("__n") <= 1000),
        "stopword_ratio" -> (col("__stop") * lit(50) >= col("__n")),
        "type_token_ratio" -> (col("__nd") * lit(100) >= col("__n") * lit(35))))
    },
    Some("""
      WITH t AS (SELECT doc_id,
                        list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                 FROM documents),
      f AS (SELECT len(t) AS n,
                   len(list_filter(t, x -> list_contains(['the','a','and','of','to','is','in'], x))) AS stop,
                   len(list_distinct(t)) AS nd
            FROM t),
      flags AS (SELECT (n >= 25 AND n <= 1000) AS f0,
                       (stop * 50 >= n) AS f1,
                       (nd * 100 >= n * 35) AS f2
                FROM f),
      c AS (SELECT COUNT(*) AS total,
                   CAST(SUM(CASE WHEN NOT f0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
                   CAST(SUM(CASE WHEN f0 AND NOT f1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                   CAST(SUM(CASE WHEN f0 AND f1 AND NOT f2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
            FROM flags)
      SELECT 0 AS stage, 'len_gate' AS name, total AS n_in, d0 AS n_drop,
             total - d0 AS n_out FROM c
      UNION ALL
      SELECT 1, 'stopword_ratio', total - d0, d1, total - d0 - d1 FROM c
      UNION ALL
      SELECT 2, 'type_token_ratio', total - d0 - d1, d2, total - d0 - d1 - d2 FROM c
      ORDER BY stage"""))

  // --------------------------------------------------------------- q141
  // Temperature-smoothed multilingual sampling weights (the α-smoothing
  // of Conneau & Lample 2019 / mBERT-style exponent reweighting, at
  // α = 1/2): w_l ∝ n_l^α lifts low-resource languages relative to
  // their raw share. α = 1/2 keeps the arithmetic deterministic across
  // engines — sqrt is IEEE-754 correctly rounded everywhere (unlike
  // pow), and the normalizer sums the FIXED alphabetical language
  // pivot columns left-assoc, so weights and upsample factors
  // hash-match bit-for-bit. One groupBy; the pivot row is O(langs).
  private val q141 = GraftQuery(
    "q141_temperature_mix",
    (s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val counts = Tables.documents(s, dir)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val piv = counts.agg(
        sum(col("n")).as("N"),
        langs.map(l =>
          sum(when(col("lang") === l, col("n")).otherwise(0L)).as(s"n_$l")): _*)
      // fixed-order normalizer: sqrt(n_de) + sqrt(n_en) + ... left-assoc
      val z = langs.map(l => sqrt(col(s"n_$l").cast("double"))).reduceLeft(_ + _)
      val rows = langs.map { l =>
        val n = col(s"n_$l")
        val share = n.cast("double") / col("N")
        val w = sqrt(n.cast("double")) / z
        struct(lit(l).as("lang"), n.as("n_docs"), share.as("share"),
          w.as("weight"), (w / share).as("upsample"))
      }
      piv.select(explode(array(rows: _*)).as("r"))
        .select(col("r.lang"), col("r.n_docs"), col("r.share"),
          col("r.weight"), col("r.upsample"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH c AS (SELECT
                   CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                   CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
                   CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                   CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
                   COUNT(*) AS N
                 FROM documents),
      z AS (SELECT *,
                   ((((sqrt(CAST(n_de AS DOUBLE)) + sqrt(CAST(n_en AS DOUBLE)))
                      + sqrt(CAST(n_es AS DOUBLE))) + sqrt(CAST(n_fr AS DOUBLE)))
                    + sqrt(CAST(n_zh AS DOUBLE))) AS zz
            FROM c)
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / N AS share,
             sqrt(CAST(n_docs AS DOUBLE)) / zz AS weight,
             (sqrt(CAST(n_docs AS DOUBLE)) / zz) / (CAST(n_docs AS DOUBLE) / N) AS upsample
      FROM z, (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')) AS l(lang),
           LATERAL (SELECT CASE lang WHEN 'de' THEN n_de WHEN 'en' THEN n_en
                                     WHEN 'es' THEN n_es WHEN 'fr' THEN n_fr
                                     ELSE n_zh END AS n_docs) d
      ORDER BY lang"""))

  // --------------------------------------------------------------- q143
  // Memorization audit: per GENERATED document, the fraction of its
  // distinct k-grams that appear anywhere in the training corpus — the
  // quantitative form of the decontamination question (q79 gates on
  // "any overlap"; a model-output QA pass needs the RATE, per sample,
  // in basis points). Exact integers end to end: n distinct grams,
  // n found via a semi-join on 64-bit gram hashes, bp = found·10⁴ DIV n.
  //
  // Scale: the corpus gram side is the big one — at 100 TB the exact
  // join runs behind a bloom prefilter exactly like two-phase
  // decontamination (q98): bloom admits suspects cheaply, the exact
  // semi-join confirms only suspects, and the per-doc arithmetic is
  // unchanged. The declared query is the exact form (the confirm leg).
  def memorizationAudit(generated: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    import graft.functions.TextFunctions.tokens
    def grams(df: DataFrame, withId: Boolean) = {
      val g = df
        .select((if (withId) Seq(col(idCol)) else Seq.empty) :+
          tokens(col(textCol)).as("__t"): _*)
        .filter(size(col("__t")) >= k)
        .select((if (withId) Seq(col(idCol)) else Seq.empty) :+
          explode(array_distinct(graft.functions.WordNGrams(col("__t"), k))).as("__g"): _*)
      g.withColumn("__gh", xxhash64(col("__g"))).drop("__g")
    }
    val genG = grams(generated, withId = true)
    val corpusG = grams(corpus, withId = false).select(col("__gh")).distinct()
    val found = genG.join(corpusG, Seq("__gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_found"))
    genG.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
      .join(found, Seq(idCol), "left")
      .withColumn("n_found", coalesce(col("n_found"), lit(0L)))
      .withColumn("mem_bp", expr("n_found * 10000L DIV n_grams"))
  }

  private val q143 = GraftQuery(
    "q143_memorization_audit",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      memorizationAudit(
        docs.filter(col("doc_id") % 10 === 0), // "generated" sample
        docs.filter(col("doc_id") % 10 =!= 0), // training corpus
        "doc_id", "text", k = 4)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS t
                 FROM documents),
      g AS (SELECT doc_id,
                   unnest(list_distinct(list_transform(range(1, len(t) - 2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS g
            FROM t WHERE len(t) >= 4),
      gen AS (SELECT doc_id, g FROM g WHERE doc_id % 10 = 0),
      corp AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 <> 0),
      found AS (SELECT doc_id, COUNT(*) AS n_found
                FROM gen JOIN corp USING (g) GROUP BY doc_id),
      tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM gen GROUP BY doc_id)
      SELECT tot.doc_id AS doc_id, n_grams,
             CAST(COALESCE(n_found, 0) AS BIGINT) AS n_found,
             (COALESCE(n_found, 0) * 10000) // n_grams AS mem_bp
      FROM tot LEFT JOIN found ON tot.doc_id = found.doc_id
      ORDER BY doc_id"""))

  // ----------------------------------------------------- q149 domain cap
  // Per-domain document cap (the crawl-curation balance rule: no single
  // host/domain may contribute more than k documents): keep the k
  // md5-rank-first docs of every domain. Selection is [[md5BucketRank]]
  // — the distributed two-level rank, so one mega-domain (the realistic
  // case: a few hosts are 10% of a crawl) never funnels through one
  // task — and the (md5(id), id) order makes the KEPT SET a
  // deterministic pure function of the data: rerun-stable, engine-
  // reproducible (a QUALIFY ROW_NUMBER replay picks the identical k).
  def domainCap(docs: DataFrame, domainCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"cap must be positive, got $k")
    md5BucketRank(docs, domainCol, idCol, rankAs = "domain_rank")
      .filter(col("domain_rank") <= k.toLong)
  }

  /** Arrival-order streaming form of [[domainCap]] (the q135/q140
    * ingest discipline applied to the balance rule): admit a batch's
    * docs while the domain's quota lasts — within the batch in the
    * SAME (md5(id), id) order the batch form ranks by, offset by the
    * `consumed` counts of everything admitted before. A single batch
    * with an empty map IS [[domainCap]] exactly (StreamingSpec pins
    * it); across batches the admitted set is a deterministic function
    * of the batch sequence, never exceeds k per domain, and reaches
    * exactly k whenever ≥ k arrive. THIS overload carries `consumed` as
    * a driver map that enters the plan as a broadcast literal — correct
    * only for bounded groups (sources, epochs); at open-web domain
    * cardinality use the stored-table overload below, which joins
    * against a persisted state frame instead (VERDICT r11). Advance the
    * map with [[domainCounts]] over each admitted result. */
  /** Collision-free map key for a (nullable) domain value: non-null v
    * encodes as "v:" + v, null as "n" — a real domain literally named
    * "null" can never collide with the null domain (code-review r11:
    * String.valueOf folded them together). The ':' in the prefix is
    * load-bearing (code-review r12): hostnames cannot contain ':'
    * (RFC 1123 labels are alphanumeric + hyphen), so NO raw domain key
    * can ever satisfy the encoded-key guard below — with the old bare
    * "v" prefix, a raw 'vimeo.com' key slipped past the guard and read
    * as 0 consumed, the exact silent cap-overrun the guard exists to
    * refuse. */
  private def domainKey(c: Column): Column =
    coalesce(concat(lit("v:"), c.cast("string")), lit("n"))

  def capAdmitBatch(batch: DataFrame, consumed: Map[String, Long],
      domainCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"cap must be positive, got $k")
    // Lookups use the domainKey encoding; a raw-domain-named map would
    // miss on every key → base 0 → a fresh k admitted per domain per
    // batch, silently exceeding the cap (code-review r11). Refuse loudly.
    consumed.keys.find(kk => !(kk == "n" || kk.startsWith("v:"))).foreach { bad =>
      throw new IllegalArgumentException(
        s"consumed key '$bad' is not domainKey-encoded ('v:'+domain or 'n' " +
          "for null) — build and advance the map with domainCounts(...), " +
          "never with raw domain names (they would read as 0 consumed)")
    }
    val base =
      if (consumed.isEmpty) lit(0L)
      else coalesce(
        element_at(typedLit(consumed), domainKey(col(domainCol))), lit(0L))
    md5BucketRank(batch, domainCol, idCol, rankAs = "__r")
      .filter(base + col("__r") <= k.toLong)
      .drop("__r")
  }

  /** STORED-TABLE form of [[capAdmitBatch]] — the scale-safe one (VERDICT
    * r11 what's-wrong #1): the map overload serializes the whole
    * per-domain consumed map into the plan as a broadcast literal, fine
    * for bounded groups but GBs of task binary per trigger at open-web
    * domain cardinality (10⁷–10⁸ hosts). Here `consumed` is a DataFrame
    * `(domain_key STRING, consumed LONG)` — persist it like the q81
    * stored signatures / q121 stored BM25 stats and LEFT-join on the
    * [[domainKey]] encoding: zero driver state, zero plan literal, and
    * Spark picks broadcast vs shuffle join from the state table's actual
    * size. Produce and advance the state with [[domainCountsDf]] /
    * [[foldDomainCounts]]. Admission semantics are identical to the map
    * form (StreamingSpec pins stored ≡ map ≡ batch [[domainCap]] on a
    * single batch). */
  def capAdmitBatch(batch: DataFrame, consumed: DataFrame,
      domainCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"cap must be positive, got $k")
    require(Seq("domain_key", "consumed").forall(consumed.columns.contains),
      s"consumed state frame needs (domain_key, consumed), got " +
        consumed.columns.mkString("(", ", ", ")"))
    // fold duplicate domain_key rows BEFORE the join: the docstring
    // invites "a parquet shard per trigger", and a multi-shard state
    // frame passed directly would otherwise fan the left join out one
    // row per shard — duplicate admitted rows, each filtered against a
    // PARTIAL consumed count (code-review r12). The hash-agg is
    // per-domain-sized and makes any unioned shard pile a valid input
    // (≡ foldDomainCounts applied first).
    val st = consumed.select(col("domain_key").as("__ck"),
      col("consumed").cast("long").as("__cn"))
      .groupBy(col("__ck")).agg(sum(col("__cn")).as("__cn"))
    md5BucketRank(batch, domainCol, idCol, rankAs = "__r")
      .join(st, domainKey(col(domainCol)) === col("__ck"), "left")
      .filter(coalesce(col("__cn"), lit(0L)) + col("__r") <= k.toLong)
      .drop("__r", "__ck", "__cn")
  }

  /** [[domainCounts]] as a state FRAME `(domain_key, consumed)` — the
    * stored-table increment for the scale-safe [[capAdmitBatch]]
    * overload. Never collected: persist it (or write/read a parquet
    * shard per trigger) and fold with [[foldDomainCounts]]. */
  def domainCountsDf(batch: DataFrame, domainCol: String): DataFrame =
    batch.groupBy(domainKey(col(domainCol)).as("domain_key"))
      .agg(count(lit(1)).as("consumed"))

  /** Advance a stored consumed-state frame by an admitted batch: one
    * union + one hash-agg on `domain_key` — O(domains) distributed, not
    * O(domains) on the driver. */
  def foldDomainCounts(state: DataFrame, admitted: DataFrame,
      domainCol: String): DataFrame =
    state.select(col("domain_key"), col("consumed").cast("long").as("consumed"))
      .unionByName(domainCountsDf(admitted, domainCol))
      .groupBy(col("domain_key"))
      .agg(sum(col("consumed")).as("consumed"))

  /** Per-domain row counts of a (typically admitted) batch, keyed by the
    * collision-free [[domainKey]] encoding [[capAdmitBatch]] looks up —
    * the increment to fold into its consumed map. Driver result is
    * O(domains), bounded. */
  def domainCounts(batch: DataFrame, domainCol: String): Map[String, Long] =
    batch.groupBy(domainKey(col(domainCol)).as("__k"))
      .agg(count(lit(1)).as("__t"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  private val q149 = GraftQuery(
    "q149_domain_cap",
    (s, dir) => domainCap(
      Tables.documents(s, dir).select(col("doc_id"), col("source")),
      "source", "doc_id", k = 10)
      .select(col("doc_id"), col("source"), col("domain_rank"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS domain_rank
      FROM documents
      QUALIFY domain_rank <= 10
      ORDER BY doc_id"""))

  // ------------------------------------------------ q150 sequence packing
  // Length-bucketed sequence packing: assign documents to fixed-budget
  // training bins (budget B tokens per bin) by rounding each document up
  // to its power-of-two length class, slotting class-c docs capacity =
  // B div c per bin, and filling bins in deterministic md5-rank order —
  // the standard length-bucketed batch packing, made engine-exact: bin
  // and slot are pure integer functions of (class, rank), so the full
  // assignment replays bit-for-bit (greedy first-fit packing is
  // inherently sequential — prefix-dependent — and CANNOT scale; the
  // bucketed form is embarrassingly parallel and its padding waste is
  // bounded by 2x the optimal class fit).
  //
  // Scale: one scan computes the class; ranking is [[md5BucketRank]]
  // within (class) groups (two-level, no single-task group); the output
  // is per-doc (class, bin, slot) — a training loader shards by bin.
  // Docs longer than the budget are flagged `oversize` and excluded
  // from packing (callers chunk them first — q84).
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    val t = graft.functions.TextFunctions.tokens(col(textCol))
    packSized(docs.select(col(idCol), size(t).cast("long").as("n_tokens")),
      idCol, budget)
  }

  /** [[packSequences]] over a PRE-SIZED (id, n_tokens) frame — the
    * production entry point: md5BucketRank's two-level shape derives
    * its rank offsets from a second pass over its input, so feeding it
    * raw text tokenizes the corpus twice; at scale the input is the
    * stored per-doc length profile (one tiny 2-column table), which
    * both passes read for pennies. */
  def packSized(sized0: DataFrame, idCol: String, budget: Long): DataFrame = {
    require(budget >= 16L && budget <= (1L << 40),
      s"budget must be in [16, 2^40] tokens, got $budget")
    // smallest power of two >= n, floored at 16 (tiny docs share a
    // class), generated UP TO the budget — a fixed ladder silently
    // oversize-flagged budget-fitting docs past its last rung
    // (code-review r11). For a NON-power-of-two budget the ladder ends
    // with the budget itself (capacity 1), so every doc with
    // n_tokens <= budget packs, as the docstring promises — the
    // power-of-two takeWhile alone stops at the last rung <= budget and
    // silently oversize-flagged docs in (lastRung, budget]
    // (code-review r12).
    val pow2 = Iterator.iterate(16L)(_ * 2).takeWhile(_ <= budget).toSeq
    val classes = if (pow2.last < budget) pow2 :+ budget else pow2
    val sized = sized0
      .withColumn("len_class",
        classes.foldRight(lit(-1L)) { (c, tail) =>
          when(col("n_tokens") <= c, lit(c)).otherwise(tail)
        })
      .withColumn("oversize", col("len_class") === -1L)
    val packed = md5BucketRank(
      sized.filter(!col("oversize")), "len_class", idCol, rankAs = "__r")
      .withColumn("capacity", expr(s"CAST($budget AS BIGINT) div len_class"))
      .withColumn("bin", expr("(__r - 1) div capacity"))
      .withColumn("slot", pmod(col("__r") - 1L, col("capacity")))
      .select(col(idCol), col("n_tokens"), col("len_class"),
        col("oversize"), col("bin"), col("slot"))
    packed.unionByName(
      sized.filter(col("oversize"))
        .select(col(idCol), col("n_tokens"), col("len_class"),
          col("oversize"), lit(-1L).as("bin"), lit(-1L).as("slot")))
  }

  private val q150 = GraftQuery(
    "q150_sequence_packing",
    (s, dir) => packSequences(Tables.documents(s, dir), "doc_id", "text",
      budget = 2048L).orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id,
                        CAST(len(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS BIGINT) AS n_tokens
                 FROM documents),
      sized AS (SELECT doc_id, n_tokens,
                       CAST(CASE WHEN n_tokens <= 16 THEN 16
                                 WHEN n_tokens <= 32 THEN 32
                                 WHEN n_tokens <= 64 THEN 64
                                 WHEN n_tokens <= 128 THEN 128
                                 WHEN n_tokens <= 256 THEN 256
                                 WHEN n_tokens <= 512 THEN 512
                                 WHEN n_tokens <= 1024 THEN 1024
                                 WHEN n_tokens <= 2048 THEN 2048
                                 ELSE -1 END AS BIGINT) AS len_class
                FROM t),
      ranked AS (SELECT doc_id, n_tokens, len_class,
                        CAST(ROW_NUMBER() OVER (PARTITION BY len_class
                               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS r
                 FROM sized WHERE len_class <> -1)
      SELECT doc_id, n_tokens, len_class, FALSE AS oversize,
             (r - 1) // (2048 // len_class) AS bin,
             (r - 1) % (2048 // len_class) AS slot
      FROM ranked
      UNION ALL
      SELECT doc_id, n_tokens, len_class, TRUE AS oversize,
             CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
      FROM sized WHERE len_class = -1
      ORDER BY doc_id"""))

  // ------------------------------------------------ q152 stratified split
  // Stratified eval split with EXACT per-stratum allocation: each
  // stratum (source/language/domain) contributes exactly
  // ⌊n_s · pct/100⌋ documents to eval — the complement of q86's global
  // hash split, whose per-source share is only binomially close to the
  // target. Selection is the md5-rank-first prefix per stratum (the
  // two-level rank, mega-stratum-safe) and the cutoff is an integer
  // cross-multiplication (rank·100 ≤ n·pct), so the assignment is a
  // pure function of the data: rerun-stable, and append-era audits can
  // recompute who WAS eval at any snapshot. One rank pass + one
  // broadcast counts join; no float anywhere.
  def stratifiedSplit(docs: DataFrame, stratumCol: String, idCol: String,
      pctEval: Int): DataFrame = {
    require(pctEval >= 1 && pctEval <= 99, s"pctEval in [1,99], got $pctEval")
    val ranked = md5BucketRank(docs, stratumCol, idCol, rankAs = "__r")
    // counts is a third key-only pass over the input (the rank itself
    // reads it twice) — feed a narrow (id, stratum) projection, or a
    // stored profile, when the source table is wide. NULL strata are a
    // real stratum: the join is null-safe (code-review r11).
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumnRenamed(stratumCol, "__s2")
    ranked.join(broadcast(counts), col(stratumCol) <=> col("__s2"))
      .withColumn("split",
        when(col("__r") * lit(100L) <= col("__n") * lit(pctEval.toLong),
          lit("eval")).otherwise(lit("train")))
      .drop("__r", "__n", "__s2")
  }

  /** Token-budget corpus selection — the TOKEN-denominated quota the
    * doc-count forms (q62, q91, q149) approximate: walk each group's
    * docs in the deterministic (md5(id), id) order and keep every doc
    * that STARTS before the group's token budget is spent (the first
    * crossing doc is kept, so the budget is met, never starved; kept
    * totals land in [budget, budget + max_doc_tokens)). The running
    * token sum is [[md5BucketCumsum]] — exact LONG arithmetic, two-level
    * (no per-group single-task window) — so the kept set is a pure,
    * engine-replayable function of the data. Callers with a stored
    * per-doc length profile pass it as `tokensCol`; the declared query
    * derives lengths in-plan. */
  def tokenBudgetSelect(docs: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1L, s"budget must be positive, got $budgetTokens")
    md5BucketCumsum(docs, groupCol, idCol, tokensCol, cumAs = "cum_tokens")
      .filter(col("cum_tokens") - col(tokensCol) < budgetTokens)
  }

  /** Arrival-order streaming form of [[tokenBudgetSelect]] — the
    * [[ppsAdmitBatch]] frozen-offset pattern applied to the token quota:
    * the batch's docs are laid on each group's token line in (md5(id),
    * id) order starting at the group's frozen `baseTokens` offset, and a
    * doc is admitted iff it STARTS before the budget. Every arriving doc
    * occupies the line whether or not it is admitted (selection
    * semantics, not refill semantics), so chaining batches b1..bk IS one
    * [[tokenBudgetSelect]] pass over the concatenated line — the
    * chained ≡ one-shot law, pinned in StreamingSpec over (batch, md5,
    * id) order — and once a group's line crosses the budget, later
    * batches admit nothing for it. `baseTokens` maps group → token units
    * already laid down by ALL previous batches; advance it with
    * [[ppsGroupTotals]](batch, groupCol, tokensCol) over each FULL batch
    * (not just the admitted rows). Driver map is fine here for the same
    * reason as ppsAdmitBatch: groups are sources/epochs (bounded), not
    * open-web domains. */
  def tokenBudgetAdmitBatch(batch: DataFrame, baseTokens: Map[String, Long],
      groupCol: String, idCol: String, tokensCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1L, s"budget must be positive, got $budgetTokens")
    val base = frozenBase(baseTokens, groupCol)
    md5BucketCumsum(batch, groupCol, idCol, tokensCol, cumAs = "__ct")
      .filter(base + col("__ct") - col(tokensCol).cast("long") < budgetTokens)
      .drop("__ct")
  }

  private val q155 = GraftQuery(
    "q155_token_budget",
    (s, dir) => {
      import graft.functions.TextFunctions.tokens
      tokenBudgetSelect(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", budgetTokens = 700L)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH sized AS (SELECT doc_id, source,
                            CAST(len(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS BIGINT) AS n_tokens
                     FROM documents),
      walked AS (SELECT doc_id, source, n_tokens,
                        CAST(SUM(n_tokens) OVER (PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                 FROM sized)
      SELECT doc_id, source, n_tokens, cum_tokens
      FROM walked
      WHERE cum_tokens - n_tokens < 700
      ORDER BY doc_id"""))

  private val q152 = GraftQuery(
    "q152_stratified_split",
    (s, dir) => stratifiedSplit(
      Tables.documents(s, dir).select(col("doc_id"), col("source")),
      "source", "doc_id", pctEval = 10)
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, source,
             CASE WHEN CAST(ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) * 100
                       <= COUNT(*) OVER (PARTITION BY source) * 10
                  THEN 'eval' ELSE 'train' END AS split
      FROM documents
      ORDER BY doc_id"""))

  // ------------------------------------- q152b interleaved stratified split
  // The STREAMABLE form of q152's exact allocation: q152's prefix rule
  // (eval = the first ⌊n·pct/100⌋ md5-ranks) needs the stratum total n,
  // so arriving documents can flip earlier assignments — it cannot
  // admit incrementally. The interleaved rule assigns eval exactly when
  // the integer allocation line steps: doc at stratum rank r is eval iff
  // ⌊r·pct/100⌋ > ⌊(r-1)·pct/100⌋ (the largest-remainder walk, the same
  // arithmetic a Bresenham line uses). That is a pure function of the
  // doc's OWN rank — no stratum total anywhere — so (a) every prefix of
  // the line holds exactly ⌊r·pct/100⌋ eval docs (exact allocation at
  // ALL snapshots, strictly stronger than q152's final-count-only
  // guarantee), and (b) the frozen-offset admission pattern applies
  // verbatim: [[stratifiedAdmitBatch]] chained over arrival batches IS
  // this function over the concatenated line (StreamingSpec law).
  // Integer cross-multiplication only; same md5-rank scale shape as
  // q152 (two-level rank, mega-stratum-safe, no per-stratum total join
  // at all — one pass fewer than q152).
  def stratifiedInterleaved(docs: DataFrame, stratumCol: String,
      idCol: String, pctEval: Int): DataFrame = {
    require(pctEval >= 1 && pctEval <= 99, s"pctEval in [1,99], got $pctEval")
    md5BucketRank(docs, stratumCol, idCol, rankAs = "__r")
      .withColumn("split",
        when(expr(s"(__r * $pctEval) div 100") >
          expr(s"((__r - 1) * $pctEval) div 100"), lit("eval"))
          .otherwise(lit("train")))
      .drop("__r")
  }

  /** Arrival-order streaming form of [[stratifiedInterleaved]] — the
    * [[ppsAdmitBatch]] frozen-offset pattern applied to split
    * assignment: the batch's docs take stratum ranks base+1..base+m in
    * (md5(id), id) order and the Bresenham step rule labels each one
    * from its own rank alone. Chaining batches IS one
    * [[stratifiedInterleaved]] pass over the concatenated line
    * (chained ≡ one-shot, StreamingSpec), and after EVERY batch each
    * stratum's eval count is exactly ⌊rank·pct/100⌋ — the allocation
    * can never drift, which is the property a crawl-refresh eval split
    * needs. `baseCounts` maps stratum → docs already laid down by ALL
    * previous batches; advance it with [[ppsGroupTotals]] over each
    * full batch. Driver map is fine for the same reason as
    * [[ppsAdmitBatch]]: strata are sources/languages (bounded), not
    * open-web domains. */
  def stratifiedAdmitBatch(batch: DataFrame, baseCounts: Map[String, Long],
      stratumCol: String, idCol: String, pctEval: Int): DataFrame = {
    require(pctEval >= 1 && pctEval <= 99, s"pctEval in [1,99], got $pctEval")
    val base = frozenBase(baseCounts, stratumCol)
    md5BucketRank(batch, stratumCol, idCol, rankAs = "__ar")
      .withColumn("__r", base + col("__ar"))
      .withColumn("split",
        when(expr(s"(__r * $pctEval) div 100") >
          expr(s"((__r - 1) * $pctEval) div 100"), lit("eval"))
          .otherwise(lit("train")))
      .drop("__ar", "__r")
  }

  private val q152b = GraftQuery(
    "q152b_stratified_interleaved",
    (s, dir) => stratifiedInterleaved(
      Tables.documents(s, dir).select(col("doc_id"), col("source")),
      "source", "doc_id", pctEval = 10)
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id")),
    Some("""
      WITH ranked AS (SELECT doc_id, source,
                             CAST(ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS r
                      FROM documents)
      SELECT doc_id, source,
             CASE WHEN (r * 10) // 100 > ((r - 1) * 10) // 100
                  THEN 'eval' ELSE 'train' END AS split
      FROM ranked
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q61, q62, q63, q64, q65, q66, q79, q80, q84,
    q85, q86, q89, q91, q98, q101, q115, q124, q134, q141, q143, q149, q150,
    q152, q152b, q155)
}
