package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.TextFunctions._
import graft.sources.Tables

/** The full training-data curation chain as ONE composed operator
  * (VERDICT r6 next #6): quality gate → decontamination → exact+near
  * dedup → paragraph dedup → epoch mix. Every stage is an individually
  * oracle-verified operator (q33/q85 gate, q79/q89 decontamination, q51
  * dedup, q88 paragraph dedup, q91 epoch mix); this query pins their
  * COMPOSITION — column contracts, set semantics, and caching across
  * stage boundaries — which is what a training-data team actually runs.
  *
  * Decontamination is the TWO-PHASE form: the q89 bloom (a constant-size
  * plan literal, no false negatives by construction) prefilters the
  * corpus to suspects, and the q79 exact gram join confirms ONLY those
  * suspects. The kept set is therefore exactly the exact-decontamination
  * kept set (bloom false positives are weeded by the confirm), so the
  * DuckDB oracle replays the chain exactly — while at 100 TB the
  * expensive corpus-wide gram join shrinks to the suspect set
  * (contaminated docs + bloom FPs, ≪ corpus), with the full corpus only
  * ever scanned against the bloom literal.
  *
  * Shape at 100 TB, stage by stage: gate = stateless scan; bloom
  * prefilter = stateless scan against a numBits/8-byte literal; exact
  * confirm = gram join over suspects only; dedup = the audited q51 plan
  * (digest collapse, banded candidates, verified edges, CC); paragraph
  * dedup = one 8-byte-hash agg + the inherent reassembly groupBy (the
  * chain's single corpus-text shuffle); epoch mix = broadcast quota +
  * two-level md5 ranking. Intermediate corpora (post-decontamination,
  * post-paragraph-dedup, post-span-dedup) are materialized with
  * `localCheckpoint`: the downstream epoch-mix reads the final corpus
  * several times, and in a production run these stage boundaries are
  * parquet writes anyway — the checkpoint stands in for that
  * materialization. localCheckpoint rather than persist deliberately:
  * it also TRUNCATES the logical plan at the boundary, where a persist
  * leaves the full chain lineage in every downstream query and the
  * driver re-canonicalizes the whole tree on each of epoch-mix's three
  * self-references (measured 13.3 s → 2.2 s on the mix stage alone at
  * sf0.001 — pure driver-side plan overhead, not execution).
  */
object CurationChain {

  /** `spanK > 0` inserts the q95 exact substring-dedup stage (Lee et al.
    * 2021 run span dedup over the FULL corpus — Dedup.substringDedup's
    * own motivation) between paragraph dedup and epoch mix, removing
    * every non-first occurrence of a repeated spanK-token span from the
    * paragraph-cleaned text; documents left with no tokens drop out.
    * `spanK = 0` (the q93 pin) skips the stage — oracle unchanged.
    */
  def curationChain(docs: DataFrame, targetDocs: Long,
      spanK: Int = 0): DataFrame =
    chainStaged(docs, targetDocs, spanK, probe = None)

  /** [[curationChain]] with a stage-boundary tap — the per-stage
    * telemetry VERDICT r11 stretch #9 asked for. `probe` receives each
    * stage's NAME and its output frame right where the production chain
    * creates it; with `probe = None` the code path is byte-identical to
    * the declared q93/q93b plan (tap is identity), so the telemetry
    * variant can never drift from the measured one. A probing caller
    * (ScaleProbe mode `chainstages`) forces each tapped frame and clocks
    * the gap — note the gate/near-dedup taps force work the production
    * chain fuses into the next checkpoint, so probed wall is
    * attribution, not added cost. */
  private[graft] def chainStaged(docs: DataFrame, targetDocs: Long,
      spanK: Int,
      probe: Option[(String, DataFrame) => Unit]): DataFrame = {
    def tap(name: String, df: DataFrame): DataFrame = {
      // stage-plan capture for PlanDumpR19 (None in Bench/Verify): the
      // chains checkpoint eagerly, so the final explain only shows the
      // post-checkpoint frame — the ingest-stage claims are verifiable
      // only from these per-stage plans
      graft.IterProbe.tap(s"stage_$name", 0, df)
      probe.foreach(_(name, df)); df
    }
    val toks = tokens(col("text"))
    val en = Seq("the", "a", "and", "of", "to", "is", "in")
    val stopCnt = size(filter(toks, t => array_contains(array(en.map(lit): _*), t)))
    // stage 1 — quality gate (q85's rule: language, length band, stopword
    // ratio; all stateless column arithmetic)
    val gated = tap("quality_gate", docs
      .withColumn("n_tokens", size(toks))
      .withColumn("sr", stopCnt.cast("double") / col("n_tokens"))
      .filter(col("lang") === "en" && col("n_tokens").between(20, 1000) &&
        col("sr") > 0.02)
      .select(col("doc_id"), col("source"), col("text")))
    // stage 2 — two-phase decontamination against the eval split
    // (doc_id % 97 = 0, the q79/q85/q89 convention): bloom prefilter →
    // exact confirm on suspects only; net kept set == exact semantics
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val train = gated.filter(col("doc_id") % 97 =!= 0)
    val clean = tap("decontaminate",
      DataPrep.decontaminateTwoPhase(train, evalSet, "doc_id",
        "text", n = 4, expectedItems = 100000L, numBits = 1600000L)
        .localCheckpoint())
    // stage 3 — exact + near dedup, the q51 path (exact dups collapse to
    // the cluster minimum inside clusterAssignments, so reps cover both)
    val reps = Curation.clusterAssignments(clean.select("doc_id", "text"),
        threshold = 0.5)
      .filter(col("rep") === col("doc_id")).select(col("doc_id"))
    val deduped = tap("near_dedup",
      clean.join(reps, Seq("doc_id"), "left_semi"))
    // stage 4 — paragraph dedup at maxDf = 1 over deterministic 20-token
    // rendered paragraphs (q88's shape: the corpus is a flat token
    // stream, so paragraphs are rendered, not native)
    val para = deduped
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), col("source"),
        concat_ws("\n", transform(
          sequence(lit(1), ceil(size(col("t")) / lit(20.0)).cast("int")),
          i => concat_ws(" ", slice(col("t"), (i - 1) * 20 + 1, lit(20)))))
          .as("text2"))
    val fin = tap("paragraph_dedup", Dedup.paragraphDedup(
        para.select("doc_id", "text2"),
        "doc_id", "text2", "\n", maxDf = 1L)
      .filter(length(col("clean_text")) > 0)
      .join(para.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("clean_text"))
      .localCheckpoint())
    // stage 4b (optional) — corpus-wide exact span dedup over the
    // paragraph-cleaned text (q95's keep-first coverage semantics)
    val curated =
      if (spanK <= 0) fin
      else tap("span_dedup",
        Dedup.substringDedupText(fin, "doc_id", "clean_text", spanK)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("clean_text"))
        .join(fin.select(col("doc_id"), col("source")), Seq("doc_id"))
        .localCheckpoint())
    // stage 5 — epoch mix over the curated corpus (q91's exact-quota +
    // two-level md5 ranking), weights from the CLEANED text
    tap("epoch_mix",
      DataPrep.epochMix(curated, "doc_id", "clean_text", "source", targetDocs))
  }

  // ------------------------------------------------- q93c crawl ingest
  /** The CRAWL-NATIVE chain (VERDICT r14 next #2) — the ingest prefix a
    * real curation team runs BEFORE the q93b chain, composed end to end
    * from individually-verified operators:
    *
    *   WARC parse (q177) → HTML extract (q171) → NFC normalize (q173) →
    *   host blocklist gate (q170) → path-prefix gate (q174) →
    *   language-ID gate with a stored model (q169) → the q93b chain.
    *
    * Stage shapes at 100 TB: WARC/HTML/NFC are ONE stateless scan
    * (fused codegen projections, no shuffle); the host/path gates are
    * broadcast anti joins against KB-sized stored policy lists (the
    * corpus never shuffles); language ID is the q169 wordcount class
    * (trigram explode → broadcast model join → per-doc argmax); the
    * ingested corpus is then localCheckpoint'ed — in production this
    * boundary is the parquet write between the ingest fleet and the
    * curation fleet — and the chain proper runs downstream.
    *
    * Fixture: [[Warc.crawlRecord]] builds response records whose bodies
    * HTML-wrap the document text (decomposed accents so NFC composes
    * visibly, entities, script blocks), with malformed rotations the
    * parse drops and `/ads/` paths the path gate drops; the host gate
    * blocks `min(source).example.com` (a 1-row stored policy); the LID
    * model learns from the even-doc_id half's planted labels (the q169
    * convention) and the gate keeps predicted-English crawl docs. */
  def crawlChain(docs: DataFrame, targetDocs: Long,
      spanK: Int = 0): DataFrame =
    crawlChainStaged(docs, targetDocs, spanK, probe = None)

  /** [[crawlChain]] with the stage-boundary tap extended over the
    * INGEST prefix too (the q93b `chainStaged` telemetry discipline —
    * VERDICT r14 next #2's done-criterion): `probe = None` is the
    * byte-identical declared q93c path. */
  private[graft] def crawlChainStaged(docs: DataFrame, targetDocs: Long,
      spanK: Int,
      probe: Option[(String, DataFrame) => Unit]): DataFrame = {
    def tap(name: String, df: DataFrame): DataFrame = {
      // stage-plan capture for PlanDumpR19 (None in Bench/Verify): the
      // chains checkpoint eagerly, so the final explain only shows the
      // post-checkpoint frame — the ingest-stage claims are verifiable
      // only from these per-stage plans
      graft.IterProbe.tap(s"stage_$name", 0, df)
      probe.foreach(_(name, df)); df
    }
    // WARC build ⊗ parse: only valid response bodies survive
    val bodies = tap("warc_parse", Warc.warcBodies(
      docs.withColumn("rec", Warc.crawlRecord()), "doc_id", "rec",
      keep = Seq("source")))
    // HTML → text → NFC, still the same stateless scan
    val extracted = tap("extract_nfc", bodies.select(col("doc_id"),
      col("source"), col("target_uri"),
      graft.functions.NfcNormalize(
        Extraction.htmlText(col("body"))).as("text")))
    // stored host policy: block the lexicographically-first source's
    // host (1 row, data-derived, broadcast)
    val blockList = docs.agg(min(col("source")).as("s"))
      .select(concat(lit("v:"), col("s"), lit(".example.com"))
        .as("host_key"), lit("blocked_source").as("rule"))
    val hostGated = tap("host_gate",
      UrlOps.hostGate(extracted, "target_uri", blockList))
    // stored path policy: /ads is blocked on EVERY crawl host
    val pathRules = docs.select(col("source")).distinct()
      .select(concat(lit("v:"), col("source"), lit(".example.com"))
          .as("host_key"),
        lit("/ads").as("path_prefix"), lit("ads").as("rule"))
    // checkpoint HERE, not only at `ing`: the langid join below reads
    // pathGated on BOTH sides (docs + scores), and without the cut the
    // whole ingest prefix (WARC regex scan, extract, NFC, two gates)
    // executes twice per action (code-review r15)
    val pathGated = tap("path_gate",
      UrlOps.pathPrefixGate(hostGated, "target_uri", pathRules)
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint())
    // language-ID gate: stored model from the labeled half, keep
    // predicted-English; prediction becomes the crawl doc's lang
    val model = LangId.langIdModel(
      docs.filter(col("doc_id") % 2 === 0), "text", "lang")
    val ing = tap("langid_gate", pathGated
      .join(LangId.langIdScore(pathGated, "doc_id", "text", model)
          .filter(col("pred_lang") === "en")
          .select(col("doc_id"), col("pred_lang").as("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("text"), col("lang"))
      // the production ingest/curation fleet boundary (a parquet write
      // there); also cuts the ingest lineage out of the chain's many
      // self-references
      .localCheckpoint())
    chainStaged(ing, targetDocs, spanK, probe)
  }

  // ------------------------------------------------ q93d http ingest
  /** The HTTP-COMPLETE crawl chain — q93c's ingest with the two stages
    * a real crawl actually has between WARC and text: the HTTP
    * response layer (q188: status/media-type gate — 404s and
    * text/plain bodies never reach extraction) and main-content block
    * selection (q197: boilerplate-free text INSTEAD of whole-page
    * htmlText):
    *
    *   WARC → HTTP gate (200 ∧ text/html) → main-content blocks →
    *   NFC → host gate → path gate → language-ID gate → the q93b chain.
    *
    * Same stage shapes as [[crawlChain]] (stateless scans + broadcast
    * gates + the q169 class); the block-selection step is one
    * array-function projection (q197). */
  def crawlChainHttp(docs: DataFrame, targetDocs: Long,
      spanK: Int = 0): DataFrame =
    crawlChainHttpStaged(docs, targetDocs, spanK, probe = None)

  /** q93d fixture record: the SHARED [[Http.withCrawlHttpRecord]]
    * builder (404s on %4=1, text/plain on %5=2, chunked transfer on
    * %3=0 — the de-chunk stage rides the chain transparently) with the
    * %7 `/ads/` path rotation in the WARC target URI (this chain's own
    * path-gate subject; q188b keeps plain `/doc/`). */
  private def withCrawlHttpRecord(docs: DataFrame): DataFrame =
    Http.withCrawlHttpRecord(docs,
      concat(lit("http://"), col("source"), lit(".example.com"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit("/ads/"))
          .otherwise(lit("/doc/")),
        col("doc_id").cast("string")))

  private[graft] def crawlChainHttpStaged(docs: DataFrame,
      targetDocs: Long, spanK: Int,
      probe: Option[(String, DataFrame) => Unit]): DataFrame = {
    def tap(name: String, df: DataFrame): DataFrame = {
      // stage-plan capture for PlanDumpR19 (None in Bench/Verify): the
      // chains checkpoint eagerly, so the final explain only shows the
      // post-checkpoint frame — the ingest-stage claims are verifiable
      // only from these per-stage plans
      graft.IterProbe.tap(s"stage_$name", 0, df)
      probe.foreach(_(name, df)); df
    }
    val bodies = tap("warc_parse", Warc.warcBodies(
      withCrawlHttpRecord(docs), "doc_id", "rec",
      keep = Seq("source")))
    val pages = tap("http_gate", Http.httpPayloads(bodies, "doc_id",
      "body", keep = Seq("source", "target_uri")))
    // optimization r19 (guide §1.2): the interpreted strip+HOF pipeline
    // (stripScriptStyle regex + mainTextCol's CodegenFallback lambdas)
    // owned this fused ingest scan's per-row CPU (~6.4 s probed at
    // sf0.1); now ONE native codegen'd traversal (MainContentExtract,
    // bit-equality pinned by MainContentSpec)
    val extracted = tap("main_nfc", pages
      .select(col("doc_id"), col("source"), col("target_uri"),
        graft.functions.NfcNormalize(
          MainContent.mainTextNative(col("payload"), 30, 50)).as("text")))
    val blockList = docs.agg(min(col("source")).as("s"))
      .select(concat(lit("v:"), col("s"), lit(".example.com"))
        .as("host_key"), lit("blocked_source").as("rule"))
    val hostGated = tap("host_gate",
      UrlOps.hostGate(extracted, "target_uri", blockList))
    val pathRules = docs.select(col("source")).distinct()
      .select(concat(lit("v:"), col("source"), lit(".example.com"))
          .as("host_key"),
        lit("/ads").as("path_prefix"), lit("ads").as("rule"))
    val pathGated = tap("path_gate",
      UrlOps.pathPrefixGate(hostGated, "target_uri", pathRules)
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint())
    val model = LangId.langIdModel(
      docs.filter(col("doc_id") % 2 === 0), "text", "lang")
    val ing = tap("langid_gate", pathGated
      .join(LangId.langIdScore(pathGated, "doc_id", "text", model)
          .filter(col("pred_lang") === "en")
          .select(col("doc_id"), col("pred_lang").as("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("text"), col("lang"))
      .localCheckpoint())
    chainStaged(ing, targetDocs, spanK, probe)
  }

  // q93d ingest replay: HTTP survivors by construction arithmetic
  // (%4 404s and %5 text/plain never parse out), the SHARED q197
  // main-content expression, DuckDB nfc_normalize, the same gate
  // predicates and the shared q169 cascade.
  private def crawlHttpIngestCtes: String = s"""
      cr AS MATERIALIZED (SELECT doc_id, source, lang,
              ${Warc.crawlHtmlSql} AS html,
              CAST(doc_id % 7 = 0 AS BOOLEAN) AS is_ads
            FROM documents
            WHERE doc_id % 4 <> 1 AND doc_id % 5 <> 2),
      mt AS MATERIALIZED (SELECT doc_id, source, is_ads,
              ${MainContent.mainTextSqlExpr("html", 30, 50)} AS mtext
            FROM cr),
      gated AS MATERIALIZED (SELECT doc_id, source,
               nfc_normalize(mtext) AS ntext
             FROM mt
             WHERE NOT is_ads
               AND source <> (SELECT min(source) FROM documents)),
      ${LangId.langIdSqlCtes(
        "(SELECT lang, text FROM documents WHERE doc_id % 2 = 0)",
        "gated", "ntext", "lid")},
      ing AS MATERIALIZED (SELECT g.doc_id, g.source, l.pred_lang AS lang,
               g.ntext AS text
             FROM gated g JOIN lid l USING (doc_id)
             WHERE l.pred_lang = 'en'),"""

  // The ingest replay: surviving-parse reconstruction from the
  // construction arithmetic (the q131 convention — a wrong build or a
  // wrong parse both break the hash), the shared q171 extract cascade,
  // DuckDB's own nfc_normalize, the gate predicates in construction
  // terms (host = source-derived, path = the %7 rotation), and the
  // shared q169 learn/score cascade.
  private def crawlIngestCtes: String = s"""
      cr AS MATERIALIZED (SELECT doc_id, source, lang,
              ${Warc.crawlHtmlSql} AS html,
              CAST(doc_id % 7 = 0 AS BOOLEAN) AS is_ads
            FROM documents
            WHERE doc_id % 13 <> 0 AND doc_id % 11 <> 0),
      ${Extraction.htmlTextSql("cr", "html", "ext",
        Seq("doc_id", "source", "is_ads"))},
      gated AS MATERIALIZED (SELECT doc_id, source,
               nfc_normalize(__text) AS ntext
             FROM ext
             WHERE NOT is_ads
               AND source <> (SELECT min(source) FROM documents)),
      ${LangId.langIdSqlCtes(
        "(SELECT lang, text FROM documents WHERE doc_id % 2 = 0)",
        "gated", "ntext", "lid")},
      ing AS MATERIALIZED (SELECT g.doc_id, g.source, l.pred_lang AS lang,
               g.ntext AS text
             FROM gated g JOIN lid l USING (doc_id)
             WHERE l.pred_lang = 'en'),"""

  // ---------------------------------------------------------------- q93
  // The chain as a declared query: 500-doc target epoch over the curated
  // corpus. The oracle replays every stage in one WITH cascade — the
  // q85 gate, exact decontamination (== the two-phase bloom+confirm by
  // the no-false-negative law), the q51 recursive-closure dedup, the
  // q88 paragraph dedup, and the q91 quota/ranking arithmetic — so a
  // drift in ANY stage's set semantics or in a cross-stage column
  // contract fails the hash. q93b runs the same chain with the q95
  // substring-dedup stage enabled (spanK); its oracle splices the span
  // replay between the paragraph stage and the mix arithmetic.
  /** The chain replay cascade. `src` is the corpus CTE/table feeding the
    * chain (must expose doc_id, source, lang, text); `prefix` is an
    * optional CTE chunk (ending with a comma) spliced ahead of `tok` —
    * the q93c ingest stages define their `src` there. */
  private def oracleCore(src: String = "documents",
      prefix: String = "") = s"""
      WITH RECURSIVE $prefix
      tok AS MATERIALIZED (SELECT doc_id, source, lang, text,
                     list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS t
              FROM $src),
      kept AS MATERIALIZED (SELECT doc_id, source, text, t FROM tok
               WHERE lang = 'en' AND len(t) BETWEEN 20 AND 1000
                 AND CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','is','in'], x))) AS DOUBLE) / len(t) > 0.02),
      grams AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))) AS g
                FROM tok WHERE len(t) >= 4),
      eval_grams AS MATERIALIZED (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      contaminated AS MATERIALIZED (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams)),
      clean AS MATERIALIZED (SELECT doc_id, source, t FROM kept
                WHERE doc_id % 97 <> 0
                  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      sh AS MATERIALIZED (SELECT doc_id, unnest(shl) AS s
             FROM (SELECT doc_id,
                          list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shl
                   FROM clean WHERE len(t) >= 3) s0),
      hashed AS MATERIALIZED (SELECT doc_id, i,
                        ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || s), 1, 15))::BIGINT AS h
                 FROM sh CROSS JOIN range(0, 8) r(i)),
      minh AS MATERIALIZED (SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY doc_id, i),
      bands AS MATERIALIZED (SELECT doc_id, i // 2 AS band,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
                FROM minh GROUP BY doc_id, i // 2),
      cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      common AS MATERIALIZED (SELECT da, db, COUNT(*) AS c
                 FROM cand JOIN sh a ON a.doc_id = da
                           JOIN sh b ON b.doc_id = db AND a.s = b.s
                 GROUP BY da, db),
      edges AS MATERIALIZED (SELECT da, db FROM common
                JOIN sizes na ON na.doc_id = da JOIN sizes nb ON nb.doc_id = db
                WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5),
      sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM edges
              UNION ALL SELECT db, da FROM edges),
      reach AS (SELECT doc_id AS a, doc_id AS b FROM clean
                UNION
                SELECT r.a, e.dst FROM reach r JOIN sym e ON e.src = r.b),
      reps AS MATERIALIZED (SELECT a AS doc_id, MIN(b) AS rep FROM reach GROUP BY a),
      dedup AS MATERIALIZED (SELECT c.doc_id, c.source, c.t FROM clean c
                JOIN reps r ON c.doc_id = r.doc_id AND r.rep = c.doc_id),
      d2 AS MATERIALIZED (SELECT doc_id, source,
                    array_to_string(list_transform(
                      range(1, CAST(ceil(len(t) / 20.0) AS BIGINT) + 1),
                      i -> array_to_string(t[(i-1)*20+1 : i*20], ' ')), chr(10)) AS text2
             FROM dedup WHERE len(t) >= 1),
      pars AS MATERIALIZED (SELECT doc_id, i, par
               FROM (SELECT doc_id,
                            generate_subscripts(string_split(text2, chr(10)), 1) AS i,
                            unnest(string_split(text2, chr(10))) AS par
                     FROM d2)
               WHERE trim(par) <> ''),
      freq AS MATERIALIZED (SELECT par, COUNT(DISTINCT doc_id) AS df FROM pars GROUP BY par),
      flagged AS MATERIALIZED (SELECT p.doc_id, p.i, p.par, f.df > 1 AS dup
                  FROM pars p JOIN freq f USING (par)),
      fintext0 AS MATERIALIZED (SELECT doc_id,
                          coalesce(string_agg(CASE WHEN NOT dup THEN par END, chr(10) ORDER BY i), '') AS clean_text
                   FROM flagged GROUP BY doc_id),
      fintext AS MATERIALIZED (SELECT d.doc_id, d.source, f.clean_text
                  FROM d2 d JOIN fintext0 f USING (doc_id)
                  WHERE f.clean_text <> '')"""

  // q95's span-dedup replay over the paragraph-cleaned text: positional
  // k-grams, keep-first by (doc_id, pos), difference-array coverage,
  // reassembly; docs with nothing left drop out
  private def oracleSpanStage(k: Int) = s""",
      stoks AS MATERIALIZED (SELECT doc_id, source,
                       list_filter(string_split_regex(lower(clean_text), '\\W+'), x -> x <> '') AS t
                FROM fintext),
      socc AS MATERIALIZED (SELECT doc_id, i AS pos, array_to_string(t[i:i+$k-1], ' ') AS g
               FROM (SELECT doc_id, t, unnest(range(1, len(t) - $k + 2)) AS i
                     FROM stoks WHERE len(t) >= $k)),
      socc2 AS MATERIALIZED (SELECT doc_id, pos,
                       COUNT(*) OVER (PARTITION BY g) AS c,
                       ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
                FROM socc),
      sflag AS MATERIALIZED (SELECT doc_id, pos FROM socc2 WHERE c > 1 AND rn > 1),
      sdeltas AS MATERIALIZED (SELECT doc_id, p, SUM(d) AS d FROM (
                    SELECT doc_id, pos AS p, 1 AS d FROM sflag
                    UNION ALL
                    SELECT doc_id, pos + $k AS p, -1 AS d FROM sflag)
                  GROUP BY doc_id, p),
      stokpos AS MATERIALIZED (SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS tok
                  FROM stoks),
      scovered AS MATERIALIZED (SELECT tp.doc_id, tp.p, tp.tok,
                          SUM(COALESCE(dl.d, 0)) OVER (PARTITION BY tp.doc_id
                                                       ORDER BY tp.p) AS cum
                   FROM stokpos tp LEFT JOIN sdeltas dl
                     ON tp.doc_id = dl.doc_id AND tp.p = dl.p),
      sclean AS MATERIALIZED (SELECT doc_id,
                        coalesce(string_agg(CASE WHEN cum <= 0 THEN tok END, ' ' ORDER BY p), '') AS ctext
                 FROM scovered GROUP BY doc_id),
      sfin AS MATERIALIZED (SELECT s.doc_id, s.source, c.ctext AS clean_text
               FROM stoks s JOIN sclean c USING (doc_id)
               WHERE c.ctext <> '')"""

  // the q91 mix arithmetic over the curated corpus CTE named `src`
  private def oracleTail(src: String, target: Long) = s""",
      ftoks AS MATERIALIZED (SELECT source, len(list_filter(string_split_regex(lower(clean_text), '\\W+'), x -> x <> '')) AS ntok
                FROM $src),
      ps AS MATERIALIZED (SELECT source, CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM ftoks GROUP BY source),
      sq AS MATERIALIZED (SELECT source, CAST(sqrt(n_tokens) AS DECIMAL(38,6)) AS sq FROM ps),
      wts AS MATERIALIZED (SELECT source,
                     CAST(sq AS DOUBLE) / CAST((SELECT SUM(sq) FROM sq) AS DOUBLE) AS weight
              FROM sq),
      quota AS MATERIALIZED (SELECT w.source,
                       CAST(floor(w.weight * $target) AS BIGINT) AS target,
                       c.n_docs
                FROM wts w JOIN (SELECT source, COUNT(*) AS n_docs
                                 FROM $src GROUP BY source) c
                  ON w.source = c.source),
      ranked AS MATERIALIZED (SELECT doc_id, source,
                        ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                 FROM $src)
      SELECT r.doc_id, r.source,
             CAST(target // n_docs + CASE WHEN rk <= target % n_docs THEN 1 ELSE 0 END AS BIGINT) AS n_copies
      FROM ranked r JOIN quota q ON r.source = q.source
      ORDER BY r.doc_id"""

  private val q93 = GraftQuery(
    "q93_curation_chain",
    (s, dir) => curationChain(Tables.documents(s, dir), targetDocs = 500L)
      .orderBy(col("doc_id")),
    Some(oracleCore() + oracleTail("fintext", 500L)))

  // ---------------------------------------------------------------- q93b
  // The chain WITH the span stage (VERDICT r7 #4): spanK-token repeated
  // spans are removed corpus-wide (keep-first) from the paragraph-cleaned
  // text before the mix; the oracle replays that stage too. K = 4 because
  // the upstream near-dup + paragraph stages already remove every longer
  // repeat at these SFs (measured: k ≥ 6 flags zero spans at sf0.001;
  // k = 4 rewrites ~47 docs) — the declared pin must exercise the stage,
  // not replay a no-op; production corpora would use the paper-scale
  // 50-token spans via the spanK parameter.
  private val q93b = {
    val K = 4
    GraftQuery(
      "q93b_curation_chain_span",
      (s, dir) => curationChain(Tables.documents(s, dir), targetDocs = 500L,
          spanK = K)
        .orderBy(col("doc_id")),
      Some(oracleCore() + oracleSpanStage(K) + oracleTail("sfin", 500L)))
  }

  // ---------------------------------------------------------------- q93c
  // The crawl-native chain as a declared query: the full ingest prefix
  // spliced ahead of the q93b chain (span stage on, K = 4 — the q93b
  // pin), single-oracle WITH-cascade replay of all ten stages.
  private val q93c = {
    val K = 4
    GraftQuery(
      "q93c_crawl_chain",
      (s, dir) => crawlChain(Tables.documents(s, dir), targetDocs = 500L,
          spanK = K)
        .orderBy(col("doc_id")),
      Some(oracleCore("ing", crawlIngestCtes) + oracleSpanStage(K) +
        oracleTail("sfin", 500L)))
  }

  // ---------------------------------------------------------------- q93d
  // The HTTP-complete crawl chain as a declared query (span on, K = 4):
  // twelve stages, ONE oracle cascade.
  private val q93d = {
    val K = 4
    GraftQuery(
      "q93d_crawl_chain_http",
      (s, dir) => crawlChainHttp(Tables.documents(s, dir),
          targetDocs = 500L, spanK = K)
        .orderBy(col("doc_id")),
      Some(oracleCore("ing", crawlHttpIngestCtes) + oracleSpanStage(K) +
        oracleTail("sfin", 500L)))
  }

  val all: Seq[GraftQuery] = Seq(q93, q93b, q93c, q93d)
}
