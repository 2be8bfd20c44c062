package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Crawl snapshot diffing — the incremental-crawl bookkeeping between
  * two content snapshots `(url, content_md5)`: which URLs were added /
  * removed / changed / unchanged, and the per-host change rate that
  * drives recrawl frequency (hosts that churn get crawled often;
  * parked hosts decay — the scheduling signal [[Sitemaps]] lastmod and
  * [[Feeds]] pub dates approximate from the OUTSIDE, measured here
  * from actual content).
  *
  * Shape: ONE full-outer join on the URL key (both sides key-
  * partitioned — SortMergeJoin at 10^11 URLs, the q115 corpus-diff
  * class) + one hosts-sized rollup; change rate is exact per-mille
  * (`changed·1000 div (changed+unchanged)`, NULL when nothing
  * re-observed — refuse-visibly rather than claim stability).
  */
object Snapshots {

  /** Per-URL classification: `(url, class)` with class ∈
    * added | removed | changed | unchanged. */
  def crawlDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("url"), col("content_md5").as("__old"))
    val n = newSnap.select(col("url"), col("content_md5").as("__new"))
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") === col("__new"), lit("unchanged"))
          .otherwise(lit("changed")).as("class"))
  }

  /** Host-level rollup of [[crawlDiff]]:
    * `(host, n_added, n_removed, n_changed, n_unchanged,
    * change_permille)`. */
  def crawlDiffByHost(diff: DataFrame): DataFrame = {
    def n(c: String) =
      sum(when(col("class") === c, 1L).otherwise(0L)).as(s"n_$c")
    diff
      .withColumn("host", UrlOps.urlHost(col("url")))
      .filter(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(n("added"), n("removed"), n("changed"), n("unchanged"))
      .select(col("host"), col("n_added"), col("n_removed"),
        col("n_changed"), col("n_unchanged"),
        // exact integer per-mille: `div`, never FP division
        when(col("n_changed") + col("n_unchanged") > 0,
          expr("(n_changed * 1000) div (n_changed + n_unchanged)"))
          .as("change_permille"))
  }

  // ------------------------------------------- incremental admission
  /** Incremental snapshot state (VERDICT r16 next #3 — the q208/q210
    * stored-state discipline applied to the snapshot pair): instead of
    * diffing two FULL snapshots, a crawl epoch folds fetch batches into
    * a state table and closes with the same diff q200 computes
    * one-shot.
    *
    * State schema: `(url, orig_md5, cur_md5, last_fetch, seen)` —
    * `orig_md5` is the content hash at epoch open (NULL = the url was
    * first seen this epoch), `cur_md5` the latest fetched hash, `seen`
    * whether any batch re-observed the url. Each fold is ONE
    * url-keyed full-outer join (state- and batch-sized — never the
    * corpus; SortMergeJoin at 10^11 URLs); the close is a stateless
    * projection. The fold law (pinned by q215 against q200's ORACLE,
    * and by SnapshotsSpec forwards + reversed): for batches disjoint
    * on url, any fold order closes to exactly the one-shot
    * [[crawlDiff]] — and a url refetched across batches takes the
    * LAST fold's hash (latest fetch wins), the only ordered case. */
  def snapshotInit(oldSnap: DataFrame): DataFrame = {
    val lf = if (oldSnap.columns.contains("last_fetch"))
      col("last_fetch") else lit(null).cast("date")
    oldSnap.select(col("url"), col("content_md5").as("orig_md5"),
      col("content_md5").as("cur_md5"), lf.as("last_fetch"),
      lit(false).as("seen"))
  }

  /** Fold one fetch batch `(url, content_md5, fetch_day)` into the
    * state (see [[snapshotInit]]). A url fetched MORE THAN ONCE within
    * one batch collapses to a single row first — latest `fetch_day`
    * wins, `content_md5` as the deterministic tie-break (code-review
    * r17: the raw full-outer join would FAN OUT the state row and the
    * duplicate would survive every later fold, double-counting in the
    * close). */
  def snapshotAdmitBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val b = batch
      .groupBy(col("url"))
      .agg(max(struct(col("fetch_day"), col("content_md5"))).as("__m"))
      .select(col("url"), col("__m.content_md5").as("__b_md5"),
        col("__m.fetch_day").as("__b_day"), lit(true).as("__in_b"))
    state.join(b, Seq("url"), "full_outer")
      .select(col("url"),
        col("orig_md5"), // NULL for batch-first urls: the added marker
        when(col("__in_b"), col("__b_md5")).otherwise(col("cur_md5"))
          .as("cur_md5"),
        when(col("__in_b"), col("__b_day")).otherwise(col("last_fetch"))
          .as("last_fetch"),
        (coalesce(col("seen"), lit(false)) ||
          coalesce(col("__in_b"), lit(false))).as("seen"))
  }

  /** Close the epoch: per-url diff classes, the [[crawlDiff]] shape. */
  def snapshotClose(state: DataFrame): DataFrame =
    state.select(col("url"),
      when(col("orig_md5").isNull, lit("added"))
        .when(!col("seen"), lit("removed"))
        .when(col("orig_md5") === col("cur_md5"), lit("unchanged"))
        .otherwise(lit("changed")).as("class"))

  // ---------------------------------------------------- fixture corpus
  // Old snapshot: every document's URL with its text hash. New
  // snapshot rotation: %11 pages vanish (removed), %7 pages change
  // content (v2 suffix), %13 docs ALSO publish a brand-new URL
  // (added); the rest re-observe unchanged. Rotations overlap (a %77
  // doc is both removed-at-old-url and absent-from-new) — precedence
  // is structural: removal means absence, so the %11 arm wins by
  // construction in both engines.
  private def urlOf(idExpr: org.apache.spark.sql.Column) =
    concat(lit("https://"), col("source"), lit(".example.com/p/"),
      idExpr.cast("string"))

  /** The q200/q211 fixture snapshots (old, new). */
  private def fixtureSnaps(docs: DataFrame): (DataFrame, DataFrame) = {
    val old = docs.select(urlOf(col("doc_id")).as("url"),
      md5(col("text")).as("content_md5"))
    val newKept = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .select(urlOf(col("doc_id")).as("url"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          md5(concat(col("text"), lit("v2"))))
          .otherwise(md5(col("text"))).as("content_md5"))
    val newAdded = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
      .select(urlOf(col("doc_id") + lit(1000000L)).as("url"),
        md5(col("source")).as("content_md5"))
    (old, newKept.unionAll(newAdded))
  }

  // shared replay of the fixture snapshots + host rollup (q200 selects
  // from it; q211 feeds its change rate into the schedule)
  private val diffCtes = """old AS (
        SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               md5(text) AS h, source
        FROM documents),
      neww AS (
        SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 7 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS h,
               source
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id + 1000000 AS VARCHAR),
               md5(source), source
        FROM documents WHERE doc_id % 13 = 0),
      d AS (
        SELECT COALESCE(o.source, n.source) AS source,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'removed'
                    WHEN o.h = n.h THEN 'unchanged'
                    ELSE 'changed' END AS class
        FROM old o FULL OUTER JOIN neww n ON o.url = n.url),
      g AS (
        SELECT source || '.example.com' AS host,
               SUM(CASE WHEN class = 'added' THEN 1 ELSE 0 END) AS n_added,
               SUM(CASE WHEN class = 'removed' THEN 1 ELSE 0 END) AS n_removed,
               SUM(CASE WHEN class = 'changed' THEN 1 ELSE 0 END) AS n_changed,
               SUM(CASE WHEN class = 'unchanged' THEN 1 ELSE 0 END) AS n_unchanged
        FROM d GROUP BY source)"""

  private val q200 = GraftQuery(
    "q200_crawl_diff",
    (s, dir) => {
      val (old, neu) = fixtureSnaps(Tables.documents(s, dir))
      crawlDiffByHost(crawlDiff(old, neu))
        .orderBy(col("host"))
    },
    Some(s"""
      WITH $diffCtes
      SELECT host,
             CAST(n_added AS BIGINT) AS n_added,
             CAST(n_removed AS BIGINT) AS n_removed,
             CAST(n_changed AS BIGINT) AS n_changed,
             CAST(n_unchanged AS BIGINT) AS n_unchanged,
             CASE WHEN n_changed + n_unchanged > 0
                  THEN CAST(n_changed * 1000 // (n_changed + n_unchanged) AS BIGINT) END AS change_permille
      FROM g
      ORDER BY host"""))

  // ------------------------------------------------- recrawl scheduler
  /** Recrawl scheduling — the decision a crawl loop makes per stored
    * URL from the three freshness signals the engine already measures:
    * the site's own declared `lastmod` ([[Sitemaps]]), the host's
    * MEASURED content-change rate ([[crawlDiffByHost]]), and plain
    * staleness. Reasons in precedence order (the site's explicit
    * declaration beats statistics beats age):
    *   - `lastmod`: declared lastmod strictly newer than our fetch;
    *   - `churn`: host change rate ≥ `churnPermille` AND the fetch is
    *     at least `minIntervalDays` old (politeness floor — churn
    *     alone must not hammer);
    *   - `age`: fetch older than `maxAgeDays` (the everything-expires
    *     backstop);
    * else not due. All exact integer/date arithmetic (per-mille, day
    * diffs — no FP). `asOfDay` is an explicit parameter: scheduling is
    * a pure function of (state, signals, date), never of the wall
    * clock. One state scan + one url-keyed left join (lastmods) + one
    * hosts-sized broadcast — the q170 gate class. */
  def recrawlSchedule(state: DataFrame, lastmods: DataFrame,
      hostRates: DataFrame, asOfDay: String, churnPermille: Int,
      minIntervalDays: Int, maxAgeDays: Int): DataFrame = {
    val age = datediff(lit(asOfDay).cast("date"), col("last_fetch"))
      .cast("long")
    state
      .withColumn("host", UrlOps.urlHost(col("url")))
      .join(lastmods, Seq("url"), "left")
      .join(broadcast(hostRates.select(col("host"),
        col("change_permille"))), Seq("host"), "left")
      .withColumn("age_days", age)
      .withColumn("reason",
        when(col("lastmod").isNotNull &&
          col("lastmod") > col("last_fetch"), lit("lastmod"))
          .when(coalesce(col("change_permille"), lit(0L)) >=
            churnPermille.toLong &&
            col("age_days") >= minIntervalDays.toLong, lit("churn"))
          .when(col("age_days") >= maxAgeDays.toLong, lit("age")))
      .select(col("url"), col("host"), col("last_fetch"),
        col("age_days"), col("lastmod"), col("change_permille"),
        col("reason"), col("reason").isNotNull.as("due"))
  }

  // ---------------------------------------------------------------- q211
  // The scheduler composed over REAL signal producers: host change
  // rates come from the q200 diff rollup (replayed in the oracle via
  // the shared CTEs), declared lastmods from a per-url rotation that
  // straddles the fetch date (id%5-2 days around it — newer fires,
  // equal/older must NOT), fetch dates spread over a month so the age
  // backstop and the churn interval floor both bite. asOf 2026-02-05,
  // churn ≥ 150‰, interval ≥ 7 d, max age 30 d.
  private def q211Sched(docs: DataFrame): DataFrame = {
    val state = docs.select(urlOf(col("doc_id")).as("url"),
      date_add(lit("2026-01-01").cast("date"),
        pmod(col("doc_id"), lit(28)).cast("int")).as("last_fetch"))
    val lastmods = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(urlOf(col("doc_id")).as("url"),
        date_add(lit("2026-01-01").cast("date"),
          (pmod(col("doc_id"), lit(28)) + pmod(col("doc_id"), lit(5))
            - lit(2)).cast("int")).as("lastmod"))
    val (old, neu) = fixtureSnaps(docs)
    val rates = crawlDiffByHost(crawlDiff(old, neu))
    recrawlSchedule(state, lastmods, rates, asOfDay = "2026-02-05",
      churnPermille = 150, minIntervalDays = 7, maxAgeDays = 30)
  }

  private val q211 = GraftQuery(
    "q211_recrawl_schedule",
    (s, dir) => q211Sched(Tables.documents(s, dir)).orderBy(col("url")),
    Some(s"""
      WITH $diffCtes,
      rates AS (SELECT host,
                  CASE WHEN n_changed + n_unchanged > 0
                       THEN CAST(n_changed * 1000 // (n_changed + n_unchanged) AS BIGINT) END AS change_permille
                FROM g),
      state AS (SELECT
                  'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                  source || '.example.com' AS host,
                  DATE '2026-01-01' + CAST(doc_id % 28 AS INT) AS last_fetch,
                  doc_id
                FROM documents),
      lm AS (SELECT
               'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               DATE '2026-01-01' + CAST(doc_id % 28 + doc_id % 5 - 2 AS INT) AS lastmod
             FROM documents WHERE doc_id % 3 = 0),
      j AS (SELECT s.url, s.host, s.last_fetch,
              CAST(date_diff('day', s.last_fetch, DATE '2026-02-05') AS BIGINT) AS age_days,
              l.lastmod, r.change_permille
            FROM state s
            LEFT JOIN lm l ON s.url = l.url
            LEFT JOIN rates r ON s.host = r.host),
      v AS (SELECT *,
              CASE WHEN lastmod IS NOT NULL AND lastmod > last_fetch THEN 'lastmod'
                   WHEN COALESCE(change_permille, 0) >= 150 AND age_days >= 7 THEN 'churn'
                   WHEN age_days >= 30 THEN 'age'
              END AS reason
            FROM j)
      SELECT url, host, last_fetch, age_days, lastmod, change_permille,
             reason, reason IS NOT NULL AS due
      FROM v
      ORDER BY url"""))

  // --------------------------------------------------------------- q211b
  // Conditional-request metadata for the recrawl fetch (VERDICT r16
  // next #5): a polite crawler that decided a url is DUE should send
  // If-Modified-Since / If-None-Match so the server can answer 304 —
  // the validators come from the STORED response's Last-Modified/ETag
  // headers ([[Http.httpParse]] extracts them). Fixture: one stored
  // HTTP response per state url with the q188 validator rotation
  // (Last-Modified on %4=0, strong ETag on %2=0, weak on %9=0); the
  // schedule's due rows join the parsed metadata (url-keyed left join
  // — state-sized, never the corpus). The oracle replays the schedule
  // and states the expected validator values closed-form, so an
  // extraction bug OR a composition bug breaks the hash.
  private val q211b = GraftQuery(
    "q211b_recrawl_conditional",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val msgs = docs.select(urlOf(col("doc_id")).as("url"), concat(
        lit("HTTP/1.1 200 OK\r\n"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          lit("Last-Modified: Mon, 01 Sep 2025 00:00:00 GMT\r\n"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("ETag: \"s-"), col("doc_id").cast("string"),
            lit("\"\r\n")))
          .when(pmod(col("doc_id"), lit(9)) === 0,
            concat(lit("ETag: W/\"w-"), col("doc_id").cast("string"),
              lit("\"\r\n")))
          .otherwise(lit("")),
        lit("Content-Length: 0\r\n\r\n")).as("msg"))
      val meta = Http.httpParse(msgs, "url", "msg")
        .select(col("url"), col("last_modified"), col("etag"))
      q211Sched(docs).filter(col("due"))
        .join(meta, Seq("url"), "left")
        .select(col("url"), col("host"), col("reason"),
          col("last_modified"), col("etag"))
        .orderBy(col("url"))
    },
    Some(s"""
      WITH $diffCtes,
      rates AS (SELECT host,
                  CASE WHEN n_changed + n_unchanged > 0
                       THEN CAST(n_changed * 1000 // (n_changed + n_unchanged) AS BIGINT) END AS change_permille
                FROM g),
      state AS (SELECT
                  'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                  source || '.example.com' AS host,
                  DATE '2026-01-01' + CAST(doc_id % 28 AS INT) AS last_fetch,
                  doc_id
                FROM documents),
      lm AS (SELECT
               'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               DATE '2026-01-01' + CAST(doc_id % 28 + doc_id % 5 - 2 AS INT) AS lastmod
             FROM documents WHERE doc_id % 3 = 0),
      j AS (SELECT s.url, s.host, s.doc_id,
              CAST(date_diff('day', s.last_fetch, DATE '2026-02-05') AS BIGINT) AS age_days,
              l.lastmod, r.change_permille, s.last_fetch
            FROM state s
            LEFT JOIN lm l ON s.url = l.url
            LEFT JOIN rates r ON s.host = r.host),
      v AS (SELECT *,
              CASE WHEN lastmod IS NOT NULL AND lastmod > last_fetch THEN 'lastmod'
                   WHEN COALESCE(change_permille, 0) >= 150 AND age_days >= 7 THEN 'churn'
                   WHEN age_days >= 30 THEN 'age'
              END AS reason
            FROM j)
      SELECT url, host, reason,
             CASE WHEN doc_id % 4 = 0 THEN 'Mon, 01 Sep 2025 00:00:00 GMT' END AS last_modified,
             CASE WHEN doc_id % 2 = 0 THEN '"s-' || CAST(doc_id AS VARCHAR) || '"'
                  WHEN doc_id % 9 = 0 THEN 'W/"w-' || CAST(doc_id AS VARCHAR) || '"' END AS etag
      FROM v
      WHERE reason IS NOT NULL
      ORDER BY url"""))

  // ---------------------------------------------------------------- q216
  /** Revalidation merge (RFC 9110 §15.4.5 — what the crawl loop does
    * with the responses its conditional requests (q211b) produced):
    * fold a batch of fetch responses into the stored per-url state
    * `(url, content_md5, last_fetch, etag, last_modified)`:
    *   - `304 Not Modified`: the stored content is current — keep
    *     `content_md5`, refresh `last_fetch`, and take any validator
    *     the 304 carries (the RFC says it MAY update them), keeping
    *     the stored one otherwise;
    *   - `200`: replace content and BOTH validators verbatim (a 200
    *     without an ETag clears the stored ETag — reusing a stale
    *     validator against new content would poison revalidation);
    *   - anything else (4xx/5xx/NULL — the fetch failed): state
    *     unchanged; the outcome says so.
    * Emits the merged state + `outcome` ∈ revalidated | replaced |
    * failed (NULL for urls the batch never polled). ONE url-keyed
    * left join, responses batch-sized — the q215 fold class. */
  def revalidateMerge(state: DataFrame, responses: DataFrame): DataFrame = {
    // one response per url (code-review r17: duplicates would fan the
    // state row out with contradictory outcomes): latest fetch wins;
    // SAME-day ties break by success rank — 200 (fresh content) over
    // 304 (revalidation) over failures — then the deterministic
    // struct-order tie-break. ADVICE r17: a plain status-numeric tie
    // let a same-day 503 beat a successful 304/200, i.e. a failed
    // fetch overrode a successful revalidation — backwards.
    val rank = when(col("status") === 200, 2)
      .when(col("status") === 304, 1).otherwise(0)
    val r = responses
      .groupBy(col("url"))
      .agg(max(struct(col("fetch_day"), rank.as("__rank"), col("status"),
        col("content_md5"),
        col("etag"), col("last_modified"))).as("__m"))
      .select(col("url"), col("__m.status").as("__r_st"),
        col("__m.content_md5").as("__r_md5"), col("__m.etag").as("__r_etag"),
        col("__m.last_modified").as("__r_lm"),
        col("__m.fetch_day").as("__r_day"))
    val is304 = col("__r_st") === 304
    val is200 = col("__r_st") === 200
    state.join(r, Seq("url"), "left")
      .select(col("url"),
        when(is200, col("__r_md5")).otherwise(col("content_md5"))
          .as("content_md5"),
        when(is304 || is200, col("__r_day")).otherwise(col("last_fetch"))
          .as("last_fetch"),
        when(is200, col("__r_etag"))
          .when(is304, coalesce(col("__r_etag"), col("etag")))
          .otherwise(col("etag")).as("etag"),
        when(is200, col("__r_lm"))
          .when(is304, coalesce(col("__r_lm"), col("last_modified")))
          .otherwise(col("last_modified")).as("last_modified"),
        when(is304, lit("revalidated"))
          .when(is200, lit("replaced"))
          .when(col("__r_st").isNotNull || col("__r_day").isNotNull,
            lit("failed")).as("outcome"))
  }

  // Fixture: state over every doc url (md5(text), fetch-date rotation,
  // the q211b validator rotation); the polled subset (%3≠2) answers
  // with a %5 status rotation — 304 (one arm carrying an UPDATED etag,
  // one carrying none: both keep content, validator-take vs -keep),
  // 200 with v2 content + fresh validators (and %2≠0 rows WITHOUT an
  // etag: the must-clear law), and 503/429 failures that must change
  // nothing. The oracle restates the merge closed-form per rotation.
  private val q216 = GraftQuery(
    "q216_revalidate_merge",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val state = docs.select(urlOf(col("doc_id")).as("url"),
        md5(col("text")).as("content_md5"),
        date_add(lit("2026-01-01").cast("date"),
          pmod(col("doc_id"), lit(28)).cast("int")).as("last_fetch"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("\"s-"), col("doc_id").cast("string"), lit("\"")))
          .as("etag"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          lit("Mon, 01 Sep 2025 00:00:00 GMT")).as("last_modified"))
      val m5 = pmod(col("doc_id"), lit(5))
      val responses = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
        .select(urlOf(col("doc_id")).as("url"),
          when(m5.isin(0, 1), lit(304))
            .when(m5.isin(2, 3), lit(200))
            .otherwise(lit(503)).as("status"),
          when(m5.isin(2, 3), md5(concat(col("text"), lit("v2"))))
            .as("content_md5"),
          when(m5 === 0, concat(lit("\"r-"), col("doc_id").cast("string"),
              lit("\"")))
            .when(m5 === 2, concat(lit("\"n-"), col("doc_id").cast("string"),
              lit("\""))).as("etag"),
          when(m5 === 2, lit("Tue, 03 Feb 2026 00:00:00 GMT"))
            .as("last_modified"),
          lit("2026-02-06").cast("date").as("fetch_day"))
      revalidateMerge(state, responses).orderBy(col("url"))
    },
    Some("""
      WITH state AS (SELECT
          'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
          doc_id, md5(text) AS content_md5,
          DATE '2026-01-01' + CAST(doc_id % 28 AS INT) AS last_fetch,
          CASE WHEN doc_id % 2 = 0 THEN '"s-' || CAST(doc_id AS VARCHAR) || '"' END AS etag,
          CASE WHEN doc_id % 4 = 0 THEN 'Mon, 01 Sep 2025 00:00:00 GMT' END AS last_modified,
          text
        FROM documents),
      m AS (SELECT *,
          CASE WHEN doc_id % 3 = 2 THEN NULL
               WHEN doc_id % 5 IN (0, 1) THEN 304
               WHEN doc_id % 5 IN (2, 3) THEN 200
               ELSE 503 END AS st
        FROM state)
      SELECT url,
        CASE WHEN st = 200 THEN md5(text || 'v2') ELSE content_md5 END AS content_md5,
        CASE WHEN st IN (200, 304) THEN DATE '2026-02-06' ELSE last_fetch END AS last_fetch,
        CASE WHEN st = 200 THEN (CASE WHEN doc_id % 5 = 2 THEN '"n-' || CAST(doc_id AS VARCHAR) || '"' END)
             WHEN st = 304 THEN COALESCE(CASE WHEN doc_id % 5 = 0 THEN '"r-' || CAST(doc_id AS VARCHAR) || '"' END, etag)
             ELSE etag END AS etag,
        CASE WHEN st = 200 THEN (CASE WHEN doc_id % 5 = 2 THEN 'Tue, 03 Feb 2026 00:00:00 GMT' END)
             WHEN st = 304 THEN last_modified
             ELSE last_modified END AS last_modified,
        CASE WHEN st = 304 THEN 'revalidated'
             WHEN st = 200 THEN 'replaced'
             WHEN st IS NOT NULL THEN 'failed' END AS outcome
      FROM m
      ORDER BY url"""))

  // ---------------------------------------------------------------- q215
  // The incremental fold pinned against the ONE-SHOT oracle: the q200
  // fixture's new snapshot is split into three disjoint batches (url
  // hash mod 3 — the split itself is irrelevant to the oracle, which
  // never sees batches), folded into the old-snapshot state one batch
  // at a time, closed, and rolled up by host. The oracle is q200's
  // VERBATIM: chained-fold ≡ one-shot is the law being hashed.
  private val q215 = GraftQuery(
    "q215_snapshot_admit",
    (s, dir) => {
      val (old, neu) = fixtureSnaps(Tables.documents(s, dir))
      val batches = (0 until 3).map(i =>
        neu.filter(pmod(abs(hash(col("url"))), lit(3)) === i)
          .withColumn("fetch_day",
            lit(s"2026-02-0${i + 1}").cast("date")))
      val closed = snapshotClose(
        batches.foldLeft(snapshotInit(old))(snapshotAdmitBatch))
      crawlDiffByHost(closed).orderBy(col("host"))
    },
    Some(s"""
      WITH $diffCtes
      SELECT host,
             CAST(n_added AS BIGINT) AS n_added,
             CAST(n_removed AS BIGINT) AS n_removed,
             CAST(n_changed AS BIGINT) AS n_changed,
             CAST(n_unchanged AS BIGINT) AS n_unchanged,
             CASE WHEN n_changed + n_unchanged > 0
                  THEN CAST(n_changed * 1000 // (n_changed + n_unchanged) AS BIGINT) END AS change_permille
      FROM g
      ORDER BY host"""))

  // ---------------------------------------------------------------- q220
  // The crawl-epoch LOOP (VERDICT r17 next #5 — q215+q216+q217 states
  // advancing together per trigger through
  // [[graft.streaming.Streams.CrawlEpochLoop]]): three day-batches
  // (doc_id%3 — arithmetic, NOT hash, because backoff makes batch
  // membership OBSERVABLE and the oracle must replay it) of fetch
  // responses over the q216 initial state. Host-ordinal throttles:
  // k%4=1 hosts answer batch 0 entirely with `503 Retry-After: 90000`
  // (25 h → deferred in batch 1, free again in batch 2), k%4=2 hosts
  // answer batch 1 with `429 Retry-After: 200000` (55.5 h → deferred
  // in batch 2). Non-throttled rows rotate doc_id%4: 200-with-v2
  // (validator replace + lastmod CLEAR), bare 304, 304-with-new-etag,
  // and a plain 503 with NO Retry-After (fails the row, establishes
  // NO backoff). The oracle replays the whole loop closed-form: a
  // deferred or failed url keeps its stored state and closes
  // `removed` (never confirmed this epoch); 200s close `changed`,
  // 304s `unchanged`.
  private def q220Responses(docs: DataFrame): DataFrame = {
    val crlf = "\r\n"
    val k = expr("CAST(substring(source, 4) AS INT)")
    val hk = pmod(k, lit(4))
    val b = pmod(col("doc_id"), lit(3)).cast("int")
    // (doc_id // 4) % 4, NOT doc_id % 4: the corpus has four sources
    // keyed doc_id % 4, so a doc-level %4 arm would give every host
    // exactly ONE content behavior and the throttle rotation would
    // never cross a 200/304 arm (r18 fixture review)
    val m4 = pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(4))
    val id = col("doc_id").cast("string")
    val day = date_add(lit("2026-02-01").cast("date"), b)
    val fetchTs = to_timestamp(
      concat(day.cast("string"), lit(" 12:00:00")))
    val throttled = (hk === 1 && b === 0) || (hk === 2 && b === 1)
    val status = when(throttled && hk === 1, lit(503))
      .when(throttled, lit(429))
      .when(m4 === 0, lit(200)).when(m4.isin(1, 2), lit(304))
      .otherwise(lit(503))
    val ra = when(throttled && hk === 1, lit("Retry-After: 90000" + crlf))
      .when(throttled, lit("Retry-After: 200000" + crlf))
      .otherwise(lit(""))
    val msg = concat(
      when(status === 200, lit("HTTP/1.1 200 OK" + crlf))
        .when(status === 304, lit("HTTP/1.1 304 Not Modified" + crlf))
        .when(status === 429, lit("HTTP/1.1 429 Too Many Requests" + crlf))
        .otherwise(lit("HTTP/1.1 503 Service Unavailable" + crlf)),
      ra, lit("Content-Length: 0" + crlf + crlf))
    docs.select(urlOf(col("doc_id")).as("url"),
      concat(col("source"), lit(".example.com")).as("host"),
      b.as("b"), status.as("status"),
      when(!throttled && m4 === 0, md5(concat(col("text"), lit("v2"))))
        .as("content_md5"),
      when(!throttled && m4 === 0, concat(lit("\"e2-"), id, lit("\"")))
        .when(!throttled && m4 === 2, concat(lit("\"r-"), id, lit("\"")))
        .as("etag"),
      lit(null).cast("string").as("last_modified"),
      day.as("fetch_day"), msg.as("msg"), fetchTs.as("fetch_ts"))
  }

  private val q220 = GraftQuery(
    "q220_crawl_epoch_loop",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val init = docs.select(urlOf(col("doc_id")).as("url"),
        md5(col("text")).as("content_md5"),
        date_add(lit("2026-01-01").cast("date"),
          pmod(col("doc_id"), lit(28)).cast("int")).as("last_fetch"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("\"s-"), col("doc_id").cast("string"), lit("\"")))
          .as("etag"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          lit("Mon, 01 Sep 2025 00:00:00 GMT")).as("last_modified"))
      val responses = q220Responses(docs)
      val loop = new graft.streaming.Streams.CrawlEpochLoop(init)
      (0 until 3).foreach { j =>
        loop.step(responses.filter(col("b") === j).drop("b"),
          asOf = s"2026-02-0${j + 1} 12:00:00")
      }
      loop.close()
        .join(loop.validatorState, Seq("url"))
        .join(responses.select(col("url"), col("host")).distinct(),
          Seq("url"))
        .select(col("url"), col("host"), col("class"), col("content_md5"),
          col("last_fetch"), col("etag"), col("last_modified"))
        .orderBy(col("url"))
    },
    Some("""
      WITH base AS (SELECT doc_id, source, text,
          CAST(substring(source, 4) AS INT) AS k,
          CAST(doc_id % 3 AS INT) AS b,
          CAST((doc_id // 4) % 4 AS INT) AS m4,
          'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
          source || '.example.com' AS host
        FROM documents),
      cls AS (SELECT *,
          ((k % 4 = 1 AND b = 0) OR (k % 4 = 2 AND b = 1)) AS throttled,
          ((k % 4 = 1 AND b = 1) OR (k % 4 = 2 AND b = 2)) AS deferred
        FROM base),
      fin AS (SELECT *,
          CASE WHEN NOT throttled AND NOT deferred AND m4 = 0 THEN 'replaced'
               WHEN NOT throttled AND NOT deferred AND m4 IN (1, 2) THEN 'revalidated'
          END AS ok
        FROM cls)
      SELECT url, host,
        CASE WHEN ok = 'replaced' THEN 'changed'
             WHEN ok = 'revalidated' THEN 'unchanged'
             ELSE 'removed' END AS class,
        CASE WHEN ok = 'replaced' THEN md5(text || 'v2')
             ELSE md5(text) END AS content_md5,
        CASE WHEN ok IS NOT NULL THEN DATE '2026-02-01' + b
             ELSE DATE '2026-01-01' + CAST(doc_id % 28 AS INT) END AS last_fetch,
        CASE WHEN ok = 'replaced' THEN '"e2-' || CAST(doc_id AS VARCHAR) || '"'
             WHEN ok = 'revalidated' AND m4 = 2 THEN '"r-' || CAST(doc_id AS VARCHAR) || '"'
             WHEN doc_id % 2 = 0 THEN '"s-' || CAST(doc_id AS VARCHAR) || '"'
        END AS etag,
        CASE WHEN ok = 'replaced' THEN NULL
             WHEN doc_id % 4 = 0 THEN 'Mon, 01 Sep 2025 00:00:00 GMT'
        END AS last_modified
      FROM fin
      ORDER BY url"""))

  val all: Seq[GraftQuery] = Seq(q200, q211, q211b, q215, q216, q220)
}
