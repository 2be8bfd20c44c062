package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** URL/host canonicalization + URL- and host-level dedup — the one
  * standard CCNet/RefinedWeb crawl-hygiene stage the engine lacked
  * (VERDICT r12 next #7). RefinedWeb (Penedo et al. 2023 §3.1) and
  * CCNet (Wenzek et al. 2020) both dedup crawls by canonical URL before
  * any content pass: the same page arrives under `http`/`https`,
  * with/without `www.`, with default ports, fragments, tracking
  * params, and trailing slashes — textually distinct keys for one
  * resource. Canonicalization folds those; host extraction feeds the
  * q149 per-domain cap and the `v:`-encoded domain-key convention
  * ([[DataPrep.capAdmitBatch]]).
  *
  * Everything is native column arithmetic (regexp extract/replace +
  * array filter/sort — all codegen'd, zero UDFs), stateless per row:
  * the canonicalize pass is a pure scan projection, the URL dedup is
  * one hash-agg on the canonical key, the host profile one hash-agg on
  * the host — the wordcount shuffle class at any corpus size.
  *
  * Canonical form (documented, oracle-replayed):
  *   1. scheme lowercased; rows without a `scheme://` prefix
  *      canonicalize to NULL (refuse-visibly: callers filter or route
  *      them to quarantine; a silent pass-through would dedup garbage
  *      against garbage).
  *   2. host lowercased, one leading `www.` stripped, default port
  *      dropped (`:80` for http, `:443` for https) — any other
  *      explicit port is load-bearing and kept.
  *   3. fragment (`#…`) dropped.
  *   4. query: split on `&`, drop tracking params (`utm_*`, `fbclid`,
  *      `gclid`) and empties, SORT the rest (binary order — param
  *      order is transport noise), rejoin; empty result drops the `?`.
  *   5. path: one trailing `/` stripped (so `/a/` ≡ `/a`, root `/` ≡
  *      empty). Path CASE IS PRESERVED — paths are case-sensitive per
  *      RFC 3986; only scheme+host are case-insensitive.
  */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val TrackerRe = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  /** Canonical host of a URL: lowercased, one leading `www.` stripped,
    * port removed. NULL for scheme-less / NULL input. */
  def urlHost(url: Column): Column = {
    val rest = regexp_replace(url, SchemeRe, "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    when(regexp_extract(url, SchemeRe, 1) === "", lit(null))
      .otherwise(
        regexp_replace(regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", ""))
  }

  /** Host component of an ALREADY-CANONICAL URL. [[canonicalizeUrl]]
    * already lowercased the host, stripped one leading `www.` and
    * dropped default ports — so this must NOT re-strip `www.`: a raw
    * `www.www.a.com` canonicalizes to host `www.a.com`, and running
    * [[urlHost]] (which strips again) over the canonical form would
    * yield `a.com`, disagreeing with [[hostProfile]]'s `urlHost(raw)`
    * key that feeds the same `v:`-encoded per-host cap (ADVICE r13).
    * The two operators now provably share one host key: for any raw
    * host h, host-of-canonical(h) == urlHost(h). Non-default explicit
    * ports survive canonicalization and are still removed here. */
  private[operators] def hostOfCanonical(canonUrl: Column): Column =
    regexp_replace(
      regexp_extract(regexp_replace(canonUrl, SchemeRe, ""), "^([^/?#]*)", 1),
      ":[0-9]+$", "")

  /** Canonical PATH component of a URL (fragment dropped, one trailing
    * `/` folded, case preserved — the same path rules [[canonicalizeUrl]]
    * applies); NULL for scheme-less / NULL input. The key for
    * path-pattern gates ([[pathPrefixGate]]). */
  def urlPath(url: Column): Column = {
    val rest = regexp_replace(url, SchemeRe, "")
    val pqf = regexp_replace(regexp_replace(rest, "^[^/?#]*", ""), "#.*$", "")
    when(regexp_extract(url, SchemeRe, 1) === "", lit(null))
      .otherwise(regexp_replace(regexp_extract(pqf, "^([^?]*)", 1), "/$", ""))
  }

  /** Full canonical URL per the object scaladoc; NULL when the input
    * is NULL or has no `scheme://` prefix. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val rest = regexp_replace(url, SchemeRe, "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(regexp_replace(hostport, ":[0-9]+$", ""),
      "^www\\.", "")
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    // path/query/fragment = everything after hostport; fragment first
    val pqf = regexp_replace(regexp_replace(rest, "^[^/?#]*", ""), "#.*$", "")
    val path = regexp_replace(regexp_extract(pqf, "^([^?]*)", 1), "/$", "")
    val query = regexp_extract(pqf, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackerRe)))
    val queryPart = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), concat_ws("&", params)))
    when(scheme === "", lit(null))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** URL-level dedup: one surviving row per canonical URL (min `idCol`,
    * the keep-first convention) with the collapse count. Scheme-less /
    * NULL URLs are EXCLUDED (their canonical key is NULL; folding all
    * of them into one "null URL" cluster would mass-delete unrelated
    * docs — route them to quarantine instead). A single groupBy/agg on
    * the canonical key (keep-first via `min(id)`, collapse count in
    * the same pass) plus a stateless host projection of the group key;
    * no joins, no windows, no sort. */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .filter(col("canonical_url").isNotNull)
    canon
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .withColumn("host", hostOfCanonical(col("canonical_url")))
      .select(col(idCol), col("canonical_url"), col("host"), col("n_dups"))
  }

  /** Host-level profile + representative: per canonical host, the doc
    * count, distinct-canonical-URL count, total chars, the minimum doc
    * id (the host-level dedup representative), and the host's
    * [[DataPrep.capAdmitBatch]]-compatible `v:`-encoded key — this
    * frame IS the input to a q149-style per-host cap or a host-block
    * list join. One hash-agg (count-distinct goes through the standard
    * two-phase partial agg); scheme-less URLs excluded as in
    * [[urlDedup]]. */
  def hostProfile(docs: DataFrame, urlCol: String, idCol: String,
      charsCol: String): DataFrame =
    docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .filter(col("canonical_url").isNotNull)
      .withColumn("host", urlHost(col(urlCol)))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_urls"),
        sum(col(charsCol)).as("total_chars"),
        min(col(idCol)).as("rep_doc_id"))
      .withColumn("host_key", concat(lit("v:"), col("host")))
      .select(col("host"), col("host_key"), col("n_docs"), col("n_urls"),
        col("total_chars"), col("rep_doc_id"))

  /** Shared rule-table column guards ([[validatedList]] and
    * [[pathPrefixGate]] — one validation surface, no drift). */
  private def encodedKeyOrRaise(c: Column, what: String): Column =
    when(c.isNull || !c.startsWith("v:"),
      // coalesce: a NULL key must keep the diagnostic — concat(NULL)
      // is NULL and raise_error(NULL) loses the message (ADVICE r14)
      raise_error(concat(lit(s"$what key '"), coalesce(c, lit("NULL")),
        lit("' is not domainKey-encoded ('v:'+host) — build keys as " +
          "'v:' || host (hostProfile.host_key), never raw hosts"))))
      .otherwise(c)

  private def nonNullOrRaise(c: Column, msg: String): Column =
    when(c.isNull, raise_error(lit(msg))).otherwise(c)

  /** Validate + fold a stored host block/allow list: keys must carry
    * the [[DataPrep.capAdmitBatch]] `v:` encoding (hostnames cannot
    * contain ':' — RFC 1123 — so no raw host can slip past; same guard
    * discipline as the consumed-state maps), rules must be non-NULL
    * (an unattributable drop is a ledger hole), and duplicate host_key
    * rows fold to `min(rule)` so a doc can never fan out through the
    * gate join. */
  private def validatedList(list: DataFrame, what: String): DataFrame = {
    require(Seq("host_key", "rule").forall(list.columns.contains),
      s"$what needs (host_key, rule) columns, got " +
        list.columns.mkString("(", ", ", ")"))
    list.select(
        encodedKeyOrRaise(col("host_key"), what).as("host_key"),
        nonNullOrRaise(col("rule"),
          s"$what: NULL rule — every listed host needs an attributable " +
            "rule for the drop ledger").as("rule"))
      .groupBy(col("host_key")).agg(min(col("rule")).as("rule"))
  }

  /** Host blocklist gate — the standard crawl-hygiene companion to
    * [[hostProfile]] (VERDICT r13 next #6): keep docs whose canonical
    * host is NOT on a stored blocklist `(host_key, rule)` keyed by the
    * `v:`-encoded host. Scheme-less docs (NULL host) are dropped too —
    * quarantine, not pass-through (an ungateable row must not slip a
    * host policy). The blocklist is a stored policy artifact (thousands
    * to low millions of hosts — KBs to ~100 MB): broadcast left-anti
    * join, so the corpus NEVER shuffles; survivors keep every input
    * column plus `host`/`host_key`. */
  def hostGate(docs: DataFrame, urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = validatedList(blocklist, "hostGate blocklist")
    docs
      .withColumn("host", urlHost(col(urlCol)))
      .filter(col("host").isNotNull)
      .withColumn("host_key", concat(lit("v:"), col("host")))
      .join(broadcast(bl.select(col("host_key"))), Seq("host_key"),
        "left_anti")
  }

  /** Allowlist twin of [[hostGate]]: keep ONLY docs whose host is on
    * the stored list (broadcast left-semi join — same never-shuffle
    * shape). Scheme-less docs cannot match and are dropped. */
  def hostAllowGate(docs: DataFrame, urlCol: String,
      allowlist: DataFrame): DataFrame = {
    val al = validatedList(allowlist, "hostAllowGate allowlist")
    docs
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("host_key", concat(lit("v:"), col("host")))
      .join(broadcast(al.select(col("host_key"))), Seq("host_key"),
        "left_semi")
  }

  /** Per-rule drop accounting for [[hostGate]], riding the q134
    * cascade ledger verbatim ([[DataPrep.cascadeAccounting]]): stage 0
    * is the scheme-less quarantine, then one stage per distinct rule in
    * lexicographic order with first-fail attribution (disjoint by
    * construction — a host folds to one rule). Rules are a bounded
    * policy enum: ≤ 15 here (+ quarantine = cascadeAccounting's 16-
    * stage cap); the distinct-rules read is O(rules) on the driver. */
  def hostGateLedger(docs: DataFrame, urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = validatedList(blocklist, "hostGate blocklist")
    val rules = bl.select(col("rule")).distinct().sort(col("rule"))
      .limit(17).collect().map(_.getString(0))
    require(rules.nonEmpty && rules.length <= 15,
      s"1..15 distinct blocklist rules (ledger stages), got ${rules.length}")
    val joined = docs
      .withColumn("__host", urlHost(col(urlCol)))
      .join(broadcast(bl),
        concat(lit("v:"), col("__host")) === bl("host_key"), "left")
    DataPrep.cascadeAccounting(joined,
      ("schemeless_quarantine" -> col("__host").isNotNull) +:
        rules.toSeq.map(r => r -> !(col("rule") <=> lit(r))))
  }

  /** Path-prefix blocklist gate — the URL-PATTERN refinement of
    * [[hostGate]] that real crawl filters need (blocking every path
    * under `bad.com/ads` without losing all of `bad.com`): stored rules
    * `(host_key,
    * path_prefix, rule)`, a doc drops iff its `v:`-host matches a rule
    * AND its canonical path starts with that rule's prefix. Multiple
    * prefixes per host are legitimate and NOT folded (an anti join
    * cannot duplicate survivors). An empty prefix blocks the whole host
    * (`startsWith("")` is true — pinned in the spec). Plan: stateless
    * host+path projection into a broadcast LeftAnti hash join on the
    * host key with the prefix test as the join condition — the corpus
    * never shuffles; scheme-less docs quarantined as in [[hostGate]]. */
  def pathPrefixGate(docs: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    require(Seq("host_key", "path_prefix", "rule")
        .forall(rules.columns.contains),
      s"path rules need (host_key, path_prefix, rule), got " +
        rules.columns.mkString("(", ", ", ")"))
    val r = rules.select(
      encodedKeyOrRaise(col("host_key"), "pathPrefixGate rule").as("__rk"),
      nonNullOrRaise(col("path_prefix"),
        "pathPrefixGate: NULL path_prefix — use '' to block a whole " +
          "host explicitly").as("__rp"),
      nonNullOrRaise(col("rule"),
        "pathPrefixGate: NULL rule — every rule needs an attributable " +
          "name").as("__rr"))
    docs
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("path", urlPath(col(urlCol)))
      .filter(col("host").isNotNull)
      .withColumn("host_key", concat(lit("v:"), col("host")))
      .join(broadcast(r.select(col("__rk"), col("__rp"))),
        col("host_key") === col("__rk") && col("path").startsWith(col("__rp")),
        "left_anti")
  }

  // ---------------------------------------------------------------- q167
  // Declared crawl-hygiene query over deterministic messy URLs derived
  // from (doc_id, source) — the planted-fixture convention: five URL
  // shapes exercise every canonicalization rule (case, www, default +
  // non-default ports, fragments, tracking params, param order,
  // trailing slash), and shapes 0/1 collide by construction so the
  // dedup path is exercised, not just replayed.
  private def messyUrl(): Column = {
    val n = expr("doc_id div 7").cast("string")
    val m = pmod(col("doc_id"), lit(5))
    when(m === 0, concat(lit("HTTPS://WWW."), col("source"),
        lit(".Example.COM:443/p/"), n, lit("/?utm_source=x&b=2&a=1#frag")))
      .when(m === 1, concat(lit("https://"), col("source"),
        lit(".example.com/p/"), n, lit("?a=1&b=2")))
      .when(m === 2, concat(lit("http://"), col("source"),
        lit(".example.com:8080/p/"), n))
      .when(m === 3, concat(lit("http://www."), col("source"),
        lit(".example.com:80/p/"), n, lit("?fbclid=zz")))
      .otherwise(concat(lit("https://"), upper(col("source")),
        lit(".example.com/p/"), n, lit("/")))
  }

  private val urlSqlCase = """
      CASE doc_id % 5
        WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/p/' || CAST(doc_id // 7 AS VARCHAR) || '/?utm_source=x&b=2&a=1#frag'
        WHEN 1 THEN 'https://' || source || '.example.com/p/' || CAST(doc_id // 7 AS VARCHAR) || '?a=1&b=2'
        WHEN 2 THEN 'http://' || source || '.example.com:8080/p/' || CAST(doc_id // 7 AS VARCHAR)
        WHEN 3 THEN 'http://www.' || source || '.example.com:80/p/' || CAST(doc_id // 7 AS VARCHAR) || '?fbclid=zz'
        ELSE 'https://' || upper(source) || '.example.com/p/' || CAST(doc_id // 7 AS VARCHAR) || '/'
      END"""

  // DuckDB regexp_replace is first-match-only without the 'g' flag —
  // every pattern below is anchored, so first == only. list_sort is
  // binary order, matching Spark array_sort on ASCII params.
  /** [[canonicalizeUrl]] replayed as DuckDB CTEs over a caller-supplied
    * CTE `src` providing a `url` column plus `keep` columns; ends in
    * CTE `canon` with `(keep…, host, canonical_url)`. ONE home for the
    * replay — q167/q168 here and the canonical-link dedup (q190) share
    * it verbatim. Claims the CTE names parts/hp/hx/qy/canon. */
  private[operators] def canonicalizeSqlFrom(src: String,
      keep: Seq[String]): String = {
    val kk = keep.map(_ + ", ").mkString
    s"""
      parts AS (SELECT $kk url,
                       lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                       regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
                FROM $src),
      hp AS (SELECT *, lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS hostport,
                    regexp_replace(regexp_replace(rest, '^[^/?#]*', ''), '#.*$$', '') AS pqf
             FROM parts),
      hx AS (SELECT *,
                    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
                    regexp_replace(regexp_replace(hostport, ':[0-9]+$$', ''), '^www\\.', '') AS host,
                    regexp_replace(regexp_extract(pqf, '^([^?]*)', 1), '/$$', '') AS path,
                    regexp_extract(pqf, '\\?(.*)$$', 1) AS query
             FROM hp),
      qy AS (SELECT *,
                    -- DuckDB 1.0 array_to_string over an EMPTY list is
                    -- NULL, not '' — without the COALESCE every
                    -- no-surviving-params URL canonicalizes to NULL
                    COALESCE(array_to_string(list_sort(list_filter(string_split(query, '&'),
                      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)(=.*)?$$'))), '&'), '') AS q2
             FROM hx),
      canon AS (SELECT $kk host,
                       CASE WHEN scheme = '' THEN NULL ELSE
                         scheme || '://' || host ||
                         CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                                   OR (scheme = 'https' AND port = '443')
                              THEN '' ELSE ':' || port END ||
                         path ||
                         CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END
                       END AS canonical_url
                FROM qy)"""
  }

  private val canonSql =
    s"""u AS (SELECT doc_id, source, n_chars, $urlSqlCase AS url FROM documents),""" +
      canonicalizeSqlFrom("u", Seq("doc_id", "source", "n_chars"))

  private val q167 = GraftQuery(
    "q167_url_dedup",
    (s, dir) => urlDedup(
        Tables.documents(s, dir).withColumn("url", messyUrl()),
        "url", "doc_id")
      .orderBy(col("doc_id")),
    Some(s"""
      WITH $canonSql
      SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, canonical_url,
             -- host of the CANONICAL url: no www re-strip (canonicalize
             -- already stripped one) so the key matches q168's urlHost(raw)
             regexp_replace(regexp_extract(regexp_replace(canonical_url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1), ':[0-9]+$$', '') AS host,
             CAST(COUNT(*) AS BIGINT) AS n_dups
      FROM canon
      WHERE canonical_url IS NOT NULL
      GROUP BY canonical_url
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q168
  private val hostProfileOracle = s"""
      WITH $canonSql
      SELECT host, 'v:' || host AS host_key,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_urls,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
      FROM canon
      WHERE canonical_url IS NOT NULL
      GROUP BY host
      ORDER BY host"""

  private val q168 = GraftQuery(
    "q168_host_profile",
    (s, dir) => hostProfile(
        Tables.documents(s, dir).withColumn("url", messyUrl()),
        "url", "doc_id", "n_chars")
      .orderBy(col("host")),
    Some(hostProfileOracle))

  // ---------------------------------------------------------------- q168b
  // Stored-shard fold law for the host profile: profile folded from TWO
  // disjoint URL-level shards (even/odd doc_id halves) must equal the
  // one-shot q168 — so q168b shares q168's oracle verbatim. The spec
  // additionally pins the parquet round-trip.
  private val q168b = GraftQuery(
    "q168b_host_profile_fold",
    (s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("url", messyUrl())
      val a = hostProfileShard(docs.filter(col("doc_id") % 2 === 0),
        "url", "doc_id", "n_chars")
      val b = hostProfileShard(docs.filter(col("doc_id") % 2 =!= 0),
        "url", "doc_id", "n_chars")
      hostProfileFromShards(a.unionByName(b)).orderBy(col("host"))
    },
    Some(hostProfileOracle))

  /** Additive per-batch artifact for [[hostProfile]] — the stored-shard
    * fold the incremental-crawl path needs (the q169b/`bm25StatsMerge`
    * discipline). The artifact is URL-level, one row per (host,
    * canonical_url): host-level `n_urls` is a COUNT(DISTINCT) and not
    * additive, but URL-level (n_docs, chars, min id) triples are — fold
    * shards by summing, then roll up to hosts. Shard size is
    * distinct-URLs-per-batch (corpus-class, persisted as parquet, folded
    * distributed — never collected). */
  def hostProfileShard(docs: DataFrame, urlCol: String, idCol: String,
      charsCol: String): DataFrame =
    docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .filter(col("canonical_url").isNotNull)
      .withColumn("host", urlHost(col(urlCol)))
      .groupBy(col("host"), col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol).cast("long")).as("total_chars"),
        min(col(idCol)).as("rep_doc_id"))

  /** Fold stored [[hostProfileShard]]s into the [[hostProfile]] frame:
    * `fromShards(shard(b1) ∪ shard(b2)) ≡ hostProfile(b1 ∪ b2)` exactly
    * (integer sums and mins in any order — pinned by q168b sharing
    * q168's oracle verbatim). Two hash-aggs: URL-level refold, then the
    * host rollup where `n_urls` is a plain count of the now-unique URL
    * rows. */
  def hostProfileFromShards(shards: DataFrame): DataFrame =
    shards
      .groupBy(col("host"), col("canonical_url"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"),
        min(col("rep_doc_id")).as("rep_doc_id"))
      .groupBy(col("host"))
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_urls"),
        sum(col("total_chars")).as("total_chars"),
        min(col("rep_doc_id")).as("rep_doc_id"))
      .withColumn("host_key", concat(lit("v:"), col("host")))
      .select(col("host"), col("host_key"), col("n_docs"), col("n_urls"),
        col("total_chars"), col("rep_doc_id"))

  // ----------------------------------------------------------- q170/q170b
  // Host-gate fixtures: the q167 messy URLs plus a planted scheme-less
  // shape every 97th doc (exercises the quarantine stage — the messy
  // fixture alone is always schemed), gated by a 4-host / 2-rule
  // literal blocklist over the fixture's {source}.example.com hosts.
  private def gateUrl(): Column =
    when(pmod(col("doc_id"), lit(97)) === 0,
      concat(lit("relative/path/"), col("doc_id").cast("string")))
      .otherwise(messyUrl())

  private val gateUrlSql = s"""
      CASE WHEN doc_id % 97 = 0
           THEN 'relative/path/' || CAST(doc_id AS VARCHAR)
           ELSE $urlSqlCase END"""

  private val blockRows = Seq(
    "v:src1.example.com" -> "spam", "v:src7.example.com" -> "spam",
    "v:src2.example.com" -> "adult", "v:src12.example.com" -> "adult")

  private val blockSqlValues = blockRows
    .map { case (k, r) => s"('$k', '$r')" }.mkString(", ")

  // raw-url host (urlHost semantics: lower, strip one www., strip port;
  // NULL when scheme-less) — replayed for both gate oracles
  private val gateHostSql = s"""
      u AS (SELECT doc_id, $gateUrlSql AS url FROM documents),
      h AS (SELECT doc_id,
                   CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN NULL
                        ELSE regexp_replace(regexp_replace(lower(regexp_extract(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1)), ':[0-9]+$$', ''), '^www\\.', '')
                   END AS host
            FROM u),
      bl AS (SELECT host_key, MIN(rule) AS rule
             FROM (VALUES $blockSqlValues) AS v(host_key, rule)
             GROUP BY host_key)"""

  private val q170 = GraftQuery(
    "q170_host_gate",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).withColumn("url", gateUrl())
      hostGate(docs, "url", blockRows.toDF("host_key", "rule"))
        .select(col("doc_id"), col("host"), col("host_key"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $gateHostSql
      SELECT doc_id, host, 'v:' || host AS host_key
      FROM h
      WHERE host IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM bl WHERE bl.host_key = 'v:' || h.host)
      ORDER BY doc_id"""))

  private val q170b = GraftQuery(
    "q170b_host_gate_ledger",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).withColumn("url", gateUrl())
      hostGateLedger(docs, "url", blockRows.toDF("host_key", "rule"))
    },
    Some(s"""
      WITH $gateHostSql,
      j AS (SELECT h.doc_id, h.host, b.rule
            FROM h LEFT JOIN bl b ON b.host_key = 'v:' || h.host),
      c AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                   CAST(SUM(CASE WHEN host IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d0,
                   CAST(SUM(CASE WHEN host IS NOT NULL AND rule = 'adult' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                   CAST(SUM(CASE WHEN host IS NOT NULL AND rule = 'spam' THEN 1 ELSE 0 END) AS BIGINT) AS d2
            FROM j)
      SELECT 0 AS stage, 'schemeless_quarantine' AS name, total AS n_in,
             d0 AS n_drop, total - d0 AS n_out FROM c
      UNION ALL
      SELECT 1, 'adult', total - d0, d1, total - d0 - d1 FROM c
      UNION ALL
      SELECT 2, 'spam', total - d0 - d1, d2, total - d0 - d1 - d2 FROM c
      ORDER BY stage"""))

  // ---------------------------------------------------------------- q174
  // Path-prefix gate on the q170 fixture URLs: two prefixes on one host
  // (src3: /p/1* and /p/4*), an empty prefix blocking a whole host
  // (src5), and the scheme-less quarantine all exercised together.
  private val pathRuleRows = Seq(
    ("v:src3.example.com", "/p/1", "ads"),
    ("v:src3.example.com", "/p/4", "ads"),
    ("v:src5.example.com", "", "blocked_host"))

  private val q174 = GraftQuery(
    "q174_path_prefix_gate",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).withColumn("url", gateUrl())
      pathPrefixGate(docs, "url",
          pathRuleRows.toDF("host_key", "path_prefix", "rule"))
        .select(col("doc_id"), col("host"), col("path"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH u AS (SELECT doc_id, $gateUrlSql AS url FROM documents),
      h AS (SELECT doc_id,
                   CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN NULL
                        ELSE regexp_replace(regexp_replace(lower(regexp_extract(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1)), ':[0-9]+$$', ''), '^www\\.', '')
                   END AS host,
                   CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN NULL
                        ELSE regexp_replace(regexp_extract(regexp_replace(regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/?#]*', ''), '#.*$$', ''), '^([^?]*)', 1), '/$$', '')
                   END AS path
            FROM u),
      rules AS (SELECT * FROM (VALUES ${pathRuleRows.map { case (k, p, r) =>
        s"('$k', '$p', '$r')" }.mkString(", ")}) AS v(host_key, path_prefix, rule))
      SELECT doc_id, host, path
      FROM h
      WHERE host IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM rules r
                        WHERE r.host_key = 'v:' || h.host
                          AND starts_with(h.path, r.path_prefix))
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q167, q168, q168b, q170, q170b, q174)
}
