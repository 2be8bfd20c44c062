package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** robots.txt parsing + the RFC 9309 crawl-permission gate — the
  * STANDARDS-based member of the crawl-hygiene family (q170 host gate
  * and q174 path gate enforce in-house policy; this one enforces the
  * site's own policy, which every polite production crawler must).
  *
  * [[robotsRules]] parses robots.txt bodies (one row per host) into
  * `(host, agent, rule, path_prefix)`:
  *   - comments (`#` to end of line) stripped, lines trimmed; blank and
  *     junk lines ignored entirely (RFC 9309 §2.2 — unrecognized lines
  *     are skipped and do NOT break groups);
  *   - a GROUP is a maximal run of consecutive `User-agent:` lines (all
  *     sharing the following rules — the multi-agent group form)
  *     followed by its `Allow:`/`Disallow:` lines; detected as
  *     gaps-and-islands over the retained lines (new group = UA line
  *     whose previous retained line is not UA), all window functions
  *     over KB-sized per-host frames;
  *   - EMPTY-value directives (`Disallow:` with no path) match nothing
  *     per the RFC and are dropped at parse; directives before any
  *     group are orphans and dropped;
  *   - a group with ZERO directives still emits ONE row with NULL
  *     rule/prefix: per §2.2.1 an empty group is an allow-everything
  *     STATEMENT for its agent, and the gate's group selection must
  *     see it (it shields the agent from the `*` group; code-review
  *     r15) — dropping it would flip the verdict for every path.
  *
  * [[robotsAudit]]/[[robotsGate]] evaluate a crawl batch for one agent
  * per RFC 9309 §2.2.1/§2.2.3/§5.2:
  *   - group selection: if the host has A GROUP for the specific agent
  *     (exact product-token match, lowercased — substring matching is
  *     a deliberate non-goal, documented), ONLY its rules apply — even
  *     when the group is empty; else the `*` group; a host with no
  *     robots rules at all allows everything;
  *   - path: the RAW request path (uncanonicalized — the RFC compares
  *     octets; the site root is `/`, and trailing slashes are
  *     significant), query/fragment dropped;
  *   - rule matching: `*` in a rule matches any character sequence and
  *     a trailing `$` anchors the end (§2.2.3 — both MUST-support);
  *     wildcard rules compile to anchored RE2/Java regexes at
  *     rules-prep time (metachars escaped), literal rules stay a
  *     startsWith; the match with the LONGEST PATTERN wins, ties break
  *     to ALLOW (least-restrictive, §5.2); no match ⇒ allowed;
  *   - scheme-less docs (NULL host) are quarantined like [[UrlOps.hostGate]].
  *
  * Scale shape: parsing is per-host windows over KB frames; the gate
  * aggregates each host's applicable rules into ONE array row
  * (broadcast — robots tables are KBs per host, bounded hosts), and
  * the corpus-side verdict is a codegen `filter`/`transform`/
  * `array_max` over that array: the corpus NEVER shuffles, exactly the
  * q170/q174 never-shuffle class. Longest-match tie-break is
  * structural: `array_max` over `struct(pattern_len, is_allow)` — for
  * equal lengths `true > false`, so allow wins without a second pass.
  */
object Robots {

  /** Parse robots.txt bodies into `(host, agent, rule, path_prefix)`. */
  def robotsRules(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("i", "l")))
      .select(col("host"), col("i"),
        trim(regexp_replace(col("l"), "#.*", "")).as("line"))
    val cls = lines.select(col("host"), col("i"),
        col("line").rlike("(?i)^user-agent:").as("is_ua"),
        lower(regexp_extract(col("line"), "(?i)^(allow|disallow):", 1))
          .as("kind"),
        lower(trim(regexp_extract(col("line"),
          "(?i)^user-agent:[ \\t]*(.*)", 1))).as("ua_val"),
        trim(regexp_extract(col("line"),
          "(?i)^(allow|disallow):[ \\t]*(.*)", 2)).as("dir_val"))
      // retained lines only: UA lines, and directives with a non-empty
      // value (empty = matches nothing per RFC -> dropped at parse)
      .filter(col("is_ua") ||
        (col("kind").isin("allow", "disallow") && col("dir_val") =!= ""))
    val w = Window.partitionBy(col("host")).orderBy(col("i"))
    val g = cls
      .withColumn("ng", (col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(w), lit(false))).cast("int"))
      .withColumn("gid", sum(col("ng"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val agents = g.filter(col("is_ua"))
      .select(col("host"), col("gid"), col("ua_val").as("agent"))
    val dirs = g.filter(!col("is_ua") && col("gid") > 0)
      .select(col("host"), col("gid"), col("kind").as("rule"),
        col("dir_val").as("path_prefix"))
    // LEFT join: an empty group survives as one NULL-rule row (the
    // §2.2.1 allow-everything statement — see scaladoc)
    agents.join(dirs, Seq("host", "gid"), "left")
      .select(col("host"), col("agent"), col("rule"), col("path_prefix"))
  }

  /** `Sitemap:` directive extraction (RFC 9309 §2.2.4 "other records",
    * sitemaps.org cross-link convention) — the robots→sitemap
    * discovery bridge: sitemap lines live OUTSIDE user-agent groups
    * (group-independent by spec), comments strip per line, the value
    * must be an ABSOLUTE http(s) URL (the sitemaps.org requirement —
    * relative values are noise and drop). SHUFFLE-FREE (ADVICE r16:
    * the previous row_number window added an exchange the scaladoc
    * denied): the kept values are assembled per body with
    * `transform`/`filter` array ops and ONE posexplode mints
    * `entry_no` as the offset among the host's kept sitemap lines —
    * a stateless scan at any corpus size. */
  def robotsSitemaps(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val vals = transform(split(col(bodyCol), "\n"),
      l => trim(regexp_extract(trim(regexp_replace(l, "#.*", "")),
        "(?i)^sitemap:[ \\t]*(.*)", 1)))
    val kept = filter(vals, u => u.rlike("(?i)^https?://"))
    robots.select(col(hostCol).as("host"),
        posexplode(kept).as(Seq("entry_no", "sitemap_url")))
      .select(col("host"), col("entry_no").cast("int").as("entry_no"),
        col("sitemap_url"))
  }

  /** `Crawl-delay:` extraction (the de-facto politeness directive —
    * RFC 9309 §2.2.4 "other records"; Bing/Yandex honor it) —
    * per-group like allow/disallow: emits `(host, agent, crawl_delay)`
    * with the MIN delay per group (the conservative read of a
    * multi-delay group), seconds as DOUBLE (Yandex allows decimals;
    * junk values refuse at parse, the q193 priority stance).
    *
    * Grouping is defined ONCE, by the RFC grammar over UA/rule lines
    * (§2.2.4: other records MUST NOT interfere with explicit-record
    * parsing — so a Crawl-delay between two UA lines does not split
    * their group, exactly as [[robotsRules]] sees it); each delay line
    * then attaches to the group current at its position. The skip-over
    * is a `last_value(… IGNORE NULLS)` over the per-host KB frame —
    * same window class as the rules parse. */
  def robotsDelays(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("i", "l")))
      .select(col("host"), col("i"),
        trim(regexp_replace(col("l"), "#.*", "")).as("line"))
    val cls = lines.select(col("host"), col("i"),
        col("line").rlike("(?i)^user-agent:").as("is_ua"),
        lower(regexp_extract(col("line"), "(?i)^(allow|disallow):", 1))
          .as("kind"),
        lower(trim(regexp_extract(col("line"),
          "(?i)^user-agent:[ \\t]*(.*)", 1))).as("ua_val"),
        trim(regexp_extract(col("line"),
          "(?i)^(allow|disallow):[ \\t]*(.*)", 2)).as("dir_val"),
        trim(regexp_extract(col("line"),
          "(?i)^crawl-delay:[ \\t]*(.*)", 1)).as("cd_val"))
      .withColumn("is_cd",
        col("cd_val").rlike("^[0-9]{1,6}(\\.[0-9]{1,3})?$"))
      // grouping lines (the robotsRules retained set) + valid delay lines
      .filter(col("is_ua") ||
        (col("kind").isin("allow", "disallow") && col("dir_val") =!= "") ||
        col("is_cd"))
      .withColumn("is_grp", col("is_ua") ||
        (col("kind").isin("allow", "disallow") && col("dir_val") =!= ""))
    val w = Window.partitionBy(col("host")).orderBy(col("i"))
    val prevGrpIsUa = last(
      when(col("is_grp"), col("is_ua")), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val g = cls
      .withColumn("ng", (col("is_ua") &&
        !coalesce(prevGrpIsUa, lit(false))).cast("int"))
      .withColumn("gid", sum(col("ng"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val agents = g.filter(col("is_ua"))
      .select(col("host"), col("gid"), col("ua_val").as("agent"))
    val delays = g.filter(col("is_cd") && !col("is_grp") && col("gid") > 0)
      .groupBy(col("host"), col("gid"))
      .agg(min(col("cd_val").cast("double")).as("crawl_delay"))
    // LEFT join: a delay-less group survives as a NULL-delay row — the
    // robotsRules empty-group convention; group selection must SEE a
    // specific group to shield its agent from the `*` delay (§2.2.1)
    agents.join(delays, Seq("host", "gid"), "left")
      .select(col("host"), col("agent"), col("crawl_delay"))
  }

  /** Group selection over [[robotsDelays]] output for one crawler
    * (§2.2.1 discipline, same as the gate): if the host has a group
    * for the specific agent — even a DELAY-LESS one (NULL-delay row;
    * it shields the agent from the `*` delay exactly as an empty group
    * shields it from `*` rules) — only that group's delay applies;
    * else the `*` delay; min across a host's chosen rows. Emits
    * `(host, crawl_delay)` — hosts with no applicable delay are absent
    * (consumers default to unthrottled). */
  def crawlDelayFor(delays: DataFrame, agent: String): DataFrame = {
    require(agent.nonEmpty && agent != "*",
      "pass the crawler's own product token, not '*'")
    val a = lit(agent.toLowerCase(java.util.Locale.ROOT))
    val specific = delays.filter(col("agent") === a)
      .select(col("host")).distinct().withColumn("__sp", lit(true))
    delays.filter(col("agent") === a || col("agent") === "*")
      .join(specific, Seq("host"), "left")
      .filter(col("agent") === a || col("__sp").isNull)
      .groupBy(col("host"))
      .agg(min(col("crawl_delay")).as("crawl_delay"))
      .filter(col("crawl_delay").isNotNull)
  }

  // ---------------------------------------------------------------- q201
  // Fixture: per-host robots bodies mixing groups, comments, and
  // Sitemap lines in every position the spec allows — before any
  // group, between groups, inside a group's line range (still
  // group-independent), with a trailing comment, a relative value
  // (dropped), and a case-mixed field name.
  private def sitemapBody(): Column = {
    val k = pmod(expr("CAST(substring(source, 4) AS INT)"), lit(3))
    when(k === 0, concat(
      lit("Sitemap: https://"), col("source"),
      lit(".example.com/sitemap.xml\nUser-agent: *\nDisallow: /tmp\n" +
        "SITEMAP: https://"), col("source"),
      lit(".example.com/sitemap2.xml # index\n")))
      .when(k === 1, concat(
        lit("User-agent: *\nDisallow: /a\n\nsitemap: https://cdn."),
        col("source"), lit(".example.com/s.xml\nSitemap: /relative.xml\n")))
      .otherwise(lit("User-agent: *\nDisallow: /\n# no sitemaps here\n"))
  }

  private val q201 = GraftQuery(
    "q201_robots_sitemaps",
    (s, dir) => {
      val robots = Tables.documents(s, dir).select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("host"),
          sitemapBody().as("body"))
      robotsSitemaps(robots, "host", "body")
        .orderBy(col("host"), col("entry_no"))
    },
    Some("""
      WITH hosts AS (SELECT DISTINCT source,
                            source || '.example.com' AS host FROM documents),
      bodies AS (SELECT host,
               CASE CAST(CAST(substring(source, 4) AS INT) % 3 AS INT)
                 WHEN 0 THEN 'Sitemap: https://' || source || '.example.com/sitemap.xml' || chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /tmp' || chr(10) || 'SITEMAP: https://' || source || '.example.com/sitemap2.xml # index' || chr(10)
                 WHEN 1 THEN 'User-agent: *' || chr(10) || 'Disallow: /a' || chr(10) || chr(10) || 'sitemap: https://cdn.' || source || '.example.com/s.xml' || chr(10) || 'Sitemap: /relative.xml' || chr(10)
                 ELSE 'User-agent: *' || chr(10) || 'Disallow: /' || chr(10) || '# no sitemaps here' || chr(10)
               END AS body
             FROM hosts),
      lines AS (SELECT host, i, trim(regexp_replace(l, '#.*', '')) AS line
             FROM (SELECT host,
                          generate_subscripts(string_split(body, chr(10)), 1) AS i,
                          unnest(string_split(body, chr(10))) AS l
                   FROM bodies)),
      sm AS (SELECT host, i,
               trim(regexp_extract(line, '(?i)^sitemap:[ \t]*(.*)', 1)) AS u
             FROM lines),
      kept AS (SELECT host, i, u FROM sm
               WHERE regexp_matches(u, '(?i)^https?://'))
      SELECT host,
             CAST(row_number() OVER (PARTITION BY host ORDER BY i) - 1 AS INT) AS entry_no,
             u AS sitemap_url
      FROM kept
      ORDER BY host, entry_no"""))

  /** RAW request path for RFC matching: scheme/host split as in
    * [[UrlOps.urlHost]], query/fragment dropped, NO trailing-slash fold
    * (the RFC compares octets), and the site root is `/` (code-review
    * r15 — `urlPath`'s canonical `""` made `Disallow: /` unable to
    * block the root URL). */
  private def rawPath(url: Column): Column = {
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val pqf = regexp_replace(regexp_replace(rest, "^[^/?#]*", ""),
      "#.*$", "")
    val p = regexp_extract(pqf, "^([^?]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Compile a rule pattern: `*` → any sequence, trailing `$` → end
    * anchor, everything else literal (metachars escaped). Returns
    * (needs_regex, anchored_regex) columns. */
  private def compiledRule(p: Column): (Column, Column) = {
    val wild = p.contains("*") || p.endsWith("$")
    // escape every regex metachar (the class includes * and $; the
    // wildcard semantics are re-introduced below)
    val escaped = regexp_replace(p, "([.\\[\\](){}+?^$|*\\\\])", "\\\\$1")
    val starred = replace(escaped, lit("\\*"), lit(".*"))
    val rx = when(p.endsWith("$"),
        concat(lit("^"), regexp_replace(starred, "\\\\\\$$", ""), lit("$")))
      .otherwise(concat(lit("^"), starred))
    (wild, rx)
  }

  /** Per-doc RFC 9309 verdict audit:
    * `(idCol, host, path, n_matched, best_len, best_rule, allowed)`. */
  def robotsAudit(docs: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, agent: String): DataFrame = {
    require(agent.nonEmpty && agent != "*",
      "pass the crawler's own product token, not '*'")
    val a = lit(agent.toLowerCase(java.util.Locale.ROOT))
    // group selection on the RULES side (rules-sized, never the corpus):
    // hosts with a specific-agent GROUP — including an EMPTY one (a
    // NULL-rule row; §2.2.1 allow-everything) — drop their '*' rows
    val hostsSpecific = rules.filter(col("agent") === a)
      .select(col("host")).distinct().withColumn("__sp", lit(true))
    val (wild, rx) = compiledRule(col("path_prefix"))
    val applicable = rules.filter(col("agent") === a || col("agent") === "*")
      .join(hostsSpecific, Seq("host"), "left")
      .filter(col("agent") === a || col("__sp").isNull)
      .filter(col("rule").isNotNull) // empty groups carry no rules
      .groupBy(col("host"))
      .agg(collect_list(struct(
        length(col("path_prefix")).as("plen"),
        (col("rule") === "allow").as("is_allow"),
        col("path_prefix").as("prefix"),
        wild.as("wild"), rx.as("rx"))).as("__rules"))
    val matches = filter(col("__rules"), r =>
      when(r.getField("wild"), regexp_like(col("path"), r.getField("rx")))
        .otherwise(col("path").startsWith(r.getField("prefix"))))
    val best = array_max(transform(matches,
      r => struct(r.getField("plen").as("plen"),
        r.getField("is_allow").as("is_allow"))))
    docs
      .withColumn("host", UrlOps.urlHost(col(urlCol)))
      .withColumn("path", rawPath(col(urlCol)))
      .filter(col("host").isNotNull)
      .join(broadcast(applicable), Seq("host"), "left")
      .withColumn("__best", best)
      .select(col(idCol), col("host"), col("path"),
        coalesce(size(matches), lit(0)).cast("long").as("n_matched"),
        col("__best.plen").cast("long").as("best_len"),
        when(col("__best").isNull, lit(null).cast("string"))
          .when(col("__best.is_allow"), lit("allow"))
          .otherwise(lit("disallow")).as("best_rule"),
        (col("__best").isNull || col("__best.is_allow")).as("allowed"))
  }

  /** The gate form: keep only [[robotsAudit]]-allowed docs (every input
    * column survives; scheme-less docs quarantined). */
  def robotsGate(docs: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, agent: String): DataFrame =
    docs.join(
      robotsAudit(docs, idCol, urlCol, rules, agent)
        .filter(col("allowed")).select(col(idCol)),
      Seq(idCol), "left_semi")

  // ---------------------------------------------------------------- q180
  // Fixture: one robots.txt per crawl host (three policy shapes by the
  // source ordinal — a two-group file exercising multi-UA groups,
  // longest-match, allow-tie, AND a §2.2.3 wildcard rule
  // (`Disallow: /*.pdf$`); a star file with an empty directive, a root
  // Allow, and an EMPTY graftbot group that must shield graftbot from
  // the star rules; a junk-bearing file with an orphan directive and a
  // specific deny-all group that must block the site ROOT too),
  // evaluated for agent "graftbot" over /private//tmp//doc//ads/pdf/
  // root path rotations. The oracle replays the full parse (comment
  // strip, retained-line grouping, orphan/empty drops, empty-group
  // NULL-rule rows) and the RFC evaluation — wildcard compilation
  // included — with a window instead of the array fold: same declared
  // semantics, independently expressed.
  /** The q214/q214b request-paths CTE (the q180 path rotation) — one
    * home so the two audits can't drift. */
  private val docPathsSql = """d0 AS (SELECT doc_id, source || '.example.com' AS host,
               CASE CAST(doc_id % 8 AS INT)
                 WHEN 0 THEN '/private/x' || CAST(doc_id AS VARCHAR)
                 WHEN 1 THEN '/private/ok/x'
                 WHEN 2 THEN '/tmp/f'
                 WHEN 3 THEN '/doc/page' || CAST(doc_id AS VARCHAR)
                 WHEN 4 THEN '/doc/open/1'
                 WHEN 5 THEN '/ads/z'
                 WHEN 6 THEN '/files/r' || CAST(doc_id AS VARCHAR) || '.pdf'
                 ELSE '/'
               END AS path
             FROM documents)"""

  /** The deny-host overlay + final projection shared by q214/q214b:
    * expects `d0`, `verdict`, and a `deny(host)` CTE in scope. */
  private val denyOverlaySql = """final AS (
        SELECT d.doc_id, d.host, d.path,
               CASE WHEN dn.host IS NOT NULL THEN CAST(1 AS BIGINT)
                    ELSE v.n_matched END AS n_matched,
               CASE WHEN dn.host IS NOT NULL THEN CAST(1 AS BIGINT)
                    ELSE v.best_len END AS best_len,
               CASE WHEN dn.host IS NOT NULL THEN 'disallow'
                    ELSE v.best_rule END AS best_rule,
               CASE WHEN dn.host IS NOT NULL THEN FALSE
                    ELSE v.allowed END AS allowed
        FROM d0 d
        JOIN verdict v ON d.doc_id = v.doc_id
        LEFT JOIN deny dn ON d.host = dn.host)
      SELECT doc_id, host, path, n_matched, best_len, best_rule, allowed
      FROM final
      ORDER BY doc_id"""

  /** The q214/q214b body rotation replayed in SQL — ONE home for the
    * three fixture bodies; `kExpr` is the host-ordinal SQL expression
    * (the raw `@K@` substitution avoids interpolation fights with the
    * `$` the glob body contains). */
  private def robotsBodySqlCase(kExpr: String): String =
    """CASE CAST((@K@) % 3 AS INT)
                 WHEN 0 THEN '# policy' || chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) || 'Allow: /private/ok' || chr(10) || 'Disallow: /tmp/' || chr(10) || chr(10) || 'User-agent: graftbot' || chr(10) || 'User-agent: otherbot' || chr(10) || 'Disallow: /doc/' || chr(10) || 'Allow: /doc/open' || chr(10) || 'Disallow: /*.pdf$'
                 WHEN 1 THEN 'User-agent: *  # star group' || chr(10) || 'Disallow: /ads' || chr(10) || 'Disallow:' || chr(10) || 'Allow: /' || chr(10) || chr(10) || 'User-agent: graftbot'
                 ELSE 'junk line without colon' || chr(10) || 'Disallow: /orphan' || chr(10) || 'User-agent: graftbot' || chr(10) || 'Disallow: /'
               END""".replace("@K@", kExpr)

  private def robotsBody(): Column = {
    val k = pmod(expr("CAST(substring(source, 4) AS INT)"), lit(3))
    when(k === 0, lit(
      "# policy\nUser-agent: *\nDisallow: /private\nAllow: /private/ok\n" +
        "Disallow: /tmp/\n\nUser-agent: graftbot\nUser-agent: otherbot\n" +
        "Disallow: /doc/\nAllow: /doc/open\nDisallow: /*.pdf$"))
      .when(k === 1, lit(
        "User-agent: *  # star group\nDisallow: /ads\nDisallow:\nAllow: /\n" +
          "\nUser-agent: graftbot"))
      .otherwise(lit(
        "junk line without colon\nDisallow: /orphan\n" +
          "User-agent: graftbot\nDisallow: /"))
  }

  private def docUrl(): Column = {
    val m = pmod(col("doc_id"), lit(8))
    val id = col("doc_id").cast("string")
    concat(lit("http://"), col("source"), lit(".example.com"),
      when(m === 0, concat(lit("/private/x"), id))
        .when(m === 1, lit("/private/ok/x"))
        .when(m === 2, lit("/tmp/f"))
        .when(m === 3, concat(lit("/doc/page"), id))
        .when(m === 4, lit("/doc/open/1"))
        .when(m === 5, lit("/ads/z"))
        .when(m === 6, concat(lit("/files/r"), id, lit(".pdf")))
        .otherwise(lit("/")))
  }

  private val q180 = GraftQuery(
    "q180_robots_gate",
    (s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("url", docUrl())
      val robots = docs.select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("host"),
          robotsBody().as("body"))
      robotsAudit(docs, "doc_id", "url",
          robotsRules(robots, "host", "body"), agent = "graftbot")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH hosts AS (SELECT DISTINCT source,
                            source || '.example.com' AS host FROM documents),
      bodies AS (SELECT host,
               CASE CAST(CAST(substring(source, 4) AS INT) % 3 AS INT)
                 WHEN 0 THEN '# policy' || chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) || 'Allow: /private/ok' || chr(10) || 'Disallow: /tmp/' || chr(10) || chr(10) || 'User-agent: graftbot' || chr(10) || 'User-agent: otherbot' || chr(10) || 'Disallow: /doc/' || chr(10) || 'Allow: /doc/open' || chr(10) || 'Disallow: /*.pdf$'
                 WHEN 1 THEN 'User-agent: *  # star group' || chr(10) || 'Disallow: /ads' || chr(10) || 'Disallow:' || chr(10) || 'Allow: /' || chr(10) || chr(10) || 'User-agent: graftbot'
                 ELSE 'junk line without colon' || chr(10) || 'Disallow: /orphan' || chr(10) || 'User-agent: graftbot' || chr(10) || 'Disallow: /'
               END AS body
             FROM hosts),
      d0 AS (SELECT doc_id, source || '.example.com' AS host,
               CASE CAST(doc_id % 8 AS INT)
                 WHEN 0 THEN '/private/x' || CAST(doc_id AS VARCHAR)
                 WHEN 1 THEN '/private/ok/x'
                 WHEN 2 THEN '/tmp/f'
                 WHEN 3 THEN '/doc/page' || CAST(doc_id AS VARCHAR)
                 WHEN 4 THEN '/doc/open/1'
                 WHEN 5 THEN '/ads/z'
                 WHEN 6 THEN '/files/r' || CAST(doc_id AS VARCHAR) || '.pdf'
                 ELSE '/'
               END AS path
             FROM documents),
      """ + robotsEvalSqlFrom("d0", "doc_id", "graftbot") + """
      SELECT doc_id, host, path, n_matched, best_len, best_rule, allowed
      FROM verdict
      ORDER BY doc_id"""))

  /** The RFC 9309 parse + evaluation replayed as DuckDB CTEs: assumes a
    * `bodies(host, body)` CTE exists and a request CTE `reqCte`
    * providing `(keyCol, host, path)` with `keyCol` unique per row;
    * ends in CTE `verdict` with `(keyCol, host, path, n_matched,
    * best_len, best_rule, allowed)` — hosts with no rules allow.
    * ONE home for the replay (q180 here, the crawl frontier q191).
    * Claims the CTE names lines/cls/g0/g/agents/dirs/rules/sp/
    * applicable/m/verdict. Built by token replacement, NOT string
    * interpolation — the regex bodies are `$`-dense. */
  private[operators] def robotsEvalSqlFrom(reqCte: String, keyCol: String,
      agent: String): String = """
      lines AS (SELECT host, i, trim(regexp_replace(l, '#.*', '')) AS line
             FROM (SELECT host,
                          generate_subscripts(string_split(body, chr(10)), 1) AS i,
                          unnest(string_split(body, chr(10))) AS l
                   FROM bodies)),
      cls AS (SELECT host, i,
               regexp_matches(line, '(?i)^user-agent:') AS is_ua,
               lower(regexp_extract(line, '(?i)^(allow|disallow):', 1)) AS kind,
               lower(trim(regexp_extract(line, '(?i)^user-agent:[ \t]*(.*)', 1))) AS ua_val,
               trim(regexp_extract(line, '(?i)^(allow|disallow):[ \t]*(.*)', 2)) AS dir_val
             FROM lines
             WHERE regexp_matches(line, '(?i)^user-agent:')
                OR (lower(regexp_extract(line, '(?i)^(allow|disallow):', 1)) IN ('allow', 'disallow')
                    AND trim(regexp_extract(line, '(?i)^(allow|disallow):[ \t]*(.*)', 2)) <> '')),
      g0 AS (SELECT *, CASE WHEN is_ua AND NOT COALESCE(
                    LAG(is_ua) OVER (PARTITION BY host ORDER BY i), FALSE)
                    THEN 1 ELSE 0 END AS ng
             FROM cls),
      g AS (SELECT *, CAST(SUM(ng)
                  OVER (PARTITION BY host ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gid
            FROM g0),
      agents AS (SELECT host, gid, ua_val AS agent FROM g WHERE is_ua),
      dirs AS (SELECT host, gid, kind AS rule, dir_val AS path_prefix
               FROM g WHERE NOT is_ua AND gid > 0),
      rules AS MATERIALIZED (SELECT a.host, a.agent, d.rule, d.path_prefix
                FROM agents a LEFT JOIN dirs d USING (host, gid)),
      sp AS (SELECT DISTINCT host FROM rules WHERE agent = '@AGENT@'),
      applicable AS MATERIALIZED (
            SELECT r.host, r.rule, r.path_prefix,
                   (r.path_prefix LIKE '%*%' OR r.path_prefix LIKE '%$') AS wild,
                   CASE WHEN r.path_prefix LIKE '%$'
                        THEN '^' || regexp_replace(replace(regexp_replace(r.path_prefix, '([.\[\](){}+?^$|*\\])', '\\\1', 'g'), '\*', '.*'), '\\\$$', '') || '$'
                        ELSE '^' || replace(regexp_replace(r.path_prefix, '([.\[\](){}+?^$|*\\])', '\\\1', 'g'), '\*', '.*')
                   END AS rx
            FROM rules r LEFT JOIN sp ON r.host = sp.host
            WHERE (r.agent = '@AGENT@'
                   OR (r.agent = '*' AND sp.host IS NULL))
              AND r.rule IS NOT NULL),
      m AS (SELECT d.@KEY@, d.host, d.path, a.rule,
                   len(a.path_prefix) AS plen,
                   ROW_NUMBER() OVER (PARTITION BY d.@KEY@
                     ORDER BY len(a.path_prefix) DESC,
                              (a.rule = 'allow') DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY d.@KEY@) AS nm
            FROM @REQ@ d JOIN applicable a
              ON d.host = a.host
             AND (CASE WHEN a.wild THEN regexp_matches(d.path, a.rx)
                       ELSE starts_with(d.path, a.path_prefix) END)),
      verdict AS (
      SELECT d.@KEY@, d.host, d.path,
             CAST(COALESCE(m.nm, 0) AS BIGINT) AS n_matched,
             CAST(m.plen AS BIGINT) AS best_len,
             m.rule AS best_rule,
             (m.rule IS NULL OR m.rule = 'allow') AS allowed
      FROM @REQ@ d LEFT JOIN m ON d.@KEY@ = m.@KEY@ AND m.rn = 1)"""
    .replace("@REQ@", reqCte).replace("@KEY@", keyCol)
    .replace("@AGENT@", agent)

  /** The [[robotsDelays]] parse + [[crawlDelayFor]] selection replayed
    * as DuckDB CTEs: assumes a `bodies(host, body)` CTE; ends in
    * `dl_rules(host, agent, crawl_delay)` (the raw per-group rows) and
    * `host_delay(host, crawl_delay)` (the one-agent selection).
    * `dl_`-prefixed names — q206b splices this NEXT TO
    * [[robotsEvalSqlFrom]], which claims the unprefixed ones. */
  private[operators] def delaysSqlFrom(agent: String): String = """
      dl_lines AS (SELECT host, i, trim(regexp_replace(l, '#.*', '')) AS line
             FROM (SELECT host,
                          generate_subscripts(string_split(body, chr(10)), 1) AS i,
                          unnest(string_split(body, chr(10))) AS l
                   FROM bodies)),
      dl_cls AS (SELECT host, i,
               regexp_matches(line, '(?i)^user-agent:') AS is_ua,
               lower(regexp_extract(line, '(?i)^(allow|disallow):', 1)) AS kind,
               lower(trim(regexp_extract(line, '(?i)^user-agent:[ \t]*(.*)', 1))) AS ua_val,
               trim(regexp_extract(line, '(?i)^(allow|disallow):[ \t]*(.*)', 2)) AS dir_val,
               trim(regexp_extract(line, '(?i)^crawl-delay:[ \t]*(.*)', 1)) AS cd_val
             FROM dl_lines),
      dl_c2 AS (SELECT *,
               regexp_matches(cd_val, '^[0-9]{1,6}(\.[0-9]{1,3})?$') AS is_cd,
               (is_ua OR (kind IN ('allow', 'disallow') AND dir_val <> '')) AS is_grp
             FROM dl_cls
             WHERE is_ua OR (kind IN ('allow', 'disallow') AND dir_val <> '')
                OR regexp_matches(cd_val, '^[0-9]{1,6}(\.[0-9]{1,3})?$')),
      dl_g0 AS (SELECT *, CASE WHEN is_ua AND NOT COALESCE(
                    last_value(CASE WHEN is_grp THEN is_ua END IGNORE NULLS)
                      OVER (PARTITION BY host ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    FALSE) THEN 1 ELSE 0 END AS ng
             FROM dl_c2),
      dl_g AS (SELECT *, CAST(SUM(ng)
                  OVER (PARTITION BY host ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gid
            FROM dl_g0),
      dl_agents AS (SELECT host, gid, ua_val AS agent FROM dl_g WHERE is_ua),
      dl_ds AS (SELECT host, gid, MIN(CAST(cd_val AS DOUBLE)) AS crawl_delay
                FROM dl_g WHERE is_cd AND NOT is_grp AND gid > 0
                GROUP BY host, gid),
      dl_rules AS MATERIALIZED (SELECT a.host, a.agent, d.crawl_delay
                FROM dl_agents a LEFT JOIN dl_ds d USING (host, gid)),
      dl_sp AS (SELECT DISTINCT host FROM dl_rules WHERE agent = '@AGENT@'),
      host_delay AS (SELECT r.host, MIN(r.crawl_delay) AS crawl_delay
                FROM dl_rules r LEFT JOIN dl_sp ON r.host = dl_sp.host
                WHERE (r.agent = '@AGENT@'
                       OR (r.agent = '*' AND dl_sp.host IS NULL))
                GROUP BY r.host
                HAVING MIN(r.crawl_delay) IS NOT NULL)"""
    .replace("@AGENT@", agent)

  // -------------------------------------------- fetch-status policy
  /** robots.txt FETCH-STATUS semantics (RFC 9309 §2.3.1 — what a
    * polite crawler must assume when the robots file itself can't be
    * read): per host, given the robots fetch's HTTP status,
    *   - 2xx: parse the body ([[robotsRules]] rows pass through);
    *   - 4xx ("unavailable", §2.3.1.3): crawlers MAY proceed — the
    *     host contributes NO rules (the no-rules-allows path);
    *   - 5xx / unfetchable, encoded as NULL status ("unreachable",
    *     §2.3.1.4): MUST assume complete disallow — the host gets ONE
    *     synthetic `(*, disallow, /)` rule;
    *   - anything else — 3xx residue ([[Redirects]] resolves hops
    *     before fetching), 1xx, sentinel/garbage codes — is treated
    *     as unreachable: deny is the conservative read for every
    *     status class the RFC does not explicitly make permissive
    *     (code-review r16: an earlier version let 1xx fall through to
    *     allow-all).
    * Takes the fetch table `(host, status, body)` and returns the
    * rules frame the gate consumes — same shape, one rules-sized
    * projection + the 2xx subset's parse. */
  def robotsRulesWithStatus(fetches: DataFrame, hostCol: String,
      statusCol: String, bodyCol: String): DataFrame = {
    val st = col(statusCol)
    val parsed = robotsRules(
      fetches.filter(st >= 200 && st <= 299), hostCol, bodyCol)
    // deny-by-default: ONLY 2xx (parse) and 4xx (allow-all) are
    // permissive; every other status — NULL, <200, 3xx, 5xx+ — denies
    val denied = fetches
      .filter(st.isNull || !((st >= 200 && st <= 299) ||
        (st >= 400 && st <= 499)))
      .select(col(hostCol).as("host"), lit("*").as("agent"),
        lit("disallow").as("rule"), lit("/").as("path_prefix"))
    parsed.unionByName(denied) // 4xx hosts appear in neither: allow-all
  }

  // ------------------------------------------- robots 3xx composition
  /** Compose [[graft.operators.Redirects.resolveRedirects]] with the
    * robots fetch table (VERDICT r16 next #6 — q214 treats residual
    * 3xx as unreachable and defers resolution upstream; THIS is the
    * upstream): a robots.txt fetched at a URL that redirects MUST use
    * the redirect target's body (RFC 9309 §2.3.1.2), following up to
    * `maxHops` consecutive hops — deeper chains, cycles, and targets
    * outside the fetch table are "unreachable" (NULL status → the
    * §2.3.1.4 deny). Input `(host, status, location, body)` — 3xx rows
    * carry the target URL in `location`; output the EFFECTIVE
    * `(host, status, body)` frame [[robotsRulesWithStatus]] consumes.
    * Shape: pointer-doubling over the hosts-sized edge set (⌈log₂
    * maxHops⌉ self-joins) + one final-url lookup join — everything
    * hosts-sized, the corpus never touched. */
  def robotsFetchResolve(fetches: DataFrame, hostCol: String,
      statusCol: String, locationCol: String, bodyCol: String,
      maxHops: Int = 5): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32, "1..32 hops")
    // the origin key normalizes EXACTLY like the edge-target key below
    // (lowercase, strip one leading `www.`, strip port — what
    // [[UrlOps.urlHost]] yields for the Location host); ADVICE r17: a
    // raw-verbatim origin key meant an uppercase or `www.`-prefixed
    // fetch-table host could never be reached by any redirect and
    // silently resolved to unreachable/deny. One host key, both sides.
    val normHost = regexp_replace(regexp_replace(
      lower(col(hostCol)), ":[0-9]+$", ""), "^www\\.", "")
    // hosts-sized and read by FOUR consumers (origin set, edge set, the
    // terminal lookup, the final host join) — materialize once
    // (optimization r18, guide §2.4): lazily each consumer re-embedded
    // the caller's fetch-table derivation (q214b: a corpus DISTINCT per
    // reference, ×2 again inside robotsRulesWithStatus' parse/deny
    // union — 32 corpus scans in the before plan).
    // BATCH-ONLY + EAGER contract (ADVICE r18): the localCheckpoint
    // makes building this operator execute a Spark job immediately and
    // would throw AnalysisException on a streaming frame; all declared
    // callers are batch — a streaming caller must cut at a sink
    // boundary (foreachBatch) first.
    val f = fetches.select(
      col(hostCol).as("__h"), col(statusCol).as("__st"),
      col(locationCol).as("__loc"), col(bodyCol).as("__body"),
      concat(lit("https://"), normHost, lit("/robots.txt"))
        .as("__url"))
      .localCheckpoint()
    // edge targets NORMALIZE to the synthesized per-host key by HOST
    // (code-review r17: an exact-string match denied any http://,
    // ported, or path-variant Location pointing at an in-table host):
    // the fetch model is one robots row per host, so wherever the
    // redirect lands, the target HOST's fetched row is the body RFC
    // 9309 §2.3.1.2 says to use; a Location whose host can't parse
    // keeps the RAW value — it lands outside the fetch table, so the
    // origin stays unreachable → deny, as before
    val locHost = UrlOps.urlHost(col("__loc"))
    val edges = f.filter(col("__st").between(300, 399) &&
        col("__loc").isNotNull)
      .select(col("__url").as("url"),
        when(locHost.isNotNull,
          concat(lit("https://"), locHost, lit("/robots.txt")))
          .otherwise(col("__loc")).as("next"))
    var rounds = 1
    while ((1 << rounds) < maxHops) rounds += 1
    val resolved = Redirects.resolveRedirects(
      f.select(col("__url").as("url")), edges, rounds)
    val term = f.select(col("__url").as("__t_url"),
      col("__st").as("__t_st"), col("__body").as("__t_body"))
    val reachable = col("resolved") && col("n_hops") <= maxHops
    f.select(col("__h"), col("__url"))
      .join(resolved, col("__url") === resolved("url"))
      .join(term, col("final_url") === col("__t_url"), "left")
      .select(col("__h").as("host"),
        // NULL when unresolved (cycle / > 2^rounds), too deep, or the
        // final URL is outside the fetch table — all "unreachable"
        when(reachable, col("__t_st")).as("status"),
        when(reachable, col("__t_body")).as("body"))
  }

  // ---------------------------------------------------------------- q214
  // Fetch-status policy through the full gate: hosts rotate a 200 body
  // (the q180 k-shape policies), a 404 (allow-everything), a 503
  // (deny-everything), and a NULL status (unreachable — deny), and the
  // corpus routes every path rotation through robotsAudit under the
  // synthesized rules. The oracle replays the status split: 200 hosts
  // run the shared RFC replay, 4xx hosts allow with zero matches, 5xx/
  // NULL hosts match the synthetic root rule.
  private def fetchStatus(): Column = {
    val k = pmod(expr("CAST(substring(source, 4) AS INT)"), lit(4))
    when(k === 0, lit(200)).when(k === 1, lit(404))
      .when(k === 2, lit(503)).otherwise(lit(null).cast("int"))
  }

  private val q214 = GraftQuery(
    "q214_robots_fetch_policy",
    (s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("url", docUrl())
      val fetches = docs.select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("host"),
          fetchStatus().as("status"), robotsBody().as("body"))
      robotsAudit(docs, "doc_id", "url",
          robotsRulesWithStatus(fetches, "host", "status", "body"),
          agent = "graftbot")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH hosts AS (SELECT DISTINCT source,
                            source || '.example.com' AS host FROM documents),
      st AS (SELECT source, host,
               CASE CAST(CAST(substring(source, 4) AS INT) % 4 AS INT)
                 WHEN 0 THEN 200 WHEN 1 THEN 404 WHEN 2 THEN 503 END AS status
             FROM hosts),
      bodies AS (SELECT host,
               ${robotsBodySqlCase("CAST(substring(source, 4) AS INT)")} AS body
             FROM st WHERE status = 200),
      $docPathsSql,
      """ + robotsEvalSqlFrom("d0", "doc_id", "graftbot") + """,
      deny AS (SELECT host FROM st WHERE status IS NULL OR status >= 500),
      """ + denyOverlaySql))

  // --------------------------------------------------------------- q214b
  // The 3xx composition through the full gate (VERDICT r16 next #6):
  // host ordinals rotate k%6 — 0: direct 200 (parse own body); 1: 301
  // → host k−1 (a %6=0 host: parse ITS body — the use-the-target's-
  // body law); 2: direct 404 (allow-all); 3: 301 → k+1 (%6=4) which
  // 301s again → k−1 (%6=2): a 2-hop chain landing on a 404; 4: 301 →
  // k−2 (%6=2, 404, 1 hop); 5: 301 → itself (a 1-cycle: unresolved →
  // deny). Targets past the host-set edge are off-corpus → deny. The
  // oracle replays the ≤2-hop walk CLOSED-FORM with existence joins
  // (host-set membership, not ordinal arithmetic assumptions), then
  // runs the same shared eval + deny overlay as q214; the ≥maxHops
  // refusal (no fixture arm can reach 5 hops under mod-6) is pinned by
  // RobotsSpec chain laws instead.
  private val q214b = GraftQuery(
    "q214b_robots_redirect",
    (s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("url", docUrl())
      val k = expr("CAST(substring(source, 4) AS INT)")
      val m = pmod(k, lit(6))
      val target = when(m === 1, k - 1).when(m === 3, k + 1)
        .when(m === 4, k - 2).when(m === 5, k)
      val fetches = docs.select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("host"),
          when(m === 0, lit(200)).when(m === 2, lit(404))
            .otherwise(lit(301)).as("status"),
          when(m.isin(1, 3, 4, 5),
            concat(lit("https://src"), target.cast("string"),
              lit(".example.com/robots.txt"))).as("location"),
          when(m === 0, robotsBody()).as("body"))
      val eff = robotsFetchResolve(fetches, "host", "status",
        "location", "body", maxHops = 5)
      robotsAudit(docs, "doc_id", "url",
          robotsRulesWithStatus(eff, "host", "status", "body"),
          agent = "graftbot")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH hosts AS (SELECT DISTINCT source,
                            CAST(substring(source, 4) AS INT) AS k,
                            source || '.example.com' AS host FROM documents),
      e1 AS (SELECT k, host,
               CASE CAST(k % 6 AS INT)
                 WHEN 0 THEN k WHEN 2 THEN k
                 WHEN 1 THEN k - 1 WHEN 3 THEN k + 1 WHEN 4 THEN k - 2
               END AS t1
             FROM hosts),
      e2 AS (SELECT e.k, e.host,
               CASE WHEN h1.k IS NULL THEN NULL
                    WHEN CAST(h1.k % 6 AS INT) = 4 THEN h1.k - 2
                    ELSE h1.k END AS t2
             FROM e1 e LEFT JOIN hosts h1 ON e.t1 = h1.k),
      eff AS (SELECT e.k, e.host, h2.k AS ek,
                CASE WHEN h2.k IS NULL THEN NULL
                     WHEN CAST(h2.k % 6 AS INT) = 0 THEN 200
                     ELSE 404 END AS est
              FROM e2 e LEFT JOIN hosts h2 ON e.t2 = h2.k),
      bodies AS (SELECT host, ${robotsBodySqlCase("ek")} AS body
                 FROM eff WHERE est = 200),
      $docPathsSql,
      """ + robotsEvalSqlFrom("d0", "doc_id", "graftbot") + """,
      deny AS (SELECT host FROM eff
               WHERE est IS NULL
                  OR NOT (est BETWEEN 200 AND 299 OR est BETWEEN 400 AND 499)),
      """ + denyOverlaySql))

  // ---------------------------------------------------------------- q206
  // Crawl-delay parse as a declared operator (VERDICT r15 next #6).
  // Fixture rotations (k%4 by source ordinal): a two-group body where
  // the specific group's 2.5 s beats the star 10 s; a star-only body
  // with a case-mixed field name and two delays (min wins); a star
  // delay plus a DELAY-LESS graftbot group (the NULL-delay shield
  // row); and a grammar-edge body — a delay BETWEEN two UA lines
  // (attaches to their shared group without splitting it, §2.2.4
  // non-interference), a junk value (refused at parse), and a
  // commented delay line (comment strips first). The oracle replays
  // the whole parse (grouping included) in SQL.
  private def delayBody(): Column = {
    val k = pmod(expr("CAST(substring(source, 4) AS INT)"), lit(4))
    when(k === 0, lit(
      "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n" +
        "User-agent: graftbot\nUser-agent: otherbot\n" +
        "Crawl-delay: 2.5\nAllow: /"))
      .when(k === 1, lit(
        "User-agent: *\nCrawl-delay: 15\ncrawl-delay: 5"))
      .when(k === 2, lit(
        "User-agent: *\nCrawl-delay: 20\nDisallow: /y\n\n" +
          "User-agent: graftbot\nDisallow: /p"))
      .otherwise(lit(
        "User-agent: a\nCrawl-delay: 9\nUser-agent: b\nDisallow: /q\n" +
          "Crawl-delay: junk\nUser-agent: graftbot\nCrawl-delay: 7 # fast"))
  }

  private val delayBodySql = """
               CASE CAST(CAST(substring(source, 4) AS INT) % 4 AS INT)
                 WHEN 0 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 10' || chr(10) || 'Disallow: /x' || chr(10) || chr(10) || 'User-agent: graftbot' || chr(10) || 'User-agent: otherbot' || chr(10) || 'Crawl-delay: 2.5' || chr(10) || 'Allow: /'
                 WHEN 1 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 15' || chr(10) || 'crawl-delay: 5'
                 WHEN 2 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 20' || chr(10) || 'Disallow: /y' || chr(10) || chr(10) || 'User-agent: graftbot' || chr(10) || 'Disallow: /p'
                 ELSE 'User-agent: a' || chr(10) || 'Crawl-delay: 9' || chr(10) || 'User-agent: b' || chr(10) || 'Disallow: /q' || chr(10) || 'Crawl-delay: junk' || chr(10) || 'User-agent: graftbot' || chr(10) || 'Crawl-delay: 7 # fast'
               END"""

  private val q206 = GraftQuery(
    "q206_robots_crawl_delay",
    (s, dir) => {
      val robots = Tables.documents(s, dir).select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("host"),
          delayBody().as("body"))
      robotsDelays(robots, "host", "body")
        .orderBy(col("host"), col("agent"), col("crawl_delay"))
    },
    Some(s"""
      WITH hosts AS (SELECT DISTINCT source,
                            source || '.example.com' AS host FROM documents),
      bodies AS (SELECT host, $delayBodySql AS body FROM hosts),
      ${delaysSqlFrom("graftbot")}
      SELECT host, agent, crawl_delay
      FROM dl_rules
      ORDER BY host, agent, crawl_delay"""))

  val all: Seq[GraftQuery] = Seq(q180, q201, q206, q214, q214b)
}
