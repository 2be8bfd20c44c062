package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 laws on hand-written robots.txt fixtures (spec-truth, not
  * the q180 builder). */
class RobotsSpec extends SparkSpec {

  private def rules(bodies: (String, String)*) = {
    import spark.implicits._
    Robots.robotsRules(bodies.toSeq.toDF("host", "body"), "host", "body")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
  }

  test("parse: groups, multi-UA sharing, comments, orphan/empty/junk drops") {
    val body =
      "# top comment\n" +
        "Disallow: /orphan\n" + // before any group -> dropped
        "User-agent: A\n" +
        "User-agent: B\n" + // same group as A
        "Disallow: /x # trailing comment\n" +
        "Allow:\n" + // empty value -> dropped
        "garbage, no colon\n" + // junk -> ignored, group survives
        "Allow: /x/ok\n" +
        "\n" +
        "user-AGENT: C\n" + // case-insensitive field names
        "DISALLOW: /y\n"
    val got = rules("h" -> body)
    assert(got == Set(
      ("h", "a", "disallow", "/x"),
      ("h", "a", "allow", "/x/ok"),
      ("h", "b", "disallow", "/x"),
      ("h", "b", "allow", "/x/ok"),
      ("h", "c", "disallow", "/y")), got.toString)
  }

  test("sitemap directives: any position, any case, comments stripped, relative dropped") {
    import spark.implicits._
    val body =
      "Sitemap: https://h/s1.xml\n" + // before any group
        "User-agent: *\nDisallow: /x\n" +
        "SITEMAP: https://h/s2.xml # trailing comment\n" + // in-group, cased
        "sitemap: /relative.xml\n" + // relative -> dropped
        "Sitemap:\n" + // empty -> dropped
        "# Sitemap: https://h/commented.xml\n" // whole-line comment
    val got = Robots.robotsSitemaps(
        Seq(("h", body)).toDF("host", "body"), "host", "body")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toList.sortBy(_._2)
    assert(got == List(("h", 0, "https://h/s1.xml"),
      ("h", 1, "https://h/s2.xml")), got.toString)
  }

  test("gate: specific group beats star, longest match wins, ties allow, no-rules allows") {
    import spark.implicits._
    val r = rules(
      "h1" -> ("User-agent: *\nDisallow: /\n\n" +
        "User-agent: bot\nDisallow: /priv\nAllow: /priv/pub"),
      "h2" -> "User-agent: *\nDisallow: /a\nAllow: /a", // tie -> allow
      "h3" -> "User-agent: other\nDisallow: /")
      .toSeq.toDF("host", "agent", "rule", "path_prefix")
    val docs = Seq(
      (1L, "http://h1/anything"), // star's Disallow / must NOT apply (specific group exists)
      (2L, "http://h1/priv/x"), // disallow /priv (len 5)
      (3L, "http://h1/priv/pub/x"), // allow /priv/pub (len 9) beats /priv
      (4L, "http://h2/a"), // equal-length allow+disallow -> allow
      (5L, "http://h3/x"), // only 'other' agent rules -> star absent -> allowed
      (6L, "http://h4/x"), // host with no robots at all -> allowed
      (7L, "no-scheme/x") // quarantined (NULL host)
    ).toDF("doc_id", "url")
    val got = Robots.robotsAudit(docs, "doc_id", "url", r, "bot")
      .collect().map(x => x.getLong(0) -> x.getBoolean(6)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> true, 6L -> true), got.toString)
    // the gate form keeps exactly the allowed ids and all columns
    val kept = Robots.robotsGate(docs, "doc_id", "url", r, "bot")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
    // star token refused as the caller's own agent
    intercept[IllegalArgumentException] {
      Robots.robotsGate(docs, "doc_id", "url", r, "*")
    }
  }

  test("RFC corrections (code-review r15): root path, trailing slash, wildcards, empty groups") {
    import spark.implicits._
    val r = rules(
      "hr" -> "User-agent: *\nDisallow: /", // must block the site ROOT
      "ht" -> "User-agent: *\nDisallow: /dir/", // trailing slash significant
      "hw" -> "User-agent: *\nDisallow: /*.pdf$\nAllow: /files",
      "he" -> "User-agent: *\nDisallow: /\n\nUser-agent: bot" // EMPTY bot group
    ).toSeq.toDF("host", "agent", "rule", "path_prefix")
    // the empty group must survive parsing as a NULL-rule row
    assert(Robots.robotsRules(
        Seq("he" -> "User-agent: *\nDisallow: /\n\nUser-agent: bot")
          .toDF("host", "body"), "host", "body")
      .filter(col("agent") === "bot").collect()
      .map(x => (x.isNullAt(2), x.isNullAt(3))).toSeq == Seq((true, true)))
    val docs = Seq(
      (1L, "http://hr/"), // raw path '/' matches Disallow / -> BLOCKED
      (2L, "http://ht/dir/"), // '/dir/' matches '/dir/' -> blocked
      (3L, "http://ht/dir"), // '/dir' does NOT match '/dir/' -> allowed
      (4L, "http://hw/files/a.pdf"), // wildcard+anchor (len 7) beats Allow /files (6)
      (5L, "http://hw/files/a.pdfx"), // $ anchor fails -> Allow /files wins
      (6L, "http://hw/x.pdf"), // wildcard matches anywhere under /
      (7L, "http://he/anything") // empty bot group shields from star's Disallow /
    ).toDF("doc_id", "url")
    val got = Robots.robotsAudit(docs, "doc_id", "url", r, "bot")
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(6), Option(x.getString(2))))).toMap
    assert(got(1L)._1 == false && got(1L)._2.contains("/"), got(1L).toString)
    assert(got(2L)._1 == false && got(3L)._1 == true)
    assert(got(4L)._1 == false && got(5L)._1 == true && got(6L)._1 == false)
    assert(got(7L)._1 == true)
  }

  test("crawl-delay: group attach, min-wins, junk refusal, UA-run non-interference") {
    import spark.implicits._
    val bodies = Seq(
      // delay between two UA lines attaches to their SHARED group
      // (§2.2.4: other records must not interfere with UA-run grouping)
      ("h1", "User-agent: a\nCrawl-delay: 9\nUser-agent: b\nDisallow: /q\n" +
        "Crawl-delay: junk\nUser-agent: c\nCrawl-delay: 7 # fast"),
      // two delays in one group: min wins; case-insensitive field name
      ("h2", "User-agent: *\nCrawl-delay: 15\ncrawl-delay: 2.5"))
      .toDF("host", "body")
    val got = Robots.robotsDelays(bodies, "host", "body").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("h1", "a")).contains(9.0) && got(("h1", "b")).contains(9.0),
      got.toString)
    assert(got(("h1", "c")).contains(7.0), "comment strips, junk refused")
    assert(got(("h2", "*")).contains(2.5), "min of the group's delays")
  }

  test("crawlDelayFor: specific group wins; a DELAY-LESS specific group shields from star") {
    import spark.implicits._
    val bodies = Seq(
      ("h1", "User-agent: *\nCrawl-delay: 10\n\nUser-agent: bot\nCrawl-delay: 2"),
      // the star group needs a RULE before bot's UA line — otherwise
      // the two UA lines legally form ONE multi-UA group (the RFC
      // grammar; delay lines never split a UA run)
      ("h2", "User-agent: *\nCrawl-delay: 20\nDisallow: /x\n\n" +
        "User-agent: bot\nDisallow: /p"),
      ("h3", "User-agent: *\nCrawl-delay: 30"),
      ("h4", "User-agent: *\nDisallow: /x")) // no delay anywhere
      .toDF("host", "body")
    val got = Robots.crawlDelayFor(
        Robots.robotsDelays(bodies, "host", "body"), "bot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("h1" -> 2.0, "h3" -> 30.0), got.toString)
  }

  test("fetch-status policy: 2xx parses, 4xx allows all, 5xx/NULL/3xx deny all") {
    import spark.implicits._
    val fetches = Seq(
      ("ok.org", Integer.valueOf(200), "User-agent: *\nDisallow: /x"),
      ("gone.org", Integer.valueOf(404), "ignored"),
      ("down.org", Integer.valueOf(503), "ignored"),
      ("moved.org", Integer.valueOf(301), "ignored"),
      ("odd.org", Integer.valueOf(101), "ignored"), // <200: deny-by-default
      ("dark.org", null.asInstanceOf[Integer], null.asInstanceOf[String]))
      .toDF("host", "status", "body")
    val r = Robots.robotsRulesWithStatus(fetches, "host", "status", "body")
    val docs = Seq(
      (1L, "http://ok.org/x/1"), (2L, "http://ok.org/y"),
      (3L, "http://gone.org/anything"),
      (4L, "http://down.org/"), (5L, "http://moved.org/a"),
      (6L, "http://dark.org/z"), (7L, "http://odd.org/w"))
      .toDF("doc_id", "url")
    val got = Robots.robotsAudit(docs, "doc_id", "url", r, "bot")
      .collect().map(x => x.getLong(0) -> x.getBoolean(6)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false, 7L -> false), got.toString)
  }

  test("robotsFetchResolve: target body wins, hop bound, cycle, off-corpus") {
    import spark.implicits._
    def u(h: String) = s"https://$h/robots.txt"
    // chain a0→a1→…→a5 (5 hops to the 200 at a5); b0→b1→…→b6 (6 hops —
    // past maxHops=5, unreachable); c self-cycle; d → off-corpus;
    // e → 404 target
    val chainA = (0 until 5).map(i =>
      (s"a$i.org", Integer.valueOf(301), u(s"a${i + 1}.org"), null.asInstanceOf[String]))
    val chainB = (0 until 6).map(i =>
      (s"b$i.org", Integer.valueOf(301), u(s"b${i + 1}.org"), null.asInstanceOf[String]))
    val fetches = (chainA ++ chainB ++ Seq(
      ("a5.org", Integer.valueOf(200), null.asInstanceOf[String], "User-agent: *\nDisallow: /x"),
      ("b6.org", Integer.valueOf(200), null.asInstanceOf[String], "User-agent: *\nAllow: /"),
      ("c.org", Integer.valueOf(301), u("c.org"), null.asInstanceOf[String]),
      ("d.org", Integer.valueOf(301), u("elsewhere.example"), null.asInstanceOf[String]),
      ("e.org", Integer.valueOf(301), u("gone.org"), null.asInstanceOf[String]),
      ("gone.org", Integer.valueOf(404), null.asInstanceOf[String], null.asInstanceOf[String])))
      .toDF("host", "status", "location", "body")
    val eff = Robots.robotsFetchResolve(fetches, "host", "status",
        "location", "body", maxHops = 5)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1), r.getString(2))).toMap
    assert(eff("a0.org") == (200, "User-agent: *\nDisallow: /x"),
      "5 hops followed; the TARGET's body is used")
    assert(eff("b0.org") == (-1, null), "6 hops: unreachable")
    assert(eff("b1.org") == (200, "User-agent: *\nAllow: /"), "5 from b1")
    assert(eff("c.org") == (-1, null), "1-cycle: unresolved")
    assert(eff("d.org") == (-1, null), "off-corpus target")
    assert(eff("e.org") == (404, null), "redirect to a 404: allow-all")
    assert(eff("a5.org") == (200, "User-agent: *\nDisallow: /x"), "direct")
  }

  test("robotsFetchResolve: Location normalizes by HOST — scheme/port/path variants reach the target") {
    import spark.implicits._
    val fetches = Seq(
      ("p.org", Integer.valueOf(301), "http://t.org/robots.txt", null.asInstanceOf[String]),
      ("q.org", Integer.valueOf(301), "https://t.org:8443/some/other/path", null.asInstanceOf[String]),
      ("r.org", Integer.valueOf(301), "not a url at all", null.asInstanceOf[String]),
      ("t.org", Integer.valueOf(200), null.asInstanceOf[String], "User-agent: *\nAllow: /"))
      .toDF("host", "status", "location", "body")
    val eff = Robots.robotsFetchResolve(fetches, "host", "status",
        "location", "body", maxHops = 5)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(eff("p.org") == 200, "http scheme still reaches the host's row")
    assert(eff("q.org") == 200, "port + path variants normalize to the host")
    assert(eff("r.org") == -1, "unparseable Location: unreachable, deny")
  }

  test("gate plan: corpus never shuffles (broadcast rules array + codegen fold)") {
    import spark.implicits._
    val r = rules("h" -> "User-agent: *\nDisallow: /x")
      .toSeq.toDF("host", "agent", "rule", "path_prefix")
    val docs = Seq((1L, "http://h/x")).toDF("doc_id", "url")
    val plan = Robots.robotsAudit(docs, "doc_id", "url", r, "bot")
      .queryExecution.executedPlan.toString
    // the only exchanges allowed are on the rules side (tiny) feeding the
    // broadcast; the docs scan itself must flow into a BroadcastHashJoin
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
  }
}
