package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {

  test("canonicalizeUrl: every documented rule on planted fixtures") {
    import spark.implicits._
    val fixtures = Seq(
      // case: scheme+host fold, path case preserved
      ("HTTPS://WWW.News.Example.COM/Articles/Today", "https://news.example.com/Articles/Today"),
      // default ports stripped, non-default kept
      ("https://a.com:443/x", "https://a.com/x"),
      ("http://a.com:80/x", "http://a.com/x"),
      ("http://a.com:8080/x", "http://a.com:8080/x"),
      // https:80 is NOT the default — kept
      ("https://a.com:80/x", "https://a.com:80/x"),
      // fragment dropped
      ("https://a.com/x#section-2", "https://a.com/x"),
      // tracking params dropped, survivors sorted, ? kept
      ("https://a.com/x?utm_source=tw&z=1&a=2&fbclid=abc&gclid=g", "https://a.com/x?a=2&z=1"),
      // only tracking params -> no '?'
      ("https://a.com/x?utm_campaign=c&utm_medium=m", "https://a.com/x"),
      // bare utm param without '=' also dropped
      ("https://a.com/x?utm_source&b=1", "https://a.com/x?b=1"),
      // trailing slash stripped; root path folds to empty
      ("https://a.com/x/", "https://a.com/x"),
      ("https://a.com/", "https://a.com"),
      ("https://a.com", "https://a.com"),
      // one leading www. only; inner 'www.' untouched
      ("https://www.www.a.com/x", "https://www.a.com/x"),
      // host query param VALUES keep their case (only scheme+host fold)
      ("https://a.com/x?q=Hello", "https://a.com/x?q=Hello")
    )
    val got = fixtures.map(_._1).toDF("url")
      .select(col("url"), UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fixtures.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)}, want $want")
    }
    // scheme-less and NULL inputs canonicalize to NULL (refuse-visibly)
    val nulls = Seq(Some("a.com/x"), Some("not a url"), None)
      .toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)), nulls.mkString(","))
  }

  test("urlHost: lowercased, www/port stripped; null for scheme-less") {
    import spark.implicits._
    val got = Seq("HTTPS://WWW.A.Example.COM:8443/p?q=1#f", "nota url")
      .toDF("url").select(UrlOps.urlHost(col("url"))).collect()
    assert(got(0).getString(0) == "a.example.com")
    assert(got(1).isNullAt(0))
  }

  test("urlDedup: keep-first per canonical key; scheme-less rows excluded; plan is one hash-agg") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.com/x?b=2&a=1"),
      (2L, "HTTP://WWW.A.COM:80/y"),
      (3L, "https://www.a.com:443/x/?a=1&b=2#frag"), // dup of 1 canonically
      (4L, "garbage-no-scheme"),
      (5L, "http://a.com/y") // dup of 2
    ).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(docs, "url", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, "https://a.com/x?a=1&b=2", "a.com", 2L),
      (2L, "http://a.com/y", "a.com", 2L)), got.toString)
    // scale shape: a single hash-agg on the canonical key, no window,
    // no sort, no join in the physical plan
    val plan = UrlOps.urlDedup(docs, "url", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      s"urlDedup must be one hash-agg:\n$plan")
  }

  test("urlDedup and hostProfile agree on the host key (double-www, ADVICE r13)") {
    // raw www.www.a.com: canonicalize strips ONE www -> host www.a.com.
    // urlDedup must not re-strip when deriving host from the canonical
    // URL, or its key ('a.com') would diverge from hostProfile's
    // urlHost(raw) key ('www.a.com') feeding the same v:-encoded cap.
    import spark.implicits._
    val docs = Seq((1L, "https://www.www.a.com/x", 10L))
      .toDF("doc_id", "url", "n_chars")
    val dedupHost = UrlOps.urlDedup(docs, "url", "doc_id")
      .select(col("host")).collect().head.getString(0)
    val profileHost = UrlOps.hostProfile(docs, "url", "doc_id", "n_chars")
      .select(col("host")).collect().head.getString(0)
    assert(dedupHost == "www.a.com", dedupHost)
    assert(profileHost == dedupHost,
      s"host keys diverge: dedup=$dedupHost profile=$profileHost")
  }

  test("hostGate: blocked dropped, allowed kept, scheme-less quarantined; broadcast anti join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://spam.bad.com/x"),       // blocked (rule spam)
      (2L, "https://WWW.Spam.BAD.com:443/y"), // same host canonically -> blocked
      (3L, "https://good.com/z"),           // kept
      (4L, "no-scheme-here"),               // quarantined (dropped)
      (5L, "http://adsite.com/a")           // blocked (rule adult)
    ).toDF("doc_id", "url")
    val bl = Seq("v:spam.bad.com" -> "spam", "v:adsite.com" -> "adult")
      .toDF("host_key", "rule")
    val kept = UrlOps.hostGate(docs, "url", bl)
      .select(col("doc_id"), col("host"), col("host_key"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(kept == Set((3L, "good.com", "v:good.com")), kept.toString)
    // scale shape: the corpus side must not shuffle — broadcast anti join
    val plan = UrlOps.hostGate(docs, "url", bl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hostGate must be a broadcast left-anti join:\n$plan")

    // allowlist twin: ONLY listed hosts survive; scheme-less never match
    val allowKept = UrlOps.hostAllowGate(docs, "url",
        Seq("v:good.com" -> "curated").toDF("host_key", "rule"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(allowKept == Set(3L), allowKept.toString)
  }

  test("hostGateLedger: first-fail per-rule accounting on the q134 ledger shape") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://spam.bad.com/x"), (2L, "https://spam.bad.com/y"),
      (3L, "https://good.com/z"), (4L, "no-scheme"),
      (5L, "http://adsite.com/a")
    ).toDF("doc_id", "url")
    val bl = Seq("v:spam.bad.com" -> "spam", "v:adsite.com" -> "adult")
      .toDF("host_key", "rule")
    val got = UrlOps.hostGateLedger(docs, "url", bl)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0, "schemeless_quarantine", 5L, 1L, 4L),
      (1, "adult", 4L, 1L, 3L),
      (2, "spam", 3L, 2L, 1L)), got.mkString(", "))
  }

  test("hostProfile shard fold law: fold(disjoint shards) == one-shot, incl. parquet round-trip") {
    import spark.implicits._
    val docs = Seq(
      (10L, "https://b.com/1", 100L),
      (11L, "https://b.com/1/", 50L),  // same canonical URL, other shard
      (12L, "https://b.com/2", 25L),
      (13L, "http://c.com/", 7L),
      (14L, "no-scheme", 999L)
    ).toDF("doc_id", "url", "n_chars")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val once = canon(UrlOps.hostProfile(docs, "url", "doc_id", "n_chars"))
    val a = UrlOps.hostProfileShard(docs.filter(col("doc_id") % 2 === 0),
      "url", "doc_id", "n_chars")
    val b = UrlOps.hostProfileShard(docs.filter(col("doc_id") % 2 =!= 0),
      "url", "doc_id", "n_chars")
    assert(canon(UrlOps.hostProfileFromShards(a.unionByName(b))) == once)
    // parquet round-trip: stored shards re-read fold identically
    val dir = java.nio.file.Files.createTempDirectory("host_shards").toString
    a.write.parquet(s"$dir/a"); b.write.parquet(s"$dir/b")
    val reread = UrlOps.hostProfileFromShards(
      spark.read.parquet(s"$dir/a").unionByName(spark.read.parquet(s"$dir/b")))
    assert(canon(reread) == once, "parquet round-trip changed the fold")
  }

  test("pathPrefixGate: prefix semantics, multi-prefix hosts, empty prefix, trailing-slash fold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://bad.com/ads/banner"),     // blocked (/ads)
      (2L, "https://bad.com/ads"),            // blocked (exact prefix)
      (3L, "https://bad.com/adstext"),        // blocked — prefix is a STRING prefix
      (4L, "https://bad.com/article/1"),      // kept (host has only /ads + /track rules)
      (5L, "https://bad.com/track/x"),        // blocked (second prefix, same host)
      (6L, "https://all.bad.com/anything"),   // blocked (empty prefix = whole host)
      (7L, "https://good.com/ads/ok"),        // kept (no rule for this host)
      (8L, "no-scheme"),                      // quarantined
      (9L, "https://bad.com/ads/")            // blocked: trailing slash folds to /ads
    ).toDF("doc_id", "url")
    val rules = Seq(
      ("v:bad.com", "/ads", "ads"),
      ("v:bad.com", "/track", "tracking"),
      ("v:all.bad.com", "", "blocked_host")
    ).toDF("host_key", "path_prefix", "rule")
    val kept = UrlOps.pathPrefixGate(docs, "url", rules)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L, 7L), kept.toString)
    // corpus side must not shuffle: broadcast anti join with the prefix
    // test as the join condition
    val plan = UrlOps.pathPrefixGate(docs, "url", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti")
      && plan.toLowerCase.contains("startswith"),
      s"pathPrefixGate must be a broadcast anti join with a prefix condition:\n$plan")
    // guards: NULL prefix refused (use '' explicitly for whole-host)
    val err = intercept[Exception] {
      UrlOps.pathPrefixGate(docs, "url",
        Seq(("v:bad.com", null: String, "r")).toDF("host_key", "path_prefix", "rule"))
        .collect()
    }
    assert(err.getMessage.contains("NULL path_prefix"), err.getMessage)
  }

  test("hostGate guards: raw keys, NULL rules refused; duplicate keys fold") {
    import spark.implicits._
    val docs = Seq((1L, "https://a.com/x")).toDF("doc_id", "url")
    val rawKey = intercept[Exception] {
      UrlOps.hostGate(docs, "url",
        Seq("a.com" -> "spam").toDF("host_key", "rule")).collect()
    }
    assert(rawKey.getMessage.contains("domainKey-encoded"), rawKey.getMessage)
    val nullRule = intercept[Exception] {
      UrlOps.hostGateLedger(docs, "url",
        Seq(("v:a.com", null: String)).toDF("host_key", "rule"))
    }
    assert(nullRule.getMessage.contains("NULL rule"), nullRule.getMessage)
    // duplicate host_key rows fold to min(rule): the doc drops ONCE
    val ledger = UrlOps.hostGateLedger(docs, "url",
      Seq("v:a.com" -> "spam", "v:a.com" -> "adult").toDF("host_key", "rule"))
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(ledger == Map("schemeless_quarantine" -> 0L, "adult" -> 1L),
      ledger.toString)
  }

  test("hostProfile: counts, distinct urls, rep id, v:-encoded host key") {
    import spark.implicits._
    val docs = Seq(
      (10L, "https://b.com/1", 100L),
      (11L, "https://b.com/1/", 50L),   // same canonical URL
      (12L, "https://b.com/2", 25L),
      (13L, "http://c.com/", 7L),
      (14L, "no-scheme", 999L)          // excluded
    ).toDF("doc_id", "url", "n_chars")
    val got = UrlOps.hostProfile(docs, "url", "doc_id", "n_chars")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("b.com") == (("v:b.com", 3L, 2L, 175L, 10L)), got.toString)
    assert(got("c.com") == (("v:c.com", 1L, 1L, 7L, 13L)), got.toString)
    assert(got.size == 2)
    // the host_key column is capAdmitBatch-compatible: encoded keys
    // pass the admit guard verbatim
    val consumed = got.map { case (_, (k, n, _, _, _)) => k -> n }
    DataPrep.capAdmitBatch(docs.filter(col("doc_id") =!= 14L)
      .withColumn("host", UrlOps.urlHost(col("url"))),
      consumed, "host", "doc_id", k = 5).collect() // must not throw
  }
}
