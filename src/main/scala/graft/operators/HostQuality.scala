package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Host-quality blocklist GENERATION — closing the hygiene loop: q170
  * consumes a stored `(host_key, rule)` blocklist; this is the engine
  * operator that PRODUCES one from per-document quality evidence (the
  * spam-domain pass every crawl corpus runs: a host whose documents
  * are mostly damaged or empty is a bad host, drop it wholesale).
  *
  * Evidence is exact-integer only (the house determinism scheme): a
  * document is BAD iff it fails the [[Profiler.encodingAudit]] `ok`
  * verdict (replacement chars / strays / mojibake) or is shorter than
  * `minChars`. A host is denied iff
  * `n_bad * 1000 >= badPerMille * n_docs` — one integer comparison,
  * no doubles. Emitted rows carry the [[UrlOps]] `v:` host-key
  * encoding, so the generated list feeds [[UrlOps.hostGate]] /
  * [[UrlOps.hostGateLedger]] with zero re-keying (the contract q170
  * validates loudly).
  *
  * Scale: one stateless audit scan + one hash-agg on host (wordcount
  * class); the emitted list is hosts-sized — it BROADCASTS into the
  * gate, which is the point.
  */
object HostQuality {

  /** Deny-rows for hosts whose bad-document rate is at least
    * `badPerMille`/1000: `(host_key, rule, n_docs, n_bad)`. */
  def hostQualityBlocklist(docs: DataFrame, idCol: String,
      textCol: String, hostCol: String, minChars: Long,
      badPerMille: Long): DataFrame = {
    require(badPerMille >= 1 && badPerMille <= 1000,
      s"badPerMille must be in [1, 1000], got $badPerMille")
    val audit = Profiler.encodingAudit(docs, idCol, textCol)
    val bad = !col("ok") || col("n_chars") < minChars
    docs.select(col(idCol), col(hostCol).as("__host"))
      .join(audit, Seq(idCol))
      .groupBy(col("__host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(bad, 1L).otherwise(0L)).as("n_bad"))
      .filter(col("n_bad") * 1000L >= lit(badPerMille) * col("n_docs"))
      .select(concat(lit("v:"), col("__host")).as("host_key"),
        lit("deny_quality").as("rule"),
        col("n_docs"), col("n_bad"))
  }

  // ---------------------------------------------------- fixture corpus
  // Planted damage: hosts whose source ordinal is divisible by 3 get a
  // U+FFFD appended to 3/4 of their documents (doc_id % 4 != 3) —
  // those hosts' bad rate is >= 750‰ and MUST trip the 200‰ threshold;
  // other hosts trip only if >= 20% of their documents are naturally
  // shorter than minChars (data-derived, replayed identically by the
  // oracle either way).
  private def plantedText(): Column =
    when(pmod(expr("CAST(substring(source, 4) AS INT)"), lit(3)) === 0 &&
      pmod(col("doc_id"), lit(4)) =!= 3,
      concat(col("text"), lit("�"))).otherwise(col("text"))

  private val plantedSql = """
      CASE WHEN CAST(substring(source, 4) AS INT) % 3 = 0 AND doc_id % 4 <> 3
           THEN text || chr(65533) ELSE text END"""

  // the audit + threshold replayed once, shared by both oracles
  private val denyCtes = s"""
      px AS (SELECT doc_id, source, source || '.example.com' AS host,
                    $plantedSql AS t2
             FROM documents),
      au AS (SELECT doc_id, host,
               (NOT (len(regexp_extract_all(t2, '\\x{FFFD}')) = 0
                     AND len(regexp_extract_all(t2, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]')) = 0
                     AND len(regexp_extract_all(t2, '[ÃÂ]')) * 1000 <= len(t2))
                OR len(t2) < 100) AS bad
             FROM px),
      agg AS (SELECT host, COUNT(*) AS n_docs,
                     SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS n_bad
              FROM au GROUP BY host),
      deny AS (SELECT host, n_docs, n_bad FROM agg
               WHERE n_bad * 1000 >= 200 * n_docs)"""

  private val q194 = GraftQuery(
    "q194_host_blocklist",
    (s, dir) => hostQualityBlocklist(
        Tables.documents(s, dir)
          .withColumn("t2", plantedText())
          .withColumn("host", concat(col("source"), lit(".example.com"))),
        "doc_id", "t2", "host", minChars = 100L, badPerMille = 200L)
      .orderBy(col("host_key")),
    Some(s"""
      WITH $denyCtes
      SELECT 'v:' || host AS host_key, 'deny_quality' AS rule,
             CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_bad AS BIGINT) AS n_bad
      FROM deny
      ORDER BY host_key"""))

  // --------------------------------------------------------------- q194b
  // The loop CLOSED end to end: the generated list drops straight into
  // the q170 gate (broadcast anti join on the v: key — the corpus
  // never shuffles), no re-keying, no stored intermediate. Output is
  // the surviving corpus keyed rows.
  private val q194b = GraftQuery(
    "q194b_blocklist_roundtrip",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("t2", plantedText())
        .withColumn("host", concat(col("source"), lit(".example.com")))
      val list = hostQualityBlocklist(docs, "doc_id", "t2", "host",
        minChars = 100L, badPerMille = 200L)
      UrlOps.hostGate(
          docs.withColumn("url", concat(lit("https://"), col("host"),
            lit("/p/"), col("doc_id").cast("string"))),
          "url", list.select(col("host_key"), col("rule")))
        .select(col("doc_id"), col("host"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $denyCtes
      SELECT doc_id, source || '.example.com' AS host
      FROM documents
      WHERE source || '.example.com' NOT IN (SELECT host FROM deny)
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q194, q194b)
}
