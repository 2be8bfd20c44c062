package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** PII detection + redaction — the privacy pass every production
  * training-data pipeline runs before tokenization (the C4/RefinedWeb
  * convention of stripping emails/phones/IPs), absent from the engine
  * until round 15. Four shape classes, each an RE2-compatible regex
  * (no lookarounds — DuckDB replays the same pattern verbatim):
  *
  *   - email    `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *   - ssn      `\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b`
  *   - phone    `\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b`
  *   - ipv4     `\b([0-9]{1,3}\.){3}[0-9]{1,3}\b`
  *
  * SHAPE detection, deliberately: a Luhn/validity check would need
  * per-char arithmetic the redact pass does not (a false-positive
  * redaction is cheap; a leaked true positive is not). Counts are per
  * class over the RAW text (independent — a string matching two
  * classes counts in both, documented); redaction is SEQUENTIAL in the
  * order above, most-specific first — an email is redacted before its
  * host's digit-dot runs could be re-read as an IPv4, and the digit
  * shapes are mutually disjoint by construction (SSN 3-2-4 vs phone
  * 3-3-4; an IPv4 octet always ends at a dot, never yielding a phone's
  * 4-digit tail). The order is still DECLARED semantics: both engines
  * replay it verbatim, so any future class overlap stays bit-equal.
  * Placeholders are angle-bracket tokens that the tokenizer keeps as
  * single words.
  *
  * All codegen `regexp_count`/`regexp_replace` columns — zero UDFs,
  * ONE stateless scan, no shuffle; redacted text is pinned as
  * (length, md5), never emitted (q66 convention).
  */
object Pii {

  /** (class name, RE2+Java-compatible pattern, placeholder) — ORDER is
    * the redaction order and is part of the declared semantics. */
  val classes: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"))

  /** Sequentially-redacted text column. */
  def redact(text: Column): Column =
    classes.foldLeft(text) { case (c, (_, pat, ph)) =>
      regexp_replace(c, pat, ph)
    }

  /** Per-doc PII audit: per-class counts over the raw text, the total,
    * and the redacted text's (len, md5) pin. */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = classes.map { case (name, pat, _) =>
      regexp_count(t, lit(pat)).cast("long").as(s"n_$name")
    }
    val red = redact(t)
    docs.select(
      (col(idCol) +: counts) ++ Seq(
        classes.map { case (name, _, _) => col(s"n_$name") }
          .reduce(_ + _).as("n_pii"),
        length(red).cast("long").as("redacted_len"),
        md5(red).as("redacted_md5")): _*)
  }

  // ---------------------------------------------------------------- q179
  // Planted-PII fixture (the q167 messy-fixture convention): the %7
  // rotation injects each class — email, SSN (3-2-4 digits: disjoint
  // from the 3-3-4 phone shape by construction), dotted phone, spaced
  // phone, IPv4 (whose trailing-dot octets can never produce the four
  // consecutive digits a phone tail needs), an email+IP pair on one
  // doc, and a no-PII control. Counts and the redacted md5
  // hash-compare.
  private def planted(): Column = {
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(7))
    val oct = pmod(col("doc_id"), lit(256)).cast("string")
    concat(col("text"), lit(" "),
      when(m === 0, concat(lit("contact user"), id, lit("@example"),
        pmod(col("doc_id"), lit(5)).cast("string"), lit(".com now")))
        .when(m === 1, lit("ssn 123-45-6789 on file"))
        .when(m === 2, lit("call 555.867.5309 today"))
        .when(m === 3, lit("call 555 867 5309 today"))
        .when(m === 4, concat(lit("server 10.0."), oct, lit(".7 up")))
        .when(m === 5, concat(lit("mail a.b@c.io from 192.168."), oct,
          lit(".255")))
        .otherwise(lit("no personal data here")))
  }

  private val plantedSql = """
      text || ' ' ||
      CASE CAST(doc_id % 7 AS INT)
        WHEN 0 THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example' || CAST(doc_id % 5 AS VARCHAR) || '.com now'
        WHEN 1 THEN 'ssn 123-45-6789 on file'
        WHEN 2 THEN 'call 555.867.5309 today'
        WHEN 3 THEN 'call 555 867 5309 today'
        WHEN 4 THEN 'server 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 up'
        WHEN 5 THEN 'mail a.b@c.io from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.255'
        ELSE 'no personal data here'
      END"""

  private val q179 = {
    // the Scala pattern string embeds verbatim: SQL single quotes keep
    // backslashes literal, and the classes contain no quotes
    val redactSql = classes.foldLeft("t") { case (e, (_, pat, ph)) =>
      s"regexp_replace($e, '$pat', '$ph', 'g')"
    }
    val countSql = classes.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(",\n             ")
    GraftQuery(
      "q179_pii_scan",
      (s, dir) => piiScan(
          Tables.documents(s, dir).withColumn("pt", planted()),
          "doc_id", "pt")
        .orderBy(col("doc_id")),
      Some(s"""
      WITH raw AS (SELECT doc_id, $plantedSql AS t FROM documents),
      c AS (SELECT doc_id,
             $countSql,
             $redactSql AS red
            FROM raw)
      SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4,
             CAST(n_email + n_ssn + n_phone + n_ipv4 AS BIGINT) AS n_pii,
             CAST(len(red) AS BIGINT) AS redacted_len,
             md5(red) AS redacted_md5
      FROM c
      ORDER BY doc_id"""))
  }

  val all: Seq[GraftQuery] = Seq(q179)
}
