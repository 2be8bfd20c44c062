package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spec-truth PII fixtures: hand-written strings per class (true and
  * near-miss), NOT derived from q179's planted builder — a matched
  * plant⊗detect bug cannot pass here. */
class PiiSpec extends SparkSpec {

  private def scan(rows: (Long, String)*) = {
    import spark.implicits._
    Pii.piiScan(rows.toSeq.toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
  }

  test("per-class detection: true positives and shape near-misses") {
    val got = scan(
      1L -> "mail me at first.last+tag@sub.example.co today",
      2L -> "ssn is 123-45-6789.",
      3L -> "call 555-867-5309 or 555.867.5309 or 555 867 5309",
      4L -> "host 10.0.255.1 and 192.168.1.200",
      // near-misses: no-at email, 3-3-3 phone, 5-digit tail, 3-dot run
      // inside a longer digit string (no word boundary)
      5L -> "a.b.example.com 555-867-530 555-867-53099 1192.168.1.1234",
      6L -> "")
    assert(got(1L) == ((1L, 0L, 0L, 0L, 1L)), got(1L).toString)
    assert(got(2L) == ((0L, 1L, 0L, 0L, 1L)), got(2L).toString)
    assert(got(3L) == ((0L, 0L, 3L, 0L, 3L)), got(3L).toString)
    assert(got(4L) == ((0L, 0L, 0L, 2L, 2L)), got(4L).toString)
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L)), got(5L).toString)
    assert(got(6L) == ((0L, 0L, 0L, 0L, 0L)), got(6L).toString)
  }

  test("redaction: sequential order, placeholders, md5 pin, one stateless scan") {
    import spark.implicits._
    val t = "x a.b@c.io then 123-45-6789 then 555.867.5309 then 10.0.0.1 y"
    val red = Seq((1L, t)).toDF("id", "t")
      .select(Pii.redact(col("t")).as("r")).collect().head.getString(0)
    assert(red == "x <EMAIL> then <SSN> then <PHONE> then <IP> y", red)
    // the scan's pinned md5 matches the rendered redaction
    val row = Pii.piiScan(Seq((1L, t)).toDF("id", "t"), "id", "t")
      .collect().head
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getLong(6) == red.length.toLong &&
      row.getString(7) == expectMd5)
    // plan: pure projection — no exchange, no UDF
    val plan = Pii.piiScan(Seq((1L, "x")).toDF("id", "t"), "id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"),
      s"piiScan must be a stateless scan:\n$plan")
    // order sensitivity: a dotted-quad LOCAL part is swallowed by the
    // email redaction before the IP pass could split it ("1.2.3.4@x.com"
    // -> one <EMAIL>, not "<IP>@x.com"); a bare digit-TLD host is NOT an
    // email by the declared shape (TLD must be alphabetic), so the IP
    // class picks it up instead
    val e = Seq((1L, "note 1.2.3.4@example.com end")).toDF("id", "t")
      .select(Pii.redact(col("t")).as("r")).collect().head.getString(0)
    assert(e == "note <EMAIL> end", e)
    val f = Seq((1L, "u@1.2.3.4 only")).toDF("id", "t")
      .select(Pii.redact(col("t")).as("r")).collect().head.getString(0)
    assert(f == "u@<IP> only", f)
  }
}
