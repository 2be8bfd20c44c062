package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Blocklist-generation laws on hand-written corpora (spec-truth, not
  * the q194 builder). */
class HostQualitySpec extends SparkSpec {

  private val longOk = "x" * 150

  private def gen(rows: Seq[(Long, String, String)], perMille: Long) = {
    import spark.implicits._
    HostQuality.hostQualityBlocklist(
        rows.toDF("id", "text", "host"),
        "id", "text", "host", minChars = 100L, badPerMille = perMille)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("damaged and short docs count as bad; threshold is an exact per-mille gate") {
    val rows = Seq(
      (1L, longOk + "�", "bad.com"), // replacement char
      (2L, "short", "bad.com"), // < minChars
      (3L, longOk, "bad.com"),
      (4L, longOk, "good.com"),
      (5L, longOk, "good.com"))
    // bad.com: 2/3 bad = 666‰
    assert(gen(rows, 600) ==
      Set(("v:bad.com", "deny_quality", 3L, 2L)), gen(rows, 600).toString)
    assert(gen(rows, 667) == Set.empty, gen(rows, 667).toString)
  }

  test("boundary: rate exactly AT the threshold denies (>=)") {
    val rows = Seq(
      (1L, "s", "h.com"), (2L, longOk, "h.com"),
      (3L, longOk, "h.com"), (4L, longOk, "h.com")) // 1/4 = 250‰
    assert(gen(rows, 250).nonEmpty && gen(rows, 251).isEmpty)
  }

  test("generated rows feed hostGate without re-keying") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "bad.com"), (2L, longOk, "ok.com"))
      .toDF("id", "text", "host")
      .withColumn("url", concat(lit("https://"), col("host"), lit("/p")))
    val list = HostQuality.hostQualityBlocklist(docs, "id", "text",
      "host", 100L, 200L)
    val kept = UrlOps.hostGate(docs, "url",
        list.select(col("host_key"), col("rule")))
      .select(col("id")).collect().map(_.getLong(0)).toList
    assert(kept == List(2L), kept.toString)
  }
}
