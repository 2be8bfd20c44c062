package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

/** The native shingle expression must reproduce the builtin composition
  * exactly on real corpus text and on the edge cases (short docs,
  * repeated shingles, w variants).
  */
class WordShinglesSpec extends SparkSpec {

  test("native shingles == builtin composition on the documents corpus") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
      .select(tokens(col("text")).as("t"))
    val diff = docs.select(
      shingles(col("t")).as("fast"), shinglesReference(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0)
  }

  test("edge cases: short docs, repeats, and w=2/w=5 variants") {
    import spark.implicits._
    val df = Seq(
      "a b c d e",             // plain
      "a a a a",               // repeated tokens → repeated shingles dedup
      "x y",                   // fewer than w tokens → empty
      "q",                     // single token
      "p q r"                  // exactly w tokens → one shingle
    ).toDF("s").select(tokens(col("s")).as("t"))
    for (w <- Seq(2, 3, 5)) {
      val diff = df.select(
        shingles(col("t"), w).as("fast"), shinglesReference(col("t"), w).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(diff == 0, s"w=$w")
    }
    // spot-check values through the native path
    val got = df.select(shingles(col("t")).as("sh")).collect()
      .map(_.getSeq[String](0).toList)
    assert(got(0) == List("a b c", "b c d", "c d e"))
    assert(got(1) == List("a a a"))
    assert(got(2) == Nil && got(3) == Nil)
    assert(got(4) == List("p q r"))
  }
}
