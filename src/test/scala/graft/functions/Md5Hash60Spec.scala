package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Md5Hash60Spec extends SparkSpec {

  test("native expression equals the conv(substring(md5)) reference form") {
    import spark.implicits._
    val samples = (Seq("", "a", "abc", "the quick brown fox", "мой дядя",
      "0:tok1 tok2 tok3", "7:x") ++ (1 to 200).map(i => s"shingle $i body")).toDF("s")
    val bad = samples
      .select(col("s"),
        TextFunctions.hash60(col("s")).as("native"),
        TextFunctions.hash60Reference(col("s")).as("ref"))
      .filter(col("native") =!= col("ref"))
      .collect()
    assert(bad.isEmpty, s"divergent hashes: ${bad.take(3).mkString(",")}")
  }

  test("known value pins the bit layout") {
    // md5("abc") = 900150983cd24fb0... → first 15 hex digits base-16
    val expected = java.lang.Long.parseLong("900150983cd24fb", 16)
    assert(Md5Hash60.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")) == expected)
  }
}
