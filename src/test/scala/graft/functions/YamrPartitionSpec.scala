package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Partitioner goldens (FIXTURES.md §A4; original yamr
  * tests/test_partition.py:12-47), byte-for-byte.
  */
class YamrPartitionSpec extends SparkSpec {

  private def part(key: String, n: Int): Int =
    YamrPartition.compute(UTF8String.fromString(key), n)

  test("pinned hash values (test_partition.py:43-47)") {
    assert(part("aa", 3) == 2)
    assert(part("moasold", 3) == 1)
    assert(part("bbsa", 4) == 1)
  }

  test("region grouping with 1-based ids and within-region key sort (mapper.py:124-136)") {
    def regions(tuples: Seq[(String, Int)], n: Int): Map[Int, Seq[(String, Int)]] =
      tuples.groupBy { case (k, _) => part(k, n) + 1 }
        .view.mapValues(_.sortBy(_._1)).toMap

    assert(regions(Seq("aa" -> 1, "bb" -> 1, "cc" -> 1), 1) ==
      Map(1 -> Seq("aa" -> 1, "bb" -> 1, "cc" -> 1)))
    assert(regions(Seq("mm" -> 1, "cc" -> 1, "bb" -> 1, "aa" -> 1, "mm" -> 1), 2) ==
      Map(1 -> Seq("bb" -> 1), 2 -> Seq("aa" -> 1, "cc" -> 1, "mm" -> 1, "mm" -> 1)))
    assert(regions(Seq("nlll" -> 1, "moscow" -> 1, "innopolis" -> 1, "kazan" -> 1), 3) ==
      Map(1 -> Seq("innopolis" -> 1), 2 -> Seq("moscow" -> 1), 3 -> Seq("kazan" -> 1, "nlll" -> 1)))
  }

  test("catalyst expression evaluates and codegens in a query") {
    import spark.implicits._
    val df = Seq("aa", "moasold", "bbsa").toDF("k")
      .select(col("k"), YamrPartition(col("k"), 3).as("p"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("aa" -> 2, "moasold" -> 1, "bbsa" -> 0))
    assert(part("bbsa", 3) == 0)
  }

  test("empty key does not throw (Python int('',16) would)") {
    assert(part("", 5) == 0)
  }

  test("repartition by yamr hash reproduces reference data placement") {
    import spark.implicits._
    val n = 3
    val df = Seq("aa", "bb", "cc", "mm", "nlll", "moscow", "innopolis", "kazan")
      .toDF("k")
      .repartition(n, YamrPartition(col("k"), n))
    assert(df.rdd.getNumPartitions == n)
    // every key must land with all equal keys (content-defined placement)
    val placements = df.rdd.mapPartitionsWithIndex { (i, it) =>
      it.map(r => r.getString(0) -> i)
    }.collect().toMap
    assert(placements.size == 8)
  }
}
