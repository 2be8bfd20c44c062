package graft.mr

import graft.SparkSpec

/** Ports of the reference's golden unit tests (FIXTURES.md §A; original
  * yamr tests/test_base_mappers.py, tests/test_reducers.py) with correct
  * group semantics.
  */
class JobsSpec extends SparkSpec {

  // A1 — word-count map goldens (test_base_mappers.py:7-41)
  test("tokenize: duplicates preserved pre-reduce") {
    assert(Jobs.tokenize("aa yy jj aa") == Seq("aa", "yy", "jj", "aa"))
  }
  test("tokenize: whitespace runs") {
    assert(Jobs.tokenize("  aa cc   yy jj   aa") == Seq("aa", "cc", "yy", "jj", "aa"))
  }
  test("tokenize: , and . stripped") {
    assert(Jobs.tokenize("  aa cc.   yy jj,   aa") == Seq("aa", "cc", "yy", "jj", "aa"))
  }
  test("tokenize: newlines") {
    assert(Jobs.tokenize("aa cc\naa bb") == Seq("aa", "cc", "aa", "bb"))
  }
  test("tokenize: null input maps to nothing (word_count.py:13-14)") {
    assert(Jobs.tokenize(null) == Seq.empty)
  }
  test("tokenize: unicode word chars (onegin corpus is Russian)") {
    assert(Jobs.tokenize("Мой дядя") == Seq("мой", "дядя"))
  }

  // A2 — max-temp map/reduce goldens (test_base_mappers.py:43-58)
  test("max-temp map: tuple-string fixture") {
    assert(Jobs.parseTempPairs("(201504, 31.2), (201503, 42)") ==
      Seq((2015, 31.2), (2015, 42.0)))
  }
  test("max-temp map: JSON corpus format (temperature.json)") {
    assert(Jobs.parseTempPairs("[[201501, 31.2],[201307, 32]]") ==
      Seq((2015, 31.2), (2013, 32.0)))
  }
  test("max-temp reduce: MAX per key") {
    import spark.implicits._
    val in = Seq("(201504, 31.2), (201501, 41), (201601, 11)").toDS()
    val got = Jobs.maxYearTemp(in).collect().sortBy(_._1).toSeq
    assert(got == Seq((2015, 41.0), (2016, 11.0)))
  }

  // A3 — reduce/group goldens (test_reducers.py:6-23)
  test("wordcount end-to-end reduce golden") {
    import spark.implicits._
    val in = Seq("a a a cc dd dd zz zz").toDS()
    val got = Jobs.wordCount(in).collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 3L), ("cc", 1L), ("dd", 2L), ("zz", 2L)))
  }
  test("bug-regression (SURVEY §2.4): unsorted multi-mapper input groups correctly") {
    import spark.implicits._
    // reference emits [(b,0),(a,1),(b,1)] for this input; we assert the
    // intended semantics: one group per key
    val in = Seq("b", "a").toDS() // two "mappers", keys arrive unsorted
    val got = Jobs.wordCount(in).collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L), ("b", 1L)))
  }

  // A5 — multi-mapper shuffle fixture (reducer.py:189-195: map1+map2 only)
  test("multi-mapper concat reduces to per-key totals") {
    import spark.implicits._
    val map1 = "a a a b b"
    val map2 = "a b b d"
    val got = Jobs.wordCount(Seq(map1, map2).toDS()).collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 4L), ("b", 4L), ("d", 1L)))
  }

  // A6 — E2E corpus: alice word count matches a single-process count
  test("alice corpus: distributed count == naive single-process count") {
    val path = "/root/reference/alice"
    assume(new java.io.File(path).exists())
    import spark.implicits._
    val text = spark.read.textFile(path)
    val dist = Jobs.wordCount(text).collect().toMap
    val naive = scala.io.Source.fromFile(path, "UTF-8").getLines()
      .flatMap(Jobs.tokenize).toSeq.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    assert(dist.size == naive.size)
    assert(dist("alice") == naive("alice"))
    assert(dist == naive)
  }

  test("generic mapReduce: fully-general reduce contract (1 group → N rows)") {
    import spark.implicits._
    val ds = Seq("x y x", "y z").toDS()
    val out = MapReduce.mapReduce(ds)(
      (s: String) => s.split(" ").map(_ -> 1),
      (k: String, vs: Iterator[Int]) => {
        val n = vs.sum
        if (n > 1) Seq(k -> n, s"${k}_dup" -> n) else Seq(k -> n)
      }).collect().sortBy(_._1).toSeq
    assert(out == Seq(("x", 2), ("x_dup", 2), ("y", 2), ("y_dup", 2), ("z", 1)))
  }
}
