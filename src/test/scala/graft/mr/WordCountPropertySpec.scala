package graft.mr

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests: the distributed pipeline must equal the naive
  * single-process computation for arbitrary inputs (SURVEY §5 strategy).
  * Raw ScalaCheck generators sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class WordCountPropertySpec extends SparkSpec {

  private val lineGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf(" ", "\n", ",", ".", "!", "  "),
    Gen.oneOf("aa", "bb", "мой", "j_7"))).map(_.mkString(" "))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: distributed word count == naive count for arbitrary corpora") {
    import spark.implicits._
    (1 to 10).foreach { i =>
      val lines = sample(Gen.listOfN(8, lineGen), i * 7919L)
      val dist = Jobs.wordCount(lines.toDS()).collect().toMap
      val naive = lines.flatMap(Jobs.tokenize)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      assert(dist == naive, s"seed ${i * 7919L}")
    }
  }

  test("property: yamr partition function is total and stable in [0, n)") {
    (1 to 100).foreach { i =>
      val key = sample(Gen.asciiPrintableStr, i * 31L)
      val n = 1 + (i % 64)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
      val p = graft.functions.YamrPartition.compute(u, n)
      val p2 = graft.functions.YamrPartition.compute(u, n)
      assert(p == p2 && p >= 0 && p < n, s"key=$key n=$n p=$p")
    }
  }
}
