package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Property tests: the native codegen'd expressions must agree with
  * their builtin reference compositions on ARBITRARY inputs, not just
  * the corpus — random token arrays (any length incl. empty) and random
  * double vectors (negatives, zeros, non-terminating fractions).
  * Deterministic seed chain (no flaky CI), 30 samples per law.
  */
class NativeExprPropertySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session
  private val params = Gen.Parameters.default

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val r = g.apply(params, seed)
      seed = seed.next
      r
    }
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tokenArrays: Gen[List[List[String]]] =
    Gen.nonEmptyListOf(Gen.listOf(token))

  test("WordShingles == builtin composition on arbitrary token arrays") {
    import spark.implicits._
    for {
      (docs, i) <- samples(tokenArrays, 15).zipWithIndex
      w <- Seq(1 + i % 5, 3)
    } {
      val df = docs.map(_.toArray).toDF("t")
      val diff = df.select(
        shingles(col("t"), w).as("fast"),
        shinglesReference(col("t"), w).as("ref"))
        .filter(not(col("fast") <=> col("ref"))).count()
      assert(diff == 0, s"sample $i w=$w")
    }
  }

  test("WordNGrams == builtin composition on arbitrary token arrays") {
    import spark.implicits._
    for {
      (docs, i) <- samples(tokenArrays, 15).zipWithIndex
      w <- Seq(2, 1 + i % 4)
    } {
      val df = docs.map(_.toArray).toDF("t")
      val t = col("t")
      val ref = when(size(t) >= w,
        transform(sequence(lit(1), size(t) - (w - 1)), j =>
          concat_ws(" ", (0 until w).map(o => element_at(t, j + lit(o))): _*)))
        .otherwise(array().cast("array<string>"))
      val diff = df.select(WordNGrams(t, w).as("fast"), ref.as("ref"))
        .filter(not(col("fast") <=> col("ref"))).count()
      assert(diff == 0, s"sample $i w=$w")
    }
  }

  test("OrderedPairs == nested-transform composition on arbitrary long arrays") {
    import spark.implicits._
    val longArrays = Gen.nonEmptyListOf(Gen.listOf(Gen.choose(0L, 1000L)))
    samples(longArrays, 20).zipWithIndex.foreach { case (arrs, i) =>
      val df = arrs.map(_.toArray).toDF("ds")
      val ref = expr(
        """flatten(transform(ds, (x, i) ->
           |  transform(slice(ds, i + 2, size(ds)),
           |            y -> named_struct('da', x, 'db', y))))""".stripMargin)
      val diff = df.select(OrderedPairs(col("ds")).as("fast"), ref.as("ref"))
        .filter(not(col("fast") <=> col("ref"))).count()
      assert(diff == 0, s"sample $i")
    }
  }

  private val vec: Gen[List[Double]] =
    Gen.listOf(Gen.chooseNum(-1000000, 1000000).map(_ / 9.7))

  test("DotProduct / SquaredDistance == HOF folds on arbitrary vectors") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(vec), 30).zipWithIndex.foreach { case (vs, i) =>
      // pair each vector with its reverse so lengths always match
      val df = vs.map(v => (v.toArray, v.reverse.toArray)).toDF("a", "b")
      val rows = df.select(
        DotProduct(col("a"), col("b")).as("nd"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (s, v) => s + v).as("hd"),
        SquaredDistance(col("a"), col("b")).as("nq"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (s, v) => s + v).as("hq"))
        .collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"dot, sample $i")
        assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)), s"sqdist, sample $i")
      }
    }
  }

  test("BoundaryBucket == interpreted strictly-below fold, incl. ties/duplicates") {
    import spark.implicits._
    val bGen: Gen[List[Double]] = for {
      base <- Gen.nonEmptyListOf(Gen.chooseNum(-500, 500).map(_ / 7.3))
      dups <- Gen.someOf(base) // force duplicate boundaries (hot quantiles)
    } yield (base ++ dups).sorted
    samples(bGen, 25).zipWithIndex.foreach { case (bs, i) =>
      val boundaries = bs.toArray
      // probe values: the boundaries themselves (exact ties), midpoints,
      // and out-of-range extremes
      val probes = (boundaries ++ boundaries.map(_ + 0.01) ++
        boundaries.map(_ - 0.01) ++ Array(-1e9, 1e9)).toSeq
      val got = probes.toDF("v").select(
        BoundaryBucket(col("v"), boundaries).as("nb"),
        aggregate(array(boundaries.map(lit).toIndexedSeq: _*), lit(0),
          (acc, b) => acc + when(col("v").cast("double") > b, 1).otherwise(0))
          .as("fb"))
        .collect()
      got.foreach(r => assert(r.getInt(0) == r.getInt(1), s"sample $i"))
    }
  }
}
