package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  /** 20 separated clusters × 20 members, small jitter — same-cluster
    * cosine ≈ 1, cross-cluster ≈ random.
    */
  private def clustered() = {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(11)
    val rows = for { c <- 0 until 20; m <- 0 until 20 } yield {
      val centroid = Array.tabulate(dim)(j => math.sin(c * 131.7 + j * 7.3) * 10.0)
      ((c * 20 + m).toLong, centroid.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF ANN achieves high recall vs brute force on clustered vectors") {
    val df = clustered()
    val ivf = Similarity.ivfTopK(df, col("vec_id") < 20, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // brute force ground truth
    val e = df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        (Similarity.dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id"))
    val bf = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (ivf & bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9")
  }

  test("IVF returns k results per query when cells are populated") {
    val got = Similarity.ivfTopK(clustered(), col("vec_id") < 20, k = 5,
      nlist = 16, nprobe = 4).groupBy("qid").count().collect()
    assert(got.length == 20)
    got.foreach(r => assert(r.getLong(1) == 5, s"query ${r.getLong(0)}"))
  }
}
