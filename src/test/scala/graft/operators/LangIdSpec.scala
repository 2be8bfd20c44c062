package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangIdSpec extends SparkSpec {

  // tiny bilingual corpus: character trigrams separate these cleanly
  private def labeled = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat and the dog ran", "en"),
      (2L, "the quick brown fox jumps over the lazy dog", "en"),
      (3L, "she sells sea shells on the sea shore", "en"),
      (4L, "le chat est sur la table et le chien dort", "fr"),
      (5L, "je ne parle pas tres bien le francais", "fr"),
      (6L, "les enfants jouent dans le jardin", "fr")
    ).toDF("doc_id", "text", "lang")
  }

  test("langIdModel: dense over langs x buckets, integer weights, pins recorded") {
    val model = LangId.langIdModel(labeled, "text", "lang", buckets = 64,
      scale = 1000000L)
    val rows = model.collect()
    assert(rows.length == 2 * 64, s"dense model must be langs*buckets, got ${rows.length}")
    assert(rows.forall(r => r.getInt(3) == 64 && r.getLong(4) == 1000000L))
    // smoothing: every weight strictly positive (add-1), and a bucket
    // with real mass outweighs an empty one within the same language
    assert(rows.forall(_.getLong(2) > 0L), "add-1 smoothing => w > 0")
    // per-language weights are a scaled probability: sum over buckets
    // of (c+1)/(tot+B) is ~1, so sum(w) is ~scale (floor error < B)
    val sums = rows.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(_.getLong(2)).sum }
    sums.foreach { case (l, s) =>
      assert(s > 1000000L - 64 && s <= 1000000L, s"$l weight mass $s") }
  }

  test("langIdScore: held-out docs predict their language; ties and short docs handled") {
    import spark.implicits._
    val model = LangId.langIdModel(labeled, "text", "lang", buckets = 64)
    val batch = Seq(
      (10L, "the cat and the dog sat on the shore"),
      (11L, "le chien est dans le jardin sur la table"),
      (12L, "xy") // < 3 chars -> no trigrams -> absent from output
    ).toDF("doc_id", "text")
    val got = LangId.langIdScore(batch, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(10L)._1 == "en", got.toString)
    assert(got(11L)._1 == "fr", got.toString)
    assert(!got.contains(12L), "sub-trigram docs must be absent, not mislabeled")
    assert(got.values.forall(_._2 > 0L), "scores are positive LONGs")
  }

  test("langIdScore: bit-stable under repartition (exact LONG scores)") {
    import spark.implicits._
    val model = LangId.langIdModel(labeled, "text", "lang", buckets = 64)
    val batch = Seq((10L, "the cat and the dog sat on the shore"),
      (11L, "le chien est dans le jardin")).toDF("doc_id", "text")
    val a = LangId.langIdScore(batch, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = LangId.langIdScore(batch.repartition(7), "doc_id", "text",
        model.repartition(5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b, s"$a != $b")
  }

  test("langIdScoreMargin: margin = top1 - top2, exact-majority flag, laws (VERDICT r14 #4)") {
    import spark.implicits._
    val model = LangId.langIdModel(labeled, "text", "lang", buckets = 64)
    val batch = Seq(
      (10L, "the cat and the dog sat on the shore"),
      (11L, "le chien est dans le jardin sur la table"),
      (12L, "xy") // < 3 chars -> below the trigram floor -> ABSENT
    ).toDF("doc_id", "text")
    // cross-check against the raw per-doc (lang, score) pairs via the
    // plain scorer run once per language filter
    val got = LangId.langIdScoreMargin(batch, "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toMap
    assert(got(10L)._1 == "en" && got(11L)._1 == "fr", got.toString)
    assert(!got.contains(12L), "sub-trigram docs must be absent")
    // with a 2-language model the margin always exists and is positive
    // here (clean separation), and s1 = s2 + margin reconstructs the
    // runner-up; majority flag == (2*s1 > s1 + s2)
    got.foreach { case (id, (_, s1, m, conf)) =>
      assert(m.nonEmpty && m.get > 0L, s"doc $id margin $m")
      val s2 = s1 - m.get
      assert(conf == (2L * s1 > s1 + s2), s"doc $id majority flag")
    }
    // single-language model: no runner-up -> margin NULL (refused), and
    // the top language trivially holds the whole mass -> confident
    val en = LangId.langIdModel(labeled.filter(col("lang") === "en"),
      "text", "lang", buckets = 64)
    val one = LangId.langIdScoreMargin(
      Seq((20L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text", en)
      .collect().head
    assert(one.getString(1) == "en" && one.isNullAt(3) && one.getBoolean(4))
    // agreement law: pred_lang/score identical to the plain scorer
    val plain = LangId.langIdScore(batch, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(plain == got.map { case (k, v) => k -> (v._1, v._2) })
  }

  test("langIdScore: empty model refused loudly; null lang refused at learn") {
    import spark.implicits._
    // a corpus with zero >= 3-char docs now refuses at FOLD time (no
    // shards to pin a hash space from), not silently later at score time
    val err0 = intercept[IllegalArgumentException] {
      LangId.langIdModel(
        Seq((1L, "ab", "en")).toDF("doc_id", "text", "lang"), // too short
        "text", "lang")
    }
    assert(err0.getMessage.contains("no shards"), err0.getMessage)
    // an empty model TABLE (e.g. a filtered-to-nothing stored artifact)
    // still refuses at score time
    val model = LangId.langIdModel(labeled, "text", "lang", buckets = 64)
    val err = intercept[IllegalArgumentException] {
      LangId.langIdScore(Seq((1L, "some text")).toDF("doc_id", "text"),
        "doc_id", "text", model.filter(lit(false)))
    }
    assert(err.getMessage.contains("empty"), err.getMessage)
    val nullLang = intercept[Exception] {
      LangId.langIdModel(
        Seq((1L, "enough text here", Option.empty[String]))
          .toDF("doc_id", "text", "lang"), "text", "lang").collect()
    }
    assert(nullLang.getMessage.contains("NULL lang"), nullLang.getMessage)
  }

  test("shard fold law: fold(disjoint shards) == learn-once, incl. parquet round-trip") {
    val once = LangId.langIdModel(labeled, "text", "lang", buckets = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val shardA = LangId.langIdCountShard(
      labeled.filter(col("doc_id") <= 2), "text", "lang", buckets = 64)
    val shardB = LangId.langIdCountShard(
      labeled.filter(col("doc_id") > 2), "text", "lang", buckets = 64)
    val folded = LangId.langIdModelFromShards(shardA.unionByName(shardB))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(folded == once, "fold(shards) must equal learn-once exactly")
    // parquet round-trip: stored shards re-read fold identically (the
    // artifact is LONG counts + an INT pin — nothing lossy)
    val dir = java.nio.file.Files.createTempDirectory("langid_shards").toString
    shardA.write.parquet(s"$dir/a")
    shardB.write.parquet(s"$dir/b")
    val reread = LangId.langIdModelFromShards(
        spark.read.parquet(s"$dir/a").unionByName(spark.read.parquet(s"$dir/b")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(reread == once, "parquet round-trip changed the folded model")
  }

  test("shard fold refuses mismatched hash-space pins") {
    val a = LangId.langIdCountShard(labeled, "text", "lang", buckets = 64)
    val b = LangId.langIdCountShard(labeled, "text", "lang", buckets = 128)
    val err = intercept[IllegalArgumentException] {
      LangId.langIdModelFromShards(a.unionByName(b))
    }
    assert(err.getMessage.contains("hash spaces"), err.getMessage)
  }
}
