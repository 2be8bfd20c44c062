package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined-chunking laws (spec-truth, not the q196 builder). */
class CdcSpec extends SparkSpec {

  private def chunks(text: String) = {
    import spark.implicits._
    Extraction.cdcChunks(Seq((1L, text)).toDF("id", "text"), "id", "text")
      .orderBy(col("chunk_no")).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getString(4))).toList
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "small engines shuffle partitions across the cluster floor " * 12

  test("chunks tile the document exactly: starts/lengths reassemble to len") {
    val cs = chunks(base)
    assert(cs.nonEmpty && cs.head._1 == 0L)
    assert(cs.map(_._2).sum == base.length.toLong, cs.toString)
    assert(cs.sliding(2).forall {
      case List(a, b) => a._1 + a._2 == b._1
      case _ => true
    }, "chunks must be contiguous")
  }

  test("short and empty documents: one whole chunk / zero chunks") {
    assert(chunks("tiny") == List((0L, 4L, md5hex("tiny"))))
    assert(chunks("").isEmpty)
  }

  test("edit locality: a prefix insertion preserves almost every chunk hash") {
    val a = chunks(base).map(_._3)
    val b = chunks("INSERTED PREFIX >>> " + base).map(_._3)
    val shared = a.toSet.intersect(b.toSet).size
    // only chunks overlapping the edit may change; with ~64-char
    // expected chunks a 20-char prefix can touch at most the first one
    assert(shared >= a.size - 2,
      s"expected >= ${a.size - 2} shared chunk hashes, got $shared " +
        s"(of ${a.size} / ${b.size})")
    // and the FIXED-window chunker demonstrably lacks the property:
    // every q172 window after the edit shifts
  }

  private def md5hex(s: String): String = {
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("CdcBoundaries ≡ the explode/ascii/substr composition (r18 rework)") {
    import spark.implicits._
    // ASCII, Latin-1, CJK, astral, window-edge lengths, and a text
    // engineered to hit boundaries — the codepoint-semantics edges the
    // native walk must reproduce exactly (substr counts an astral char
    // as ONE position; ascii returns the full codepoint)
    val rows = Seq(
      1L -> base,
      2L -> "tiny",
      3L -> "",
      4L -> "exactly8",
      5L -> "exactly9!",
      6L -> ("naïve café déjà-vu résumé " * 40),
      7L -> ("漢字テキストの境界検出を確認する " * 30),
      8L -> ("mixed ascii 漢字 und ümlauts with 😀 astral " * 25),
      9L -> ("😀😁😂" * 30))
      .toDF("id", "text")
    val native = rows.select(col("id"),
      graft.functions.CdcBoundaries(col("text")).as("bps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val ref = Extraction.cdcBoundariesReference(rows, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    rows.select("id").collect().map(_.getLong(0)).foreach { id =>
      assert(native(id) == ref.getOrElse(id, Nil),
        s"doc $id: native ${native(id)} vs reference ${ref.get(id)}")
    }
    // at least one fixture must actually produce boundaries, or the
    // equivalence is vacuous
    assert(native.values.exists(_.nonEmpty), "no boundaries anywhere")
  }

  test("malformed UTF-8 (ADVICE r18): truncated/invalid bytes never throw; native == reference") {
    import spark.implicits._
    // Spark does not validate UTF-8 (cast(binary as string) reinterprets
    // raw bytes), so truncated multi-byte tails and invalid lead bytes
    // are reachable corpus states. pad: enough valid prefix that windows
    // exist; tail: the malformed bytes.
    val pad = base.take(400).getBytes("UTF-8") // long enough to carry real boundaries
    def doc(tail: Int*) : Array[Byte] = pad ++ tail.map(_.toByte).toArray
    val fixtures: Seq[(Long, Array[Byte])] = Seq(
      (1L, doc(0xC3)),                   // truncated 2-byte seq at end
      (2L, doc(0xE4, 0xB8)),             // truncated 3-byte seq at end
      (3L, doc(0xF0, 0x9F, 0x98)),       // truncated 4-byte seq at end
      (4L, doc(0x80, 0x81, 0xBF, 0x41)), // lone continuation bytes
      (5L, doc(0xF8, 0x41, 0x42)),       // 5-byte lead (invalid in Unicode)
      (6L, doc(0xFE, 0xFF, 0x41)),       // never-valid leads
      (7L, doc(0xC3, 0x28)),             // 2-byte lead + non-continuation
      (8L, pad ++ "正常なテキスト".getBytes("UTF-8") ++ Array(0xED.toByte, 0xA0.toByte)))
    val rows = fixtures.toDF("id", "b")
      .select(col("id"), col("b").cast("string").as("text"))
    val native = rows.select(col("id"),
      graft.functions.CdcBoundaries(col("text")).as("bps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val ref = Extraction.cdcBoundariesReference(rows, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    fixtures.map(_._1).foreach { id =>
      assert(native(id) == ref.getOrElse(id, Nil),
        s"doc $id: native ${native(id)} vs reference ${ref.get(id)}")
    }
    assert(native.values.exists(_.nonEmpty), "no boundaries anywhere")
  }
}
