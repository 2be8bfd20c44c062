package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Spec-truth fixtures for the audio/video header decoder: byte
  * sequences hand-written from the PUBLIC container specs (RIFF/WAVE
  * Multimedia Programming Interface, ISO 14496-12 §4.3), NOT produced
  * by the engine's own corpus builder — a matched encode/decode bug
  * cannot pass here even though it would survive q131's
  * construction⊗parse round trip.
  */
class MediaHeaderSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Int) =
    Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
  private def tag(t: String) = t.map(_.toInt)

  private def fmtChunk(ch: Int, rate: Int, bits: Int): Seq[Int] =
    tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * (bits / 8)) ++ le16(ch * (bits / 8)) ++ le16(bits)

  private def wav(pre: Seq[Int], ch: Int = 2, rate: Int = 44100,
      bits: Int = 16): Array[Byte] = {
    val body = pre ++ fmtChunk(ch, rate, bits) ++ tag("data") ++ le32(4) ++
      Seq(1, 2, 3, 4)
    bytes((tag("RIFF") ++ le32(4 + body.size) ++ tag("WAVE") ++ body): _*)
  }

  test("WAV: fmt chunk fields at RIFF spec offsets (LE)") {
    assert(MediaHeader.parse(wav(Nil)) === (("wav", 44100, 2, 16, "", 0L, 1L, true)))
    assert(MediaHeader.parse(wav(Nil, ch = 1, rate = 8000, bits = 8)) ===
      (("wav", 8000, 1, 8, "", 0L, 4L, true)))
  }

  test("WAV: chunk walk skips a LIST chunk before fmt (fmt-first is NOT assumed)") {
    // LIST chunk with 5 payload bytes — odd size, so the walk must also
    // honor the RIFF word-alignment pad byte
    val list = tag("LIST") ++ le32(5) ++ Seq('I', 'N', 'F', 'O', 'x', 0 /* pad */)
    assert(MediaHeader.parse(wav(list)) === (("wav", 44100, 2, 16, "", 0L, 1L, true)))
  }

  test("WAV: RIFF preamble without a parseable fmt chunk is wav but invalid") {
    // data chunk only — no fmt anywhere
    val noFmt = bytes((tag("RIFF") ++ le32(12) ++ tag("WAVE") ++
      tag("data") ++ le32(2) ++ Seq(7, 7)): _*)
    assert(MediaHeader.parse(noFmt) === (("wav", -1, -1, -1, "", -1L, -1L, false)))
    // fmt chunk declared but truncated mid-payload
    val cut = wav(Nil).take(24)
    assert(MediaHeader.parse(cut) === (("wav", -1, -1, -1, "", -1L, -1L, false)))
    // RIFF but not WAVE => not wav at all
    val avi = bytes((tag("RIFF") ++ le32(4) ++ tag("AVI ")): _*)
    assert(MediaHeader.parse(avi)._1 === "unknown")
  }

  test("MP4: ftyp box size 4BE at 0, brand ASCII at 8-11") {
    val mp4 = bytes((Seq(0, 0, 0, 20) ++ tag("ftyp") ++ tag("isom") ++
      Seq(0, 0, 0, 0) ++ tag("mp41")): _*)
    assert(MediaHeader.parse(mp4) === (("mp4", -1, -1, -1, "isom", -1L, -1L, true)))
    val cutBrand = mp4.take(9)
    assert(MediaHeader.parse(cutBrand) === (("mp4", -1, -1, -1, "", -1L, -1L, false)))
    // undersized box (spec minimum for ftyp is 16)
    val small = bytes((Seq(0, 0, 0, 8) ++ tag("ftyp") ++ tag("isom") ++
      Seq(0, 0, 0, 0)): _*)
    assert(MediaHeader.parse(small) === (("mp4", -1, -1, -1, "", -1L, -1L, false)))
    // non-printable brand bytes rejected
    val junkBrand = bytes((Seq(0, 0, 0, 20) ++ tag("ftyp") ++
      Seq(0x01, 0x02, 0x03, 0x04) ++ Seq(0, 0, 0, 0) ++ tag("isom")): _*)
    assert(MediaHeader.parse(junkBrand) === (("mp4", -1, -1, -1, "", -1L, -1L, false)))
  }

  test("WAV duration/sample metrics: exact integer div of header fields (VERDICT r14 #7)") {
    // ch=1, rate=8000, bits=16 -> byte_rate=16000, block_align=2;
    // data size 48000 -> 3000 ms, 24000 frames
    val body = fmtChunk(1, 8000, 16) ++ tag("data") ++ le32(48000) ++
      Seq.fill(48000)(0)
    val full = bytes((tag("RIFF") ++ le32(4 + body.size) ++ tag("WAVE") ++ body): _*)
    assert(MediaHeader.parse(full) === (("wav", 8000, 1, 16, "", 3000L, 24000L, true)))
    // DECLARED data size drives duration even when payload is truncated
    // (the header's promise is the curation-gate basis)
    val declared = fmtChunk(1, 8000, 16) ++ tag("data") ++ le32(32000) ++
      Seq(1, 2, 3, 4)
    val cut = bytes((tag("RIFF") ++ le32(4 + declared.size) ++ tag("WAVE") ++ declared): _*)
    assert(MediaHeader.parse(cut) === (("wav", 8000, 1, 16, "", 2000L, 16000L, true)))
    // fmt parses but no data chunk at all: valid, duration refused (-1)
    val noData = bytes((tag("RIFF") ++ le32(4 + fmtChunk(2, 44100, 16).size) ++
      tag("WAVE") ++ fmtChunk(2, 44100, 16)): _*)
    assert(MediaHeader.parse(noData) === (("wav", 44100, 2, 16, "", -1L, -1L, true)))
    // data BEFORE fmt (legal RIFF): both still found in one walk
    val dFirst = tag("data") ++ le32(16000) ++ Seq.fill(16000)(0) ++
      fmtChunk(1, 8000, 16)
    val dfw = bytes((tag("RIFF") ++ le32(4 + dFirst.size) ++ tag("WAVE") ++ dFirst): _*)
    assert(MediaHeader.parse(dfw) === (("wav", 8000, 1, 16, "", 1000L, 8000L, true)))
  }

  test("never throws on arbitrary bytes (pseudo-random sweep)") {
    var s = 0x9e3779b97f4a7c15L
    (0 until 2000).foreach { i =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val n = ((s >>> 33) % 64).toInt
      val b = new Array[Byte](n)
      var j = 0
      while (j < n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        b(j) = (s >>> 56).toByte
        j += 1
      }
      val r = MediaHeader.parse(b) // must not throw
      assert(Seq("wav", "mp4", "unknown").contains(r._1))
    }
    assert(MediaHeader.parse(Array.empty[Byte])._1 === "unknown")
  }

  test("chunk size near 2^31 walks past the end, never wraps negative (ADVICE r10)") {
    // 20-byte RIFF/WAVE declaring one chunk of size 0x7FFFFFFF: an Int
    // cursor would overflow to negative and index out of bounds
    def tag4(t: String): Seq[Int] = t.map(_.toInt)
    val evil = (tag4("RIFF") ++ Seq(0xff, 0xff, 0xff, 0x7f) ++ tag4("WAVE") ++
      tag4("data") ++ Seq(0xff, 0xff, 0xff, 0x7f)).map(_.toByte).toArray
    assert(MediaHeader.parse(evil) === (("wav", -1, -1, -1, "", -1L, -1L, false)))
    // full-range u32 size (0xFFFFFFFF) likewise
    val evil2 = (tag4("RIFF") ++ Seq(0xff, 0xff, 0xff, 0xff) ++ tag4("WAVE") ++
      tag4("LIST") ++ Seq(0xff, 0xff, 0xff, 0xff)).map(_.toByte).toArray
    assert(MediaHeader.parse(evil2) === (("wav", -1, -1, -1, "", -1L, -1L, false)))
  }
}
