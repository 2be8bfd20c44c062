package graft.sources

import java.io.InputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GzipMember

/** Streaming WARC framing (VERDICT r17 next #3): the same framing laws
  * as [[WarcSource.splitRecordBytes]] / [[WarcSource.gunzipMembers]],
  * driven from a bounded-buffer read over the Hadoop FS input instead
  * of one whole-file byte array per task — so FILE size is no longer a
  * memory bound (the `binaryFile` path holds one ~2 GB-capped JVM
  * array per file and, for `.warc.gz`, the fully inflated stream on
  * top). Per-task memory here is O(current record) + O(read chunk):
  * a 100 GB `.warc` streams fine as long as individual RECORDS stay
  * JVM-array-sized — which the format guarantees by construction for
  * well-formed input (records are Content-Length-bounded) and the
  * resync path bounds by the gap between magics.
  *
  * Law parity with the batch splitter is spec-pinned
  * (WarcStreamSpec: streaming == batch byte-for-byte on every framing
  * fixture, with chunk sizes smaller than every record to force
  * refills mid-pattern). Two DOCUMENTED divergences, both only
  * reachable past the batch path's own hard failure wall:
  *   - a single record spanning > [[WarcStreamFramer.MaxRecord]]
  *     (~2 GB, the JVM array bound) is truncated there and framing
  *     resyncs after it — the batch path can't load such a file at
  *     all;
  *   - [[GzipMemberStream]] has no analogue of
  *     [[WarcSource.gunzipMembers]]'s 2 GB keep-prefix output cap,
  *     because there is no whole-output array to cap — members past
  *     2 GB of cumulative output keep streaming.
  */
final class WarcStreamFramer(in: InputStream, chunk: Int = 1 << 20)
    extends Iterator[Array[Byte]] {
  require(chunk >= 16, s"chunk must be >= 16 bytes, got $chunk")

  import WarcSource.{MagicBytes => Magic, SepBytes => Sep, ClRe}

  private var buf = new Array[Byte](chunk)
  private var len = 0
  private var eof = false
  private var pending: Array[Byte] = _
  private var drained = false

  override def hasNext: Boolean = {
    if (pending == null && !drained) {
      pending = advance()
      if (pending == null) drained = true
    }
    pending != null
  }

  override def next(): Array[Byte] = {
    if (!hasNext) throw new NoSuchElementException("WarcStreamFramer")
    val r = pending; pending = null; r
  }

  // ------------------------------------------------------- buffering
  /** Read one more chunk; false when the source is exhausted. */
  private def more(): Boolean = {
    if (eof) return false
    if (len == buf.length) {
      val target = math.min(buf.length.toLong * 2,
        WarcStreamFramer.MaxRecord.toLong).toInt
      if (target <= buf.length) return false // at the record ceiling
      buf = java.util.Arrays.copyOf(buf, target)
    }
    val n = in.read(buf, len, buf.length - len)
    if (n < 0) { eof = true; false } else { len += n; true }
  }

  /** Grow until `n` buffered bytes or source end / record ceiling. */
  private def ensure(n: Long): Boolean = {
    while (len < n && more()) {}
    len >= n
  }

  private def indexIn(pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = len - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && buf(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Emit buf[0, end) and slide the remainder to the front. */
  private def consume(end: Int): Array[Byte] = {
    val r = java.util.Arrays.copyOfRange(buf, 0, end)
    System.arraycopy(buf, end, buf, 0, len - end)
    len -= end
    r
  }

  /** Discard bytes until the buffer starts with the record magic
    * (batch: `p = indexOf(b, Magic, end)`) — dropped garbage never
    * accumulates (only a magic-length-1 tail is retained per chunk). */
  private def seekMagic(): Boolean = {
    while (true) {
      val i = indexIn(Magic, 0)
      if (i >= 0) { if (i > 0) consume(i); return true }
      val keep = math.min(len, Magic.length - 1)
      if (keep < len) consume(len - keep) // sic: drop the HEAD, keep tail
      if (!more() && len < Magic.length) return false
    }
    false // unreachable
  }

  // --------------------------------------------------------- framing
  /** One record, by the batch splitter's exact decision order: find
    * the first header separator AND the first next-magic; header
    * parse only when the separator comes first; length jump when
    * Content-Length parses and the body fits before EOF; resync to
    * the next magic (or end) otherwise. */
  private def advance(): Array[Byte] = {
    if (!seekMagic()) return null
    // concurrent first-occurrence scan; "not found" is only trusted
    // once the buffer extends past every possible earlier partial
    // match of the OTHER pattern (boundary-straddling starts)
    var sepAt = -1
    var magAt = -1
    var decided = false
    var sepFirst = false
    while (!decided) {
      sepAt = indexIn(Sep, 0)
      magAt = indexIn(Magic, Magic.length)
      if (sepAt >= 0 && magAt >= 0) { decided = true; sepFirst = sepAt < magAt }
      else if (sepAt >= 0) {
        if (eof || sepAt <= len - Magic.length) { decided = true; sepFirst = true }
        else if (!more()) { decided = true; sepFirst = true }
      } else if (magAt >= 0) {
        if (eof || magAt <= len - Sep.length) { decided = true; sepFirst = false }
        else if (!more()) { decided = true; sepFirst = false }
      } else if (!more()) { decided = true } // neither in the whole input
    }
    if (!decided || (sepAt < 0 && magAt < 0))
      return consume(len) // rest-of-input record (batch: end = b.length)
    if (!sepFirst) return consume(magAt) // resync record
    // header path
    val hdr = new String(buf, 0, sepAt, UTF_8)
    ClRe.findFirstMatchIn(hdr).map(_.group(1).toLong) match {
      case Some(cl) =>
        val e = sepAt.toLong + Sep.length + cl + Sep.length
        if (e <= WarcStreamFramer.MaxRecord && ensure(e)) consume(e.toInt)
        else resyncRecord() // declared length past EOF (or > array max)
      case None => resyncRecord()
    }
  }

  /** Record = everything up to the next magic anywhere after the
    * current magic (batch resync), or to end of input. */
  private def resyncRecord(): Array[Byte] = {
    var from = Magic.length
    while (true) {
      val m = indexIn(Magic, from)
      if (m >= 0) return consume(m)
      from = math.max(Magic.length, len - Magic.length + 1)
      if (!more()) return consume(len)
    }
    null // unreachable
  }
}

object WarcStreamFramer {
  /** Single-record ceiling — the JVM byte-array bound the batch path
    * hits as a whole-FILE bound; here it bounds one record only. A
    * span reaching it is truncated there and framing resyncs. */
  val MaxRecord: Int = Int.MaxValue - (64 << 20)
}

/** Streaming multi-member gunzip with [[WarcSource.gunzipMembers]]'s
  * LENIENT laws: members walked explicitly via [[GzipMember]] (a
  * corrupt/truncated member or trailing garbage ends the stream,
  * keeping everything already inflated — including the partial bytes
  * of a truncated member), no CRC verification, one reusable
  * `Inflater` — but pull-based, so the inflated stream is never
  * materialized. */
final class GzipMemberStream(in: InputStream, chunk: Int = 1 << 16)
    extends InputStream {
  require(chunk >= 1024, s"chunk must be >= 1 KB, got $chunk")

  private var raw = new Array[Byte](chunk)
  private var rawLen = 0
  private var pos = 0 // consumed prefix of raw
  private var rawEof = false
  private var fedEnd = 0 // raw index up to which bytes were handed to inf
  private val inf = new java.util.zip.Inflater(true)
  private var inMember = false
  private var done = false
  private val one = new Array[Byte](1)

  private def compact(): Unit =
    if (pos > 0) {
      System.arraycopy(raw, pos, raw, 0, rawLen - pos)
      rawLen -= pos
      fedEnd = math.max(fedEnd - pos, 0)
      pos = 0
    }

  /** Read one more chunk into the raw buffer (growing if full). */
  private def fillRaw(): Boolean = {
    if (rawEof) return false
    compact()
    if (rawLen == raw.length)
      raw = java.util.Arrays.copyOf(raw, raw.length * 2)
    val n = in.read(raw, rawLen, raw.length - rawLen)
    if (n < 0) { rawEof = true; false } else { rawLen += n; true }
  }

  /** Position the inflater at the next member's deflate data; false =
    * end of stream (no further member: clean end, trailing garbage,
    * or truncated header — all the lenient stop). */
  private def startMember(): Boolean = {
    while (true) {
      val avail = rawLen - pos
      if (avail == 0 && rawEof) return false
      // cheap prelude refusal so trailing garbage never buffers the tail
      if (avail >= 1 && (raw(pos) & 0xFF) != 0x1F) return false
      if (avail >= 2 && (raw(pos + 1) & 0xFF) != 0x8B) return false
      if (avail >= 3 && raw(pos + 2) != 8) return false
      compact()
      val q = GzipMember.skipHeader(raw, 0, rawLen)
      if (q >= 0) {
        inf.reset()
        inf.setInput(raw, q, rawLen - q)
        fedEnd = rawLen
        pos = q
        return true
      }
      if (!fillRaw()) return false // truncated header at EOF
    }
    false // unreachable
  }

  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xFF
  }

  override def read(b: Array[Byte], off: Int, n: Int): Int = {
    if (n == 0) return 0
    while (!done) {
      if (!inMember) {
        if (!startMember()) { done = true; return -1 }
        inMember = true
      }
      try {
        val k = inf.inflate(b, off, n)
        if (k > 0) return k
        if (inf.finished) {
          pos = fedEnd - inf.getRemaining // end of deflate data
          inMember = false
          // skip CRC32 + ISIZE (unverified, the lenient policy); a
          // short trailer ends the stream like the batch walk
          var have = rawLen - pos
          while (have < 8 && fillRaw()) have = rawLen - pos
          if (have < 8) { done = true; return -1 }
          pos += 8
        } else if (inf.needsInput) {
          pos = fedEnd // everything handed over was consumed
          if (!fillRaw()) { done = true; return -1 } // truncated member
          inf.setInput(raw, pos, rawLen - pos)
          fedEnd = rawLen
        } else { done = true; return -1 } // needsDictionary: not gzip
      } catch {
        case _: java.util.zip.DataFormatException =>
          done = true; return -1 // corrupt member: keep prior output
      }
    }
    -1
  }

  override def close(): Unit = {
    inf.end()
    in.close()
  }
}

object WarcStream {

  /** The streaming twin of [[WarcSource.readWarcRecordsBinary]]: same
    * `(file, rec_no, rec_bin)` frame, same one-task-per-file
    * parallelism (the per-file framing unit), but each task READS ITS
    * FILE AS A STREAM through [[WarcStreamFramer]] (with
    * [[GzipMemberStream]] member inflation for `.gz`) instead of
    * holding the whole file — removing the ~2 GB whole-file cliff and
    * the inflated-prefix retention the batch path documents. */
  def readWarcRecordsBinaryStreaming(spark: SparkSession, path: String,
      chunk: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val files = listDataFiles(spark, path)
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(conf.value)
        val base: InputStream = fs.open(p)
        val in =
          if (file.endsWith(".gz")) new GzipMemberStream(base) else base
        val framer = new WarcStreamFramer(in, chunk)
        var recNo = -1L
        // close on exhaustion: the framer signals end exactly once
        new Iterator[(String, Long, Array[Byte])] {
          override def hasNext: Boolean = {
            val h = framer.hasNext
            if (!h) in.close()
            h
          }
          override def next(): (String, Long, Array[Byte]) = {
            recNo += 1
            (file, recNo, framer.next())
          }
        }
      }
      .toDF("file", "rec_no", "rec_bin")
  }

  /** The non-hidden data files under `path` (a directory, a single
    * file, or a glob) — the same leaf set the `binaryFile` reader
    * resolves, so the two readers see identical corpora. */
  private def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus resolves literal paths AND globs; directories expand
    // one level — the binaryFile convention
    val statuses = Option(fs.globStatus(p)).map(_.toSeq)
      .getOrElse(Seq.empty)
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq
                    else Seq(s))
    statuses
      .filter(s => s.isFile && s.getLen > 0)
      .map(_.getPath)
      .filterNot(q => q.getName.startsWith("_") || q.getName.startsWith("."))
      .map(_.toString)
      .sorted
  }
}
