package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC FILE framing — the source-layer half of the WARC story
  * ([[graft.operators.Warc]] parses one record per row; this splits a
  * raw `.warc` byte stream into those rows). Framing is inherently
  * sequential WITHIN a file (the only way to know where a record ends
  * is its own `Content-Length`), so this is the documented legitimate
  * per-partition imperative case: parallelism is per FILE — exactly
  * the production unit, since real crawls ship millions of ~1 GB warc
  * files and `binaryFile` gives one task each at any corpus size.
  *
  * Length-driven, not delimiter-driven: a record body may legally
  * CONTAIN `WARC/1.0` + CRLF bytes (a crawl of a page about WARC!), so
  * the splitter jumps `header + CRLFCRLF + Content-Length + CRLFCRLF`
  * and never scans bodies. `Content-Length` is OCTETS per ISO 28500
  * §5.3 and the splitter counts octets — bodies may be any bytes,
  * including multi-byte UTF-8 and binary payloads. Malformed records
  * (no blank line before the next magic, unparseable length, truncated
  * tail) fall back to a RESYNC scan to the next `WARC/1.0` magic — the
  * bytes in between become one record that the parser marks
  * `valid = false` downstream; garbage before the first magic is
  * skipped (never silently globbed into a record).
  *
  * `.warc.gz` files (the Common Crawl shipping format: one gzip MEMBER
  * per record, members concatenated) are detected by suffix and
  * member-decompressed first. Member boundaries are by convention
  * record boundaries, but framing does NOT rely on that: members
  * decompress into one logical byte stream and the same length-driven
  * splitter frames it — a sloppy producer packing several records per
  * member (or splitting one across members) still frames correctly.
  *
  * Two record-column shapes:
  *   - [[readWarcRecords]]: UTF-8 STRING records (char positions == byte
  *     positions only for ASCII transport) — the legacy/simple path for
  *     known-ASCII corpora, parsed by [[graft.operators.Warc.warcParse]];
  *   - [[readWarcRecordsBinary]]: BINARY records carrying the exact
  *     original bytes, parsed by
  *     [[graft.operators.Warc.warcParseBytes]] (byte-true slicing via
  *     the ISO-8859-1 transport decode — each char IS one byte). This
  *     is the production path: most of the web is multi-byte UTF-8.
  *
  * MEMORY MODEL (r18): the `binaryFile`-backed readers here hold ONE
  * whole file (and for `.gz`, its whole inflated stream) as a JVM
  * array per task — a hard ~2 GB file cliff, acceptable only under
  * the ~1 GB-member shipping convention. The streaming twin
  * [[WarcStream.readWarcRecordsBinaryStreaming]] frames the same
  * records (law-pinned byte-identical) from a bounded-buffer stream,
  * bounding task memory by RECORD size instead — prefer it for
  * corpora whose file sizes are not convention-bounded.
  */
object WarcSource {

  private val Magic = "WARC/1.0\r\n".getBytes(UTF_8)
  private val Sep = "\r\n\r\n".getBytes(UTF_8)
  private[sources] val ClRe = "(?mi)^Content-Length:[ \\t]*([0-9]{1,18})".r
  // shared with the r18 streaming framer (WarcStream.scala) so the two
  // implementations can never drift on the framing constants
  private[sources] def MagicBytes: Array[Byte] = Magic
  private[sources] def SepBytes: Array[Byte] = Sep

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Split one file's bytes into record byte slices. Never throws;
    * never drops bytes between the first magic and EOF. The header is
    * ASCII by spec, so decoding it UTF-8 for the Content-Length probe
    * is byte-exact; the body jump counts OCTETS. */
  def splitRecordBytes(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var p = indexOf(b, Magic, 0)
    while (p >= 0 && p < b.length) {
      val next = indexOf(b, Magic, p + Magic.length)
      val hdrEnd = indexOf(b, Sep, p)
      var end = -1
      if (hdrEnd >= 0 && (next < 0 || hdrEnd < next)) {
        val hdr = new String(b, p, hdrEnd - p, UTF_8)
        ClRe.findFirstMatchIn(hdr).map(_.group(1).toLong).foreach { len =>
          val e = hdrEnd.toLong + 4L + len + 4L // body + record separator
          if (e <= b.length) end = e.toInt
        }
      }
      if (end < 0) end = if (next >= 0) next else b.length // resync
      out += java.util.Arrays.copyOfRange(b, p, end)
      p = indexOf(b, Magic, end)
    }
    out.result()
  }

  /** Split one file's bytes into record strings (UTF-8 decode of each
    * [[splitRecordBytes]] slice — ASCII-transport convenience form). */
  def splitRecords(b: Array[Byte]): Seq[String] =
    splitRecordBytes(b).map(new String(_, UTF_8))

  /** Hard ceiling on a file's decompressed size: byte-array transport
    * caps near Int.MaxValue anyway (binaryFile hands one array per
    * file); past this the remaining members are DROPPED (keep-prefix,
    * the lenient file policy — the splitter resyncs on whatever
    * framed). Production corpora ship ~1 GB members precisely so a
    * file stays one task's memory. */
  private val MaxGunzipOut: Int = Int.MaxValue - (64 << 20)

  /** Decompress a (possibly multi-member) gzip byte stream into the
    * concatenated decompressed bytes. Members are walked explicitly
    * via the shared [[graft.functions.GzipMember]] parser (Java's
    * `GZIPInputStream` silently stops at a corrupt second member);
    * trailing garbage after the last complete member is dropped — the
    * resync-grade tolerance the splitter applies to raw streams, and
    * the LENIENT counterpart of [[graft.functions.GunzipBytes]]'s
    * strict per-payload refusal (one parser, two policies). */
  def gunzipMembers(b: Array[Byte]): Array[Byte] = {
    import graft.functions.GzipMember
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(b.length * 4, 64), 1 << 26))
    var p = 0
    val buf = GzipMember.threadBuf.get()
    val inf = GzipMember.threadInflater.get()
    var stop = false
    while (!stop && p < b.length) {
      val q = GzipMember.skipHeader(b, p)
      if (q < 0) stop = true
      else {
        inf.reset()
        inf.setInput(b, q, b.length - q)
        try {
          var n = 1
          while (!inf.finished && n != 0) {
            n = inf.inflate(buf)
            if (n > 0) {
              if (out.size().toLong + n > MaxGunzipOut) {
                // oversized stream: keep the prefix, drop the rest
                out.write(buf, 0, (MaxGunzipOut - out.size()).max(0))
                return out.toByteArray
              }
              out.write(buf, 0, n)
            }
          }
          // not finished <=> needsInput/needsDictionary: truncated or
          // dictionary-requiring member — keep what inflated
          if (!inf.finished) stop = true
          else {
            val consumed = (b.length - q) - inf.getRemaining
            p = q + consumed + 8 // skip CRC32 + ISIZE trailer
          }
        } catch {
          case _: java.util.zip.DataFormatException => stop = true
        }
      }
    }
    out.toByteArray
  }

  private def fileBytes(file: String, bytes: Array[Byte]): Array[Byte] =
    if (file.endsWith(".gz")) gunzipMembers(bytes) else bytes

  /** Read `.warc` / `.warc.gz` files under `path` into one record per
    * row: `(file, rec_no, rec)` with `rec` a UTF-8 STRING (ASCII
    * transport form). One task per file (binaryFile), framing inside
    * the task — the per-file production parallel unit. */
  def readWarcRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        splitRecords(fileBytes(file, bytes)).zipWithIndex.map {
          case (rec, i) => (file, i.toLong, rec)
        }
      }
      .toDF("file", "rec_no", "rec")
  }

  /** Read `.warc` / `.warc.gz` files under `path` into one record per
    * row: `(file, rec_no, rec_bin)` with `rec_bin` the exact record
    * BYTES — the byte-true production path
    * ([[graft.operators.Warc.warcParseBytes]] consumes it). */
  def readWarcRecordsBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        splitRecordBytes(fileBytes(file, bytes)).zipWithIndex.map {
          case (rec, i) => (file, i.toLong, rec)
        }
      }
      .toDF("file", "rec_no", "rec_bin")
  }

  /** BINARY WARC sink — writes a byte-record column as real `.warc`
    * part files, or `.warc.gz` with ONE GZIP MEMBER PER RECORD (the
    * Common Crawl shipping shape [[gunzipMembers]] reads back): raw
    * concatenated bytes, no row separators — a `.warc` stream IS its
    * records. Goes through `saveAsNewAPIHadoopFile` +
    * [[RawBytesOutputFormat]], so task commit/retry semantics are the
    * standard FileOutputCommitter ones (no half-written part files
    * survive a task failure), and parallelism is one file per
    * partition — the per-file framing unit the readers parallelize
    * over. The string `.text()` writer cannot do this job: it encodes
    * UTF-8 and appends '\n' row separators, so arbitrary BYTE payloads
    * (8859-1 pages, images) can't round-trip through it. */
  def writeWarcRecordsBinary(df: DataFrame, bytesCol: String,
      path: String, gzipPerRecord: Boolean = false): Unit = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.setBoolean(RawBytesOutputFormat.GzipKey, gzipPerRecord)
    df.select(col(bytesCol)).rdd
      .map(r => (org.apache.hadoop.io.NullWritable.get(),
        new org.apache.hadoop.io.BytesWritable(r.getAs[Array[Byte]](0))))
      .saveAsNewAPIHadoopFile(path,
        classOf[org.apache.hadoop.io.NullWritable],
        classOf[org.apache.hadoop.io.BytesWritable],
        classOf[RawBytesOutputFormat], conf)
  }
}

object RawBytesOutputFormat {
  val GzipKey = "graft.warc.sink.gzip.per.record"
}

/** Hadoop output format writing VALUES as raw concatenated bytes (no
  * key, no separators); with [[RawBytesOutputFormat.GzipKey]] set each
  * value becomes its own complete gzip member (`finish()` flushes the
  * member trailer without closing the file — members concatenate). */
class RawBytesOutputFormat
    extends org.apache.hadoop.mapreduce.lib.output.FileOutputFormat[
      org.apache.hadoop.io.NullWritable, org.apache.hadoop.io.BytesWritable] {
  import org.apache.hadoop.io.{BytesWritable, NullWritable}
  import org.apache.hadoop.mapreduce.{RecordWriter, TaskAttemptContext}

  override def getRecordWriter(ctx: TaskAttemptContext):
      RecordWriter[NullWritable, BytesWritable] = {
    val gzip = ctx.getConfiguration.getBoolean(
      RawBytesOutputFormat.GzipKey, false)
    val file = getDefaultWorkFile(ctx, if (gzip) ".warc.gz" else ".warc")
    val out = file.getFileSystem(ctx.getConfiguration).create(file, true)
    new RecordWriter[NullWritable, BytesWritable] {
      // ONE reusable Deflater per task (a GZIPOutputStream per record
      // would leak a native Deflater per record until GC); members are
      // written by hand per RFC 1952: 10-byte header (no flags, mtime
      // 0, OS unknown) + raw deflate + CRC32/ISIZE little-endian
      private val deflater =
        new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
          true)
      private val crc = new java.util.zip.CRC32
      private val buf = new Array[Byte](64 * 1024)
      private val hdr = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, -1)
      private def intLE(v: Long): Unit = {
        out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
      }
      override def write(k: NullWritable, v: BytesWritable): Unit =
        if (gzip) {
          out.write(hdr)
          deflater.reset()
          deflater.setInput(v.getBytes, 0, v.getLength)
          deflater.finish()
          while (!deflater.finished) {
            val n = deflater.deflate(buf)
            if (n > 0) out.write(buf, 0, n)
          }
          crc.reset()
          crc.update(v.getBytes, 0, v.getLength)
          intLE(crc.getValue)
          intLE(v.getLength.toLong)
        } else out.write(v.getBytes, 0, v.getLength)
      override def close(ctx: TaskAttemptContext): Unit = {
        deflater.end()
        out.close()
      }
    }
  }
}
