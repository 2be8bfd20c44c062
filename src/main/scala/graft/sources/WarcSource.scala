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
  * and never scans bodies. Malformed records (no blank line before the
  * next magic, unparseable length, truncated tail) fall back to a
  * RESYNC scan to the next `WARC/1.0` magic — the bytes in between
  * become one record that [[graft.operators.Warc.warcParse]] marks
  * `valid = false` downstream; garbage before the first magic is
  * skipped (never silently globbed into a record).
  *
  * Records are decoded as UTF-8 strings (the engine's record column
  * type); `Content-Length` is bytes per spec, and the downstream
  * parser's char-based bound equals it for ASCII transport — binary
  * payload crawls would add a byte-typed record column instead.
  */
object WarcSource {

  private val Magic = "WARC/1.0\r\n".getBytes(UTF_8)
  private val Sep = "\r\n\r\n".getBytes(UTF_8)
  private val ClRe = "(?mi)^Content-Length:[ \\t]*([0-9]{1,18})".r

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

  /** Split one file's bytes into record strings. Never throws; never
    * drops bytes between the first magic and EOF. */
  def splitRecords(b: Array[Byte]): Seq[String] = {
    val out = Seq.newBuilder[String]
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
      out += new String(b, p, end - p, UTF_8)
      p = indexOf(b, Magic, end)
    }
    out.result()
  }

  /** Read `.warc` files under `path` into one record per row:
    * `(file, rec_no, rec)`. One task per file (binaryFile), framing
    * inside the task — the per-file production parallel unit. */
  def readWarcRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        splitRecords(bytes).zipWithIndex.map { case (rec, i) =>
          (file, i.toLong, rec)
        }
      }
      .toDF("file", "rec_no", "rec")
  }
}
