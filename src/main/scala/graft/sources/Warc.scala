package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500) record codec — the web-archive container CommonCrawl
  * ships, i.e. the raw front door of a web-scale training corpus. Pure
  * JVM, both directions: [[render]] writes spec-shaped records (version
  * line, named headers, Content-Length-framed payload, double-CRLF
  * terminators) and [[parseAll]] streams them back out of a buffer,
  * tolerating unknown headers and skipping malformed tails rather than
  * throwing mid-archive.
  *
  * Scale shape: CommonCrawl distributes ~1 GB per archive file, so the
  * unit of parallelism is the FILE — [[readFiles]] pairs Spark's
  * binaryFile source with a per-file flatMap, one task per archive,
  * records streamed from the buffer without a second copy. Gzipped
  * archives are per-member or whole-file gzip; [[gunzipAll]] loops
  * concatenated members (the CC layout) until the buffer is exhausted.
  * Nothing here shuffles — downstream operators decide that.
  */
object Warc {

  /** One WARC record. `headers` holds the non-core named fields verbatim
    * (case preserved on render; lookup is case-insensitive on parse).
    */
  case class Record(
      warcType: String,
      targetUri: String,
      headers: Map[String, String],
      body: Array[Byte])

  private val Crlf = "\r\n"

  /** Spec-shaped bytes for one record (WARC/1.0, core + extra headers,
    * Content-Length framing, double-CRLF record terminator).
    */
  def render(r: Record): Array[Byte] = {
    // Reject CR/LF inside header material rather than framing a corrupt
    // archive: an embedded "\r\n\r\n" would terminate the header block
    // before Content-Length, and parseAll (ours or anyone's) then loses
    // every record after it. Values belong in the BODY if they need
    // newlines.
    def clean(what: String, s: String): String = {
      require(!s.exists(c => c == '\r' || c == '\n'),
        s"WARC $what must not contain CR/LF: ${s.take(80)}")
      s
    }
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(clean("type", r.warcType)).append(Crlf)
    if (r.targetUri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(clean("target URI", r.targetUri))
        .append(Crlf)
    r.headers.foreach { case (k, v) =>
      sb.append(clean("header name", k)).append(": ")
        .append(clean("header value", v)).append(Crlf)
    }
    sb.append("Content-Length: ").append(r.body.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes(US_ASCII)
    val out = new Array[Byte](head.length + r.body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(r.body, 0, out, head.length, r.body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Stream every well-formed record out of `bytes` with its byte offset.
    * A record needs a `WARC/` version line, a parseable Content-Length,
    * and a complete payload; scanning resumes after each record (or stops
    * at the first structurally broken one — truncated archives yield
    * their intact prefix).
    */
  def parseAll(bytes: Array[Byte]): Iterator[(Long, Record)] =
    new Iterator[(Long, Record)] {
      private var pos = 0
      private var nextRec: (Long, Record) = null
      advance()

      private def lineEnd(from: Int): Int = {
        var i = from
        while (i + 1 < bytes.length &&
          !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
        i
      }

      private def advance(): Unit = {
        nextRec = null
        // Skip inter-record padding (CRLFs).
        while (pos + 1 < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        if (pos >= bytes.length) return
        val start = pos
        val vEnd = lineEnd(pos)
        if (vEnd + 1 >= bytes.length) return
        val version = new String(bytes, pos, vEnd - pos, US_ASCII)
        if (!version.startsWith("WARC/")) return
        var p = vEnd + 2
        var warcType = ""
        var uri = ""
        var len = -1L
        val extra = Map.newBuilder[String, String]
        var done = false
        while (!done) {
          val e = lineEnd(p)
          if (e + 1 >= bytes.length) return
          if (e == p) { done = true; p += 2 } // blank line → body follows
          else {
            val line = new String(bytes, p, e - p, US_ASCII)
            val colon = line.indexOf(':')
            if (colon > 0) {
              val k = line.substring(0, colon).trim
              val v = line.substring(colon + 1).trim
              k.toLowerCase match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "content-length" =>
                  len = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ => extra += (k -> v)
              }
            }
            p = e + 2
          }
        }
        if (len < 0 || p + len > bytes.length) return
        val body = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
        pos = p + len.toInt
        nextRec = (start.toLong, Record(warcType, uri, extra.result(), body))
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): (Long, Record) = {
        val r = nextRec
        advance()
        r
      }
    }

  /** Inflate a gzip buffer of one OR MANY concatenated members (the
    * CommonCrawl per-record-gzip layout) into one plain buffer; plain
    * input passes through untouched.
    */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 ||
      (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return bytes
    val out = new java.io.ByteArrayOutputStream()
    val in = new ByteArrayInputStream(bytes)
    val buf = new Array[Byte](8192)
    // ONE GZIPInputStream: Java's reader consumes well-formed
    // CONCATENATED members natively (readTrailer probes for the next
    // member's magic), so no outer loop is needed — and an outer loop
    // re-opening the stream is actively WRONG: the reader buffers up to
    // 512 bytes past what it consumed, so a second instance would start
    // at a misaligned offset and silently drop the remaining members via
    // the catch. Inter-member padding/garbage ends the stream after the
    // intact prefix; a truncated or corrupt trailing member likewise
    // yields the bytes inflated so far — mirrors parseAll's
    // stop-at-first-broken-record behavior.
    try {
      val gz = new java.util.zip.GZIPInputStream(in)
      var n = gz.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = gz.read(buf) }
    } catch {
      case _: java.io.EOFException | _: java.util.zip.ZipException => ()
    }
    out.toByteArray
  }

  /** Archive files → one row per record: (file, offset, warc_type,
    * target_uri, content_length, body). One task per file — the
    * CommonCrawl unit of parallelism; gzip (whole-file or concatenated
    * members) is handled transparently.
    */
  def readFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (file, raw) =>
        parseAll(gunzipAll(raw)).map { case (off, r) =>
          (file, off, r.warcType, r.targetUri, r.body.length.toLong, r.body)
        }
      }
      .toDF("file", "offset", "warc_type", "target_uri", "content_length",
        "body")
  }
}
