package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WarcSpec extends AnyFunSuite with SparkTestBase {

  private def rec(t: String, uri: String, body: String,
      extra: Map[String, String] = Map.empty) =
    Warc.Record(t, uri, extra, body.getBytes(UTF_8))

  test("render → parseAll roundtrips records, offsets, and headers") {
    val records = Seq(
      rec("warcinfo", "", "software: graft\r\n"),
      rec("response", "http://a.example/x", "<html>hi é世</html>",
        Map("WARC-Record-ID" -> "<urn:1>")),
      rec("request", "http://a.example/x", "GET /x HTTP/1.1"))
    val blob = records.flatMap(r => Warc.render(r).toSeq).toArray
    val parsed = Warc.parseAll(blob).toSeq
    assert(parsed.size == 3)
    assert(parsed.map(_._2.warcType) == Seq("warcinfo", "response", "request"))
    assert(parsed(1)._2.targetUri == "http://a.example/x")
    assert(parsed(1)._2.headers("WARC-Record-ID") == "<urn:1>")
    assert(new String(parsed(1)._2.body, UTF_8) == "<html>hi é世</html>")
    // Offsets point at each record's version line.
    val off1 = Warc.render(records.head).length
    assert(parsed.map(_._1) == Seq(0L, off1.toLong,
      (off1 + Warc.render(records(1)).length).toLong))
  }

  test("body containing CRLF and header-like text does not confuse framing") {
    val tricky = "WARC/1.0\r\nContent-Length: 99\r\n\r\nfake"
    val blob = Warc.render(rec("response", "http://t", tricky))
    val out = Warc.parseAll(blob).toSeq
    assert(out.size == 1)
    assert(new String(out.head._2.body, UTF_8) == tricky)
  }

  test("truncated archive yields its intact prefix") {
    val blob = Warc.render(rec("response", "http://a", "one")) ++
      Warc.render(rec("response", "http://b", "two")).dropRight(10)
    val out = Warc.parseAll(blob).toSeq
    assert(out.map(_._2.targetUri) == Seq("http://a"))
  }

  test("garbage and empty buffers parse to nothing") {
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll("not a warc at all".getBytes(UTF_8)).isEmpty)
  }

  test("gunzipAll inflates concatenated members; plain passes through") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val r1 = Warc.render(rec("response", "http://a", "alpha"))
    val r2 = Warc.render(rec("response", "http://b", "beta"))
    val members = gz(r1) ++ gz(r2)
    val out = Warc.parseAll(Warc.gunzipAll(members)).toSeq
    assert(out.map(_._2.targetUri) == Seq("http://a", "http://b"))
    assert(Warc.gunzipAll(r1).sameElements(r1))
  }

  test("property: randomized archives roundtrip exactly") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val records = (0 until 1 + rnd.nextInt(6)).map { i =>
        val bodyLen = rnd.nextInt(2000)
        // Bodies may contain CRLFs, header-lookalikes, NUL, anything.
        val body = Array.fill(bodyLen)(rnd.nextInt(256).toByte)
        val extra = (0 until rnd.nextInt(3))
          .map(j => s"X-Hdr-$j" -> s"v${rnd.nextInt(100)}").toMap
        Warc.Record(
          Seq("response", "request", "metadata")(rnd.nextInt(3)),
          s"http://h${rnd.nextInt(50)}/p$i", extra, body)
      }
      val blob = records.flatMap(r => Warc.render(r).toSeq).toArray
      val parsed = Warc.parseAll(blob).map(_._2).toSeq
      assert(parsed.size == records.size)
      parsed.zip(records).foreach { case (p, r) =>
        assert(p.warcType == r.warcType && p.targetUri == r.targetUri)
        assert(p.headers == r.headers)
        assert(p.body.sameElements(r.body))
      }
    }
  }

  test("readFiles: one row per record across files, via binaryFile") {
    val dir = Files.createTempDirectory("warc_spec")
    try {
      Files.write(dir.resolve("a.warc"),
        Warc.render(rec("response", "http://a/1", "body one")) ++
          Warc.render(rec("response", "http://a/2", "body two")))
      Files.write(dir.resolve("b.warc"),
        Warc.render(rec("metadata", "http://b/1", "third")))
      val got = Warc.readFiles(spark, dir.toString + "/*.warc")
        .collect().map(r => (r.getString(3), r.getLong(4))).toSet
      assert(got == Set(("http://a/1", 8L), ("http://a/2", 8L),
        ("http://b/1", 5L)))
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }

  test("gunzipAll: padding between members yields the intact prefix, " +
      "never misaligned garbage") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val r1 = Warc.render(rec("response", "http://a", "alpha"))
    val r2 = Warc.render(rec("response", "http://b", "beta"))
    val padded = gz(r1) ++ Array[Byte](0, 0, 0) ++ gz(r2)
    // Member 2 sits behind non-gzip padding: the documented contract is
    // the intact PREFIX (member 1), with nothing corrupt emitted.
    val out = Warc.parseAll(Warc.gunzipAll(padded)).toSeq
    assert(out.map(_._2.targetUri) == Seq("http://a"))
  }

  test("render rejects CR/LF in header material instead of framing a " +
      "corrupt archive") {
    val bad = rec("response", "http://a", "x")
      .copy(headers = Map("X-Meta" -> "a\r\n\r\nJUNK"))
    val e = intercept[IllegalArgumentException] { Warc.render(bad) }
    assert(e.getMessage.contains("CR/LF"), e.getMessage)
    intercept[IllegalArgumentException] {
      Warc.render(rec("response", "http://x\r\ny", "x"))
    }
  }
}
