package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class RedactSpec extends AnyFunSuite with SparkTestBase {

  private def run(texts: String*): Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        Redact.emailCount(col("text")).as("e"),
        Redact.ipCount(col("text")).as("i"),
        Redact.phoneCount(col("text")).as("p"),
        Redact.redact(col("text")).as("r"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  test("each PII family is counted and replaced with its placeholder") {
    val Seq(got) = run(
      "mail a.b+c@sub.example.org or 192.168.0.1 or call 555-123-4567 now")
    assert(got == ((1L, 1L, 1L,
      "mail <EMAIL> or <IP> or call <PHONE> now")))
  }

  test("multiple hits of one family all redact; counts are per-occurrence") {
    val Seq(got) = run("x@y.com then z@w.net and 10.0.0.1 10.0.0.2")
    assert(got._1 == 2L && got._2 == 2L && got._3 == 0L)
    assert(got._4 == "<EMAIL> then <EMAIL> and <IP> <IP>")
  }

  test("clean text passes through byte-identical with zero counts") {
    val s = "no pii here, just words and the number 42 and v1.2 notation"
    val Seq(got) = run(s)
    assert(got == ((0L, 0L, 0L, s)))
  }

  test("dotted phone numbers are not eaten by the IPv4 pass") {
    // 555.123.4567 has a 4-digit final group: not an IPv4 match, so the
    // phone pass (which runs AFTER ip) must still see and redact it.
    val Seq(got) = run("dial 555.123.4567 ok")
    assert(got == ((0L, 0L, 1L, "dial <PHONE> ok")))
  }

  test("email redaction runs first so its digits never leak into ip/phone") {
    val Seq(got) = run("u123.456.7890@host.example.com")
    assert(got._1 == 1L && got._4 == "<EMAIL>")
  }
}
