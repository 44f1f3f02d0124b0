package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite with SparkTestBase {

  test("extracts hosts in order, counts URLs, derives registered domains") {
    import spark.implicits._
    val df = Seq(
      "see https://a.b.Example.com/x and http://news.site.org?q=1 done",
      "no urls here",
      "bare http:// is not a url; https://single-label is not either")
      .toDF("text")
    val out = df.select(
      Urls.urlCount(col("text")).as("n"),
      Urls.hosts(col("text")).as("hs")).as[(Long, Seq[String])].collect()
    assert(out(0)._1 == 2L && out(0)._2 == Seq("a.b.Example.com", "news.site.org"))
    assert(out(1)._1 == 0L)
    assert(out(2)._1 == 0L) // host needs at least two labels
  }

  test("registered domain is the last two labels, lower-cased") {
    import spark.implicits._
    val out = Seq("a.b.Example.COM", "news.site.org", "x.co")
      .toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .as[String].collect().toList
    assert(out == List("example.com", "site.org", "x.co"))
  }
}
