package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class JaroWinklerSpec extends AnyFunSuite with SparkTestBase {

  // Reference values observed from DuckDB's jaro_winkler_similarity —
  // the cross-engine contract the threshold-join oracle rests on.
  private val duckPinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),   // classic Winkler example
    ("DIXON", "DICKSONX", 0.8133333333333332),  // unequal lengths + prefix
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // no common prefix
    ("CRATE", "TRACE", 0.7333333333333334),     // >0.7 but l=0: no boost
    ("aXbY", "aZbW", 0.6666666666666666),       // l=1 but jaro<=0.7: no boost
    ("aaxxxxxx", "aayyyyyy", 0.5),              // l=2 but jaro<=0.7: no boost
    ("abcdef", "abdcfe", 0.9111111111111111),   // two transposed pairs
    ("aaaaab", "aaaaac", 0.9333333333333333),   // 5-char prefix capped at 4
    ("ab", "abcdefghij", 0.7866666666666667),   // window from the longer side
    ("kitten", "sitting", 0.746031746031746),
    ("abc", "abc", 1.0),
    ("a", "b", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0))                              // DuckDB: both empty -> 0

  test("pins DuckDB jaro_winkler_similarity on reference pairs") {
    duckPinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): got $got want $want")
    }
  }

  test("symmetric") {
    duckPinned.foreach { case (a, b, _) =>
      assert(JaroWinkler.similarity(a, b) == JaroWinkler.similarity(b, a))
    }
  }

  test("stats pins the match DP: matches, transpositions, prefix") {
    // MARTHA/MARHTA: all 6 match, T/H out of order (2 positions), l=3.
    assert(JaroWinkler.stats("MARTHA", "MARHTA") == ((6, 2, 3, 6, 6)))
    // Prefix counts at most 4 even when 5 chars agree.
    assert(JaroWinkler.stats("aaaaab", "aaaaac")._3 == 4)
    // No matches outside the window: a/b share nothing.
    assert(JaroWinkler.stats("a", "b") == ((0, 0, 0, 1, 1)))
  }

  test("codegen'd expression and SQL registration agree with the impl") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = duckPinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaExpr = df.select(
      JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw")).collect()
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) AS jw FROM jw_pairs")
      .collect()
    viaExpr.zip(viaSql).zip(duckPinned).foreach { case ((e, q), (a, b, want)) =>
      assert(e.getDouble(0) == q.getDouble(0), s"expr vs SQL on ($a, $b)")
      assert(math.abs(e.getDouble(0) - want) < 1e-12, s"($a, $b)")
    }
  }

  test("SQL registration rejects wrong arity with a named error") {
    graft.GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT jaro_winkler('abc')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("jaro_winkler(a, b)")),
      s"unexpected error: $e")
  }

  test("null propagates, never throws") {
    import spark.implicits._
    val df = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
    val r = df.select(JaroWinkler.jaroWinkler(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("jaroWinklerSelfJoin finds planted near-matches, blocked only") {
    import spark.implicits._
    val df = Seq(
      (1L, "jonathan smith"),
      (2L, "jonathan smyth"),   // same block "jona", high similarity
      (3L, "jonathan taylor"),  // same block, below tau
      (4L, "xonathan smith")    // near-identical but DIFFERENT block
    ).toDF("id", "nm")
    val pairs = graft.ops.FuzzyJoin
      .jaroWinklerSelfJoin(df, "id", "nm", blockLen = 4, tau = 0.93)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // sanity: the cross-block pair really is above tau — blocking, not
    // the score, excluded it (the documented trade-off).
    assert(JaroWinkler.similarity("jonathan smith", "xonathan smith") > 0.93)
  }

  test("jaroWinklerSelfJoin validates parameters") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "nm")
    intercept[IllegalArgumentException] {
      graft.ops.FuzzyJoin.jaroWinklerSelfJoin(df, "id", "nm", 0, 0.9)
    }
    intercept[IllegalArgumentException] {
      graft.ops.FuzzyJoin.jaroWinklerSelfJoin(df, "id", "nm", 4, 1.5)
    }
  }
}
