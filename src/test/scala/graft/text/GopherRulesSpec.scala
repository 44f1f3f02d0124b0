package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GopherRulesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def rep(text: String): org.apache.spark.sql.Row =
    Seq(Tuple1(text)).toDF("text")
      .select(GopherRules.report(col("text")).as("r"))
      .select("r.*").head()

  // 60 ordinary words, stop words included: every rule passes.
  private val goodDoc =
    (1 to 52).map(i => s"word$i").mkString(" ") +
      " the cat sat of the mat and that have with"

  test("a well-formed document passes every rule") {
    val r = rep(goodDoc)
    assert(r.getAs[Boolean]("pass"), r.toString)
    assert(r.getAs[Long]("word_count") == 62L)
    assert(r.getAs[Long]("stop_hits") >= 2L)
  }

  test("each rule fails on its own pathology") {
    // Too short (rule 1).
    assert(!rep("the cat sat of that mat").getAs[Boolean]("r_word_count"))
    // Mean word length out of band (rule 2): 60 one-char words.
    val shorty = rep(Seq.fill(60)("a").mkString(" "))
    assert(!shorty.getAs[Boolean]("r_mean_word_len"))
    // Symbol ratio (rule 3): hashes everywhere.
    val hashy = rep((1 to 60).map(i => s"w$i###").mkString(" "))
    assert(!hashy.getAs[Boolean]("r_symbol"))
    assert(hashy.getAs[Double]("symbol_ratio") == 3.0)
    // Bullet lines (rule 4): every line a bullet.
    val bullets = rep((1 to 60).map(i => s"- item$i").mkString("\n"))
    assert(!bullets.getAs[Boolean]("r_bullet"))
    assert(bullets.getAs[Double]("bullet_ratio") == 1.0)
    // Ellipsis line endings (rule 5), both spellings.
    val trailing = rep((1 to 30).map(i => s"cut$i...").mkString("\n") +
      "\n" + (1 to 30).map(i => s"cut$i…").mkString("\n"))
    assert(!trailing.getAs[Boolean]("r_ellipsis"))
    // Alphabetic-word fraction (rule 6): digits only.
    val numeric = rep((1 to 60).map(_.toString).mkString(" "))
    assert(!numeric.getAs[Boolean]("r_alpha"))
    assert(numeric.getAs[Double]("alpha_ratio") == 0.0)
    // Required stop words (rule 7): none present.
    val stopless = rep((1 to 60).map(i => s"word$i").mkString(" "))
    assert(!stopless.getAs[Boolean]("r_stop_words"))
  }

  test("stop-word hits count DISTINCT required words, case-insensitively") {
    val r = rep("The THE the " + (1 to 57).map(i => s"w$i").mkString(" "))
    assert(r.getAs[Long]("stop_hits") == 1L) // 'the' thrice is one hit
    val r2 = rep("The of " + (1 to 58).map(i => s"w$i").mkString(" "))
    assert(r2.getAs[Long]("stop_hits") == 2L)
    assert(r2.getAs[Boolean]("r_stop_words"))
  }

  test("empty and whitespace-only text fails closed") {
    Seq("", "   ").foreach { t =>
      val r = rep(t)
      assert(r.getAs[Long]("word_count") == 0L)
      assert(r.getAs[Double]("symbol_ratio") == 1.0) // fail-closed guard
      assert(!r.getAs[Boolean]("pass"))
    }
  }
}
