package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EvalSpec extends AnyFunSuite with SparkTestBase {

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long) = {
    import spark.implicits._
    val df = rows.toDF("s", "y").repartition(3)
    val r = Eval.aucExact(df, col("s"), col("y")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("perfect separation gives AUC 1, inverted gives 0") {
    // Positives all score above negatives.
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    assert(auc(perfect) == ((2L, 2L, 8L))) // 8 / (2*2*2) = 1.0
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(auc(inverted) == ((2L, 2L, 0L)))
  }

  test("ties count half: identical scores give AUC 0.5") {
    val allTied = Seq((5L, true), (5L, false), (5L, true), (5L, false))
    // num_x2 = sum over pos of (2*0 + 2) = 4; AUC = 4 / (2*2*2) = 0.5.
    assert(auc(allTied) == ((2L, 2L, 4L)))
  }

  test("hand-computed mixed case") {
    // scores: pos {3, 1}, neg {2}. Pairs: (3>2)=1, (1<2)=0 → AUC=0.5.
    val rows = Seq((3L, true), (1L, true), (2L, false))
    val (p, n, x2) = auc(rows)
    assert(p == 2L && n == 1L)
    assert(x2 == 2L) // 2 / (2*2*1) = 0.5
  }

  test("partition-invariant") {
    import spark.implicits._
    val rows = (0 until 500).map(i => ((i * 7 % 97).toLong, i % 3 == 0))
    val a = Eval.aucExact(rows.toDF("s", "y").coalesce(1), col("s"), col("y")).head()
    val b = Eval.aucExact(rows.toDF("s", "y").repartition(11), col("s"), col("y")).head()
    assert(a == b)
  }
}
