package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DriftSpec extends AnyFunSuite with SparkTestBase {

  private def psi(ref: Seq[Double], cur: Seq[Double], bins: Int)
      : Seq[(Int, Long, Long, Double)] = {
    import spark.implicits._
    Drift.psiBins(ref.toDF("v"), cur.toDF("v"), "v", bins)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
  }

  test("identical distributions score ~zero; shifted ones do not") {
    val ref = (0 until 200).map(i => (i % 10).toDouble)
    val same = psi(ref, ref, 5)
    assert(same.size == 5)
    assert(same.forall { case (_, rc, cc, term) => rc == cc && term == 0.0 })

    // Mass moved to the top of the range.
    val cur = (0 until 200).map(i => 9.0 - (i % 3))
    val shifted = psi(ref, cur, 5)
    assert(shifted.map(_._4).sum > 0.2, s"PSI ${shifted.map(_._4).sum}")
  }

  test("binning clamps current values outside the reference range") {
    val got = psi(Seq(0.0, 10.0), Seq(-5.0, 15.0, 5.0), 2)
    // -5 clamps to bin 0, 15 to bin 1, 5 to bin 1 (width 5, floor(5/5)=1).
    assert(got.map(g => (g._1, g._2, g._3)) ==
      Seq((0, 1L, 1L), (1, 1L, 2L)))
  }

  test("degenerate reference (constant) puts everything in bin 0") {
    val got = psi(Seq(3.0, 3.0), Seq(2.0, 4.0), 4)
    assert(got.head._2 == 2L && got.head._3 == 2L)
    assert(got.tail.forall(g => g._2 == 0L && g._3 == 0L))
  }

  test("empty bins appear with smoothed zero-mass terms") {
    val got = psi(Seq(0.0, 9.9), Seq(0.0, 9.9), 10)
    assert(got.size == 10)
    assert(got.count { case (_, rc, _, _) => rc > 0 } == 2)
  }

  test("categorical: union of categories, hand-checked direction") {
    import spark.implicits._
    val ref = Seq("a", "a", "a", "b").toDF("c")
    val cur = Seq("b", "b", "b", "z").toDF("c")
    val got = Drift.categorical(ref, cur, "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("a", "b", "z"))
    // "a" lost mass, "b"/"z" gained; every term is non-negative for a
    // one-sided move and positive where the share changed.
    assert(got("a")._3 > 0 && got("b")._3 > 0 && got("z")._3 > 0)
    assert(got("a")._1 == 3L && got("a")._2 == 0L)
    assert(got("z")._1 == 0L && got("z")._2 == 1L)
  }

  test("psi terms are partition-invariant") {
    import spark.implicits._
    val ref = (0 until 300).map(i => (i % 17).toDouble)
    val cur = (0 until 300).map(i => ((i * 7) % 23).toDouble)
    val a = psi(ref, cur, 8)
    import org.apache.spark.sql.functions.col
    val b = Drift.psiBins(ref.toDF("v").repartition(13),
        cur.toDF("v").repartition(7), "v", 8)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }
}
