package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class DeltaOfDeltaSpec extends AnyFunSuite with SparkTestBase {

  private def series(rows: (String, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("s", "id", "t")
  }

  private def prof(d: DataFrame) =
    DeltaOfDelta.profile(d, "s", "t", "id").collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        if (r.isNullAt(9)) null else r.getDouble(9))
    }.toMap

  test("perfect cadence compresses to one bit per point") {
    // t = 0, 60, 120, 180, 240: deltas all 60, dods all 0
    val out = prof(series((0L to 4L).map(i => ("a", i, i * 60L)): _*))
    val (n, c1, c9, c12, c16, c37, bits, ratio) = out("a")
    assert((n, c1, c9, c12, c16, c37, bits) === ((5L, 3L, 0L, 0L, 0L, 0L, 3L)))
    assert(ratio === math.rint(3.0 / (3 * 64) * 1e4) / 1e4) // round(,4)
  }

  test("class boundaries land exactly per the Gorilla table") {
    // successive deltas produce dods hitting both edges of each class:
    val deltas = Seq(1000L, 1064L, 1129L, 1385L, 1642L, 3690L, 5739L, 5676L, 3628L)
    // dods:            64     65     256    257    2048   2049   -63    -2048
    //                  c9     c12    c12    c16    c16    c37    c9     c37
    val times = deltas.scanLeft(0L)(_ + _)
    val out = prof(series(times.zipWithIndex.map {
      case (t, i) => ("a", i.toLong, t)
    }: _*))
    val (_, c1, c9, c12, c16, c37, bits, _) = out("a")
    assert((c1, c9, c12, c16, c37) === ((0L, 2L, 2L, 2L, 2L)))
    assert(bits === 2 * 9L + 2 * 12L + 2 * 16L + 2 * 37L)
  }

  test("series shorter than three points report zero dods and null ratio") {
    val out = prof(series(("a", 0L, 0L), ("a", 1L, 60L), ("b", 0L, 5L)))
    assert(out("a") === ((2L, 0L, 0L, 0L, 0L, 0L, 0L, null)))
    assert(out("b") === ((1L, 0L, 0L, 0L, 0L, 0L, 0L, null)))
  }

  test("profile is partitioning-invariant with tie-broken ordering") {
    val rows = (0L until 500L).map(i => ("s" + i % 3, i, (i * 37) % 1000))
    val a = prof(series(rows: _*))
    val b = prof(series(scala.util.Random.shuffle(rows): _*))
    assert(a === b)
  }
}
