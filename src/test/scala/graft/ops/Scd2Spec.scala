package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("collapses runs, opens segments on null-safe attr change") {
    import spark.implicits._
    val log = Seq(
      ("u1", ts("2024-01-01 00:00:00"), Option("a"), 1L),
      ("u1", ts("2024-01-02 00:00:00"), Option("a"), 2L), // same run
      ("u1", ts("2024-01-03 00:00:00"), Option("b"), 3L), // change
      ("u1", ts("2024-01-04 00:00:00"), None, 4L),        // value → null opens
      ("u1", ts("2024-01-05 00:00:00"), None, 5L),        // null run
      ("u1", ts("2024-01-06 00:00:00"), Option("b"), 6L), // null → value opens
      ("u2", ts("2024-01-01 00:00:00"), Option("x"), 7L),
      // Tied timestamps, different attrs: tieBreak orders them; the first
      // becomes an empty [t, t) segment, the second wins from t onward.
      ("u3", ts("2024-01-01 00:00:00"), Option("p"), 8L),
      ("u3", ts("2024-01-01 00:00:00"), Option("q"), 9L))
      .toDF("k", "t", "attr", "id").repartition(4)
    val got = Scd2.fromChangeLog(log, Seq("k"), Seq("attr"), "t", Seq("id"))
      .orderBy(col("k"), col("valid_from"), col("is_current"))
      .collect()
      .map(r => (r.getString(0), r.get(1), r.getTimestamp(2), r.getTimestamp(3), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      ("u1", "a", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), false),
      ("u1", "b", ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00"), false),
      ("u1", null, ts("2024-01-04 00:00:00"), ts("2024-01-06 00:00:00"), false),
      ("u1", "b", ts("2024-01-06 00:00:00"), null, true),
      ("u2", "x", ts("2024-01-01 00:00:00"), null, true),
      ("u3", "p", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), false),
      ("u3", "q", ts("2024-01-01 00:00:00"), null, true)))
  }

  test("as-of property: every log row's ts falls in a segment with its attrs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // Globally unique t keeps every segment non-empty, so segment order by
    // (k, valid_from) is unambiguous; tied-ts semantics are pinned by the
    // deterministic test above.
    val log = (1 to 400).map { i =>
      (s"u${rng.nextInt(5)}", i.toLong * 10 + rng.nextInt(5), s"v${rng.nextInt(3)}", i.toLong)
    }.toDF("k", "t", "attr", "id").repartition(6)
    val dim = Scd2.fromChangeLog(log, Seq("k"), Seq("attr"), "t", Seq("id"))

    // Each row must land in exactly one segment of its key whose attr matches.
    // (Rows tied on t with different attrs: the segment STARTING at that t
    // carries the later row's attr, so match on containment OR exact start.)
    val joined = log.as("l").join(dim.as("d"),
      col("l.k") === col("d.k") &&
        col("l.t") >= col("d.valid_from") &&
        (col("d.valid_to").isNull || col("l.t") < col("d.valid_to")))
    val covered = joined.groupBy(col("l.k"), col("l.t"), col("l.id"))
      .agg(count(lit(1)).as("n"), max(col("d.attr")).as("seg_attr"))
    assert(covered.filter(col("n") =!= 1).count() == 0, "every ts in exactly one segment")

    // Segments must alternate: no two consecutive segments share attrs.
    val rows = dim.orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.sliding(2).foreach {
      case Array((k1, a1), (k2, a2)) if k1 == k2 => assert(a1 != a2, s"$k1: $a1 repeated")
      case _ =>
    }
    // Exactly one current segment per key.
    val cur = dim.filter(col("is_current")).groupBy("k").count().collect()
    assert(cur.forall(_.getLong(1) == 1L))
  }
}
