package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.AsOfJoin

class PushProbeFilterSpec extends AnyFunSuite with SparkTestBase {

  private def frames() = {
    import spark.implicits._
    val probe = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"),
      (2L, 99L, "d")).toDF("k", "t", "tag")
    val build = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 10L, 300.0))
      .toDF("k", "bt", "price")
    (probe, build)
  }

  test("probe-only predicates push below the as-of join") {
    val (probe, build) = frames()
    val joined = AsOfJoin.joinNative(probe, build, Seq("k"), "t", "bt",
      Seq("price"))
    val filtered = joined.filter(col("t") < 50L)
    val opt = filtered.queryExecution.optimizedPlan
    // No Filter node may remain ABOVE the join once the probe predicate
    // pushed (it either sits below the node or folded into the relation).
    val joinNode = opt.collectFirst { case j: AsOfJoinPlan => j }
    assert(joinNode.nonEmpty, opt.toString)
    val filterAbove = opt.collectFirst {
      case f @ Filter(_, child) if child.collectFirst {
        case _: AsOfJoinPlan => () }.nonEmpty => f
    }
    assert(filterAbove.isEmpty, opt.toString)
    // Semantics unchanged vs filtering before the join.
    val expected = AsOfJoin.joinNative(probe.filter(col("t") < 50L), build,
      Seq("k"), "t", "bt", Seq("price"))
      .collect().map(_.toSeq).toSet
    assert(filtered.collect().map(_.toSeq).toSet == expected)
    assert(filtered.count() == 3)
  }

  test("build-value predicates stay above; conjunctions split") {
    val (probe, build) = frames()
    val joined = AsOfJoin.joinNative(probe, build, Seq("k"), "t", "bt",
      Seq("price"))
    val mixed = joined.filter(col("price") > 150.0 && col("t") < 50L)
    val opt = mixed.queryExecution.optimizedPlan
    // The price conjunct cannot push: a Filter must remain above the join
    // and reference price only.
    val above = opt.collectFirst {
      case Filter(cond, child) if child.collectFirst {
        case _: AsOfJoinPlan => () }.nonEmpty => cond
    }
    assert(above.nonEmpty, opt.toString)
    assert(above.get.references.map(_.name).toSet == Set("price"),
      above.get.toString)
    // Row parity with the unoptimized semantics.
    assert(mixed.collect().map(_.toSeq).toSet ==
      joined.collect().filter(r =>
        !r.isNullAt(3) && r.getDouble(3) > 150.0 && r.getLong(1) < 50L)
        .map(_.toSeq).toSet)
  }

  test("column pruning narrows both join children to what the query uses") {
    import spark.implicits._
    // Wide probe: two payload columns the query never touches.
    val probe = Seq((1L, 10L, "a", "junk1", 7.0), (1L, 20L, "b", "junk2", 8.0),
      (2L, 15L, "c", "junk3", 9.0)).toDF("k", "t", "tag", "payload", "extra")
    val build = Seq((1L, 5L, 100.0, "bjunk"), (1L, 18L, 200.0, "bjunk2"),
      (2L, 10L, 300.0, "bjunk3")).toDF("k", "bt", "price", "note")
    val joined = AsOfJoin.joinNative(probe, build, Seq("k"), "t", "bt",
      Seq("price", "note"))
    val narrow = joined.select("k", "t", "price")
    val opt = narrow.queryExecution.optimizedPlan
    val j = opt.collectFirst { case x: AsOfJoinPlan => x }.get
    // Unused probe payloads and the unused build value are gone below.
    assert(j.left.output.map(_.name).toSet == Set("k", "t"), opt.toString)
    assert(j.rightValues.map(_.name) == Seq("price"), opt.toString)
    assert(!j.right.output.map(_.name).contains("note"), opt.toString)
    // Results identical to the unpruned semantics.
    assert(narrow.collect().map(_.toSeq).toSet ==
      joined.collect().map(r => Seq(r.get(0), r.get(1), r.get(5))).toSet)
  }

  test("a deterministic conjunct AFTER a non-deterministic one never " +
    "pushes (Catalyst's span rule); one BEFORE it still does") {
    val (probe, build) = frames()
    val joined = AsOfJoin.joinNative(probe, build, Seq("k"), "t", "bt",
      Seq("price"))
    // rand() && t<50: t<50 follows the non-deterministic conjunct, so
    // pushing it would change which rows consume rand()'s draw
    // sequence — the whole condition must stay above the join. (The
    // 0.5 threshold matters: Spark folds range-trivial comparisons
    // like rand() < 2.0 away entirely.)
    val blocked = joined.filter(rand(7) < lit(0.5) && col("t") < 50L)
      .queryExecution.optimizedPlan
    val stillAbove = blocked.collectFirst {
      case f @ Filter(_, child) if child.collectFirst {
        case _: AsOfJoinPlan => () }.nonEmpty => f
    }
    assert(stillAbove.nonEmpty, blocked.toString)
    assert(blocked.collectFirst { case j: AsOfJoinPlan => j }.exists(
      !_.left.exists(_.isInstanceOf[Filter])), blocked.toString)
    // t<50 && rand(): the deterministic PREFIX pushes, rand stays.
    val split = joined.filter(col("t") < 50L && rand(7) < lit(0.5))
      .queryExecution.optimizedPlan
    assert(split.collectFirst { case j: AsOfJoinPlan => j }.exists(
      _.left.collectFirst { case f: Filter => f }.nonEmpty),
      split.toString)
  }

  test("float-typed join keys refuse the broadcast exec: -0.0 must " +
    "match 0.0 regardless of build-side size") {
    import spark.implicits._
    // Build side tiny (well under the broadcast threshold); key 0.0 on
    // the build side, -0.0 computed on the probe side. Raw-byte hash
    // matching would miss; the merge exec's SQL ordering matches.
    val probe = Seq((0.0, 10L, "p1")).toDF("k0", "t", "tag")
      .select((col("k0") * lit(-1.0)).as("k"), col("t"), col("tag"))
    val build = Seq((0.0, 5L, 42.0)).toDF("k", "bt", "price")
    val joined = AsOfJoin.joinNative(probe, build, Seq("k"), "t", "bt",
      Seq("price"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastAsOfJoin"), phys)
    val rows = joined.collect()
    assert(rows.length == 1 && !rows.head.isNullAt(3) &&
      rows.head.getDouble(3) == 42.0,
      s"-0.0 probe failed to match 0.0 build: ${rows.mkString}")
  }
}
