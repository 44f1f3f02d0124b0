package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperAnfSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // Directed path 0→1→2→3 plus edge 3→0 (a 4-cycle): every node reaches
  // exactly t+1 nodes within distance t (for t ≤ 3), so the EXACT
  // neighborhood function is NF(t) = 4·(t+1). HLL with 256 registers on
  // ≤ 4 items runs in the linear-counting branch, where estimates of
  // tiny sets are near-exact.
  private val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    .toDF("src", "dst")

  test("ball registers grow monotonically along the cycle") {
    val r0 = HyperAnf.ballRegisters(cycle, "src", "dst", rounds = 0)
    val r2 = HyperAnf.ballRegisters(cycle, "src", "dst", rounds = 2)
    // t=0: every node's sketch holds exactly itself → 1 register row.
    assert(r0.groupBy("node").count().collect().forall(_.getLong(1) == 1L))
    // t=2: every node's sketch holds 3 distinct nodes → ≤ 3 register
    // rows, ≥ 1 (collisions only ever merge rows).
    val c2 = r2.groupBy("node").count().collect()
    assert(c2.length == 4 && c2.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
  }

  test("neighborhood function matches exact ball sizes on the 4-cycle") {
    val nf = HyperAnf.neighborhoodFunction(cycle, "src", "dst", rounds = 3)
      .orderBy("t").collect()
    assert(nf.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // Linear-counting estimates of 1..4-element sets with m=256 are
    // within a few percent; NF(t) = 4·(t+1) exactly.
    nf.zipWithIndex.foreach { case (row, t) =>
      val est = row.getDouble(1)
      val exact = 4.0 * (t + 1)
      assert(math.abs(est - exact) <= exact * 0.05,
        s"t=$t est=$est exact=$exact")
    }
  }

  test("round checkpoints (and the edge frame) are fully released") {
    val before = spark.sparkContext.getPersistentRDDs.size
    HyperAnf.neighborhoodFunction(cycle, "src", "dst", rounds = 6)
    val after = spark.sparkContext.getPersistentRDDs.size
    // The readout is collected per round, so NOTHING stays pinned.
    assert(after - before <= 0, s"leaked ${after - before} checkpoints")
  }

  test("self-loops and duplicate edges do not change the estimate") {
    val noisy = cycle
      .union(Seq((0L, 0L), (1L, 2L), (1L, 2L)).toDF("src", "dst"))
    val a = HyperAnf.neighborhoodFunction(cycle, "src", "dst", rounds = 2)
      .orderBy("t").collect().map(_.getDouble(1)).toSeq
    val b = HyperAnf.neighborhoodFunction(noisy, "src", "dst", rounds = 2)
      .orderBy("t").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("disconnected components: balls never cross components") {
    // Two disjoint 2-cycles: every ball saturates at size 2 from t=1 on.
    val two = Seq((0L, 1L), (1L, 0L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val nf = HyperAnf.neighborhoodFunction(two, "src", "dst", rounds = 2)
      .orderBy("t").collect()
    val est = nf.map(_.getDouble(1))
    assert(math.abs(est(0) - 4.0) <= 0.2)
    assert(math.abs(est(1) - 8.0) <= 0.4)
    assert(est(2) == est(1)) // saturated: a fixed point, bit-identical
  }

  test("deep ballRegisters folds complete: per-round truncation keeps " +
      "the doubly-self-referencing plan linear, not O(2^rounds)") {
    // rounds = 16 without the per-round checkpoint builds ~2^16 copies
    // of the whole pipeline and hangs Catalyst before any executor work.
    // Past the cycle's diameter the registers are saturated, so the
    // result must equal the rounds = 3 fixed point.
    val deep = HyperAnf.ballRegisters(cycle, "src", "dst", rounds = 16)
      .collect().map(_.toSeq).toSet
    val fixed = HyperAnf.ballRegisters(cycle, "src", "dst", rounds = 3)
      .collect().map(_.toSeq).toSet
    assert(deep == fixed)
    intercept[IllegalArgumentException](
      HyperAnf.ballRegisters(cycle, "src", "dst", rounds = -1))
  }
}
