package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite with SparkTestBase {

  private def docs(n: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, 1L + rng.nextInt(500)))
      .toDF("doc_id", "w").repartition(5)
  }

  test("packByBudget is bit-identical to the single-window formulation") {
    val df = docs(400, 3)
    val wGlobal = Window.orderBy(
      Dedup.md5Hash60(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val naive = df
      .withColumn("__start", sum(col("w")).over(wGlobal) - col("w"))
      .withColumn("shard_id", expr("__start div 2000"))
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 8, 64).foreach { nb =>
      val got = Sharding.packByBudget(df, "doc_id", "w", 2000L, numBuckets = nb)
        .select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"numBuckets=$nb")
    }
  }

  test("shard weights are bounded: budget + one straddling row") {
    val df = docs(600, 9)
    val perShard = Sharding.packByBudget(df, "doc_id", "w", 1500L, numBuckets = 8)
      .groupBy("shard_id").agg(sum("w").as("tot")).collect()
    val maxW = 500L
    assert(perShard.forall(_.getLong(1) <= 1500L + maxW))
    // shards are contiguous 0..K
    val ids = perShard.map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
  }

  test("double weights, null weights and null ids are coerced, not crashed on") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option(10.7)), (Option(2L), None),
      (None, Option(5.0)), (Option(3L), Option(2.0)))
      .toDF("doc_id", "w")
    val got = Sharding.packByBudget(df, "doc_id", "w", 10L, numBuckets = 4)
      .select("doc_id", "shard_id").collect()
    assert(got.length == 3) // the null-id row is rejected
    assert(got.forall(_.getLong(1) >= 0L))
  }

  test("sampleKPerGroup: exactly min(k, group size) rows, stable under repartition") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"g${i % 7}", i.toLong)).toDF("g", "doc_id")
    val a = Sharding.sampleKPerGroup(df, Seq("g"), "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sharding.sampleKPerGroup(df.repartition(11), Seq("g"), "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size == 5))
    // tiny group: takes everything
    val small = Seq(("g", 1L), ("g", 2L)).toDF("g", "doc_id")
    assert(Sharding.sampleKPerGroup(small, Seq("g"), "doc_id", 5).count() == 2)
  }

  test("assignSplit: deterministic, partition-invariant, fractions roughly honored") {
    val df = docs(2000, 1)
    val a = Sharding.assignSplit(df, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sharding.assignSplit(df.repartition(17), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must not depend on partitioning")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1850 && counts("train") < 1990)
    assert(counts.getOrElse("val", 0) + counts.getOrElse("test", 0) == 2000 - counts("train"))
    assert(a.values.forall(v => v != null))
  }

  private def mixDocs(n: Int) = {
    import spark.implicits._
    // ~60% a / 30% b / 10% c by row, unit weights
    (1 to n).map { i =>
      val g = if (i % 10 < 6) "a" else if (i % 10 < 9) "b" else "c"
      (i.toLong, g, 1L)
    }.toDF("doc_id", "g", "w").repartition(7)
  }

  test("mixtureFractions: binding group keeps 100%, others scale to the mixture") {
    val df = mixDocs(1000)
    // target 20% c: c is binding (only 10% of weight) -> keep all of c,
    // S = 100/0.2 = 500, a keeps 0.4*500/600, b keeps 0.4*500/300
    val fr = Sharding.mixtureFractions(df, "g", "w",
      Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2))
    assert(math.abs(fr("c") - 1.0) < 1e-12)
    assert(math.abs(fr("a") - 200.0 / 600.0) < 1e-12)
    assert(math.abs(fr("b") - 200.0 / 300.0) < 1e-12)
    val missing = intercept[IllegalArgumentException] {
      Sharding.mixtureFractions(df, "g", "w", Map("a" -> 0.5, "zz" -> 0.5))
    }
    assert(missing.getMessage.contains("zz"))
  }

  test("sampleMixture: deterministic, partition-invariant, nested, near-target") {
    val df = mixDocs(4000)
    val fr = Sharding.mixtureFractions(df, "g", "w",
      Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2))
    def keySet(d: org.apache.spark.sql.DataFrame, f: Map[String, Double]) =
      Sharding.sampleMixture(d, "g", "doc_id", f)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = keySet(df, fr)
    assert(a == keySet(df.repartition(13), fr), "partition-invariant")
    val halved = keySet(df, fr.view.mapValues(_ / 2).toMap)
    assert(halved.subsetOf(a), "threshold sampling must be nested")
    // achieved mixture within sampling noise of 40/40/20
    val byG = Sharding.sampleMixture(df, "g", "doc_id", fr)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = byG.values.sum.toDouble
    assert(math.abs(byG("a") / tot - 0.4) < 0.05)
    assert(math.abs(byG("c") / tot - 0.2) < 0.05)
    // group absent from fractions is dropped entirely
    val dropped = Sharding.sampleMixture(df, "g", "doc_id", fr - "c")
    assert(dropped.filter(col("g") === "c").isEmpty)
  }

  test("upsampleMixture: whole copies everywhere, fractional extras deterministic") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "g")
    val out = Sharding.upsampleMixture(df, "g", "doc_id",
      Map("a" -> 2.5, "b" -> 1.0))
    val counts = out.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // b rows: exactly 1 copy each; a rows: 2 or 3 copies.
    (1L until 400L by 2).foreach(i => assert(counts(i) == 1L))
    (0L until 400L by 2).foreach(i => assert(counts(i) == 2L || counts(i) == 3L))
    // ~half the a rows get the third copy (200 rows ± noise).
    val extras = (0L until 400L by 2).count(i => counts(i) == 3L)
    assert(extras > 60 && extras < 140, s"extras=$extras")
    // Epoch ids enumerate 0..copies-1.
    val epochs = out.filter(col("doc_id") === 1L)
      .select("epoch").as[Long].collect().toSet
    assert(epochs == Set(0L))
    // Determinism + partition invariance.
    val again = Sharding.upsampleMixture(df.repartition(7), "g", "doc_id",
      Map("a" -> 2.5, "b" -> 1.0)).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == counts)
    // Factor 0 / absent group → dropped; factor < 1 is pure downsampling
    // with an epoch column.
    val down = Sharding.upsampleMixture(df, "g", "doc_id", Map("a" -> 0.5))
    assert(down.filter(col("g") === "b").isEmpty)
    val aKept = down.count()
    assert(aKept > 60 && aKept < 140, s"aKept=$aKept")
    assert(down.select("epoch").distinct().as[Long].collect().toSet == Set(0L))
  }

  test("weightedSample: dominant weight always drawn; deterministic; w<=0 excluded") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i == 42L) 1e9 else 1.0))
      .toDF("id", "w")
      .unionByName(Seq((200L, 0.0), (201L, -5.0)).toDF("id", "w"))
    val s1 = Sharding.weightedSample(df, "id", "w", 5)
      .select("id").as[Long].collect().toSet
    // key(42) = ln(u)/1e9 ≈ 0⁻ beats every unit-weight key (ln(u) ≤ ~-1e-18
    // only if u is improbably close to 1 — not at these 100 hashes).
    assert(s1.contains(42L))
    assert(!s1.contains(200L) && !s1.contains(201L))
    val s2 = Sharding.weightedSample(df.repartition(11), "id", "w", 5)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2)
    // n larger than the eligible universe returns the whole universe.
    assert(Sharding.weightedSample(df, "id", "w", 500).count() == 100L)
  }
}
