package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FreqItemsAggSpec extends AnyFunSuite with SparkTestBase {

  test("Misra-Gries guarantees hold across partial merges") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    // Skewed stream: two genuine heavy hitters + a long random tail.
    val items = Seq.fill(3000)("hot_a") ++ Seq.fill(1500)("hot_b") ++
      Seq.fill(2000)(s"tail_${rng.nextInt(400)}")
    val shuffled = rng.shuffle(items)
    val df = shuffled.toDF("item").repartition(13)
    val k = 50
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val sk = df.agg(FreqItemsAgg.freqItems(col("item"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(sk.size <= k - 1)
    // Heavy hitters (> n/k) must be present.
    exact.filter { case (_, c) => c * k > n }.keys.foreach { h =>
      assert(sk.contains(h), s"missing heavy hitter $h")
    }
    // Never overcount; undercount bounded by n/k.
    sk.foreach { case (i, est) =>
      val t = exact(i)
      assert(est <= t, s"$i overcounted: $est > $t")
      assert(t - est <= n / k, s"$i undercount ${t - est} > ${n / k}")
    }
    // Absent items cannot be heavy.
    exact.foreach { case (i, c) =>
      if (!sk.contains(i)) assert(c * k <= n + k, s"absent $i had count $c")
    }
  }

  test("partition count does not change the guarantee (single vs many)") {
    import spark.implicits._
    val items = (1 to 900).map(i => s"x_${i % 30}") ++ Seq.fill(600)("big")
    val k = 10
    Seq(1, 7).foreach { parts =>
      val sk = items.toDF("item").repartition(parts)
        .agg(FreqItemsAgg.freqItems(col("item"), k).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item")).collect().map(_.getString(0)).toSet
      assert(sk.contains("big"), s"parts=$parts") // 600 > 1500/10
    }
  }
}
