package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LogisticTrainerSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(n: Int) = {
    import spark.implicits._
    // Planted linear concept: docs with many tokens and/or English markers
    // are positive (n_tokens + 10*ev_en >= 90). Deterministic generator.
    (0 until n).map { i =>
      val toks = 20 + (i * 37) % 120                 // 20..139 tokens
      val ev = (i * 13) % 8                          // 0..7 "the" markers
      val words = Seq.tabulate(toks - ev)(j => s"w${(i + j) % 50}") ++
        Seq.fill(ev)("the")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("recovers a planted linear concept well above chance") {
    val out = LogisticTrainer
      .trainAndScore(corpus(400), "doc_id", "text", iters = 4)
      .agg(avg((col("label") === col("pred")).cast("double")).as("acc"),
        avg(col("pred").cast("double")).as("pos"))
      .head()
    assert(out.getDouble(0) > 0.8, s"accuracy ${out.getDouble(0)}")
    // Not a constant classifier: both classes are actually predicted.
    assert(out.getDouble(1) > 0.1 && out.getDouble(1) < 0.9)
  }

  test("training improves the Brier score over the zero model") {
    val feats = LogisticTrainer
      .features(corpus(400), "doc_id", "text")
      .withColumn("label", LogisticTrainer.plantedLabel(col("text")))
      .cache()
    def brier(w: Array[Long]): Double = {
      val z = LogisticTrainer.featureCols.zip(w)
        .map { case (c, wi) => col(c) * lit(wi) }.reduce(_ + _)
      val p = LogisticTrainer.pMilli(z).cast("double") / lit(1000.0)
      val y = col("label").cast("double")
      feats.agg(avg((y - p) * (y - p))).head().getDouble(0)
    }
    val w0 = Array.fill(LogisticTrainer.featureCols.size)(0L)
    val b0 = brier(w0)
    val b2 = brier(LogisticTrainer.trainWeights(feats, "label", iters = 2))
    val b4 = brier(LogisticTrainer.trainWeights(feats, "label", iters = 4))
    feats.unpersist(blocking = false)
    assert(b2 < b0, s"2 iters $b2 !< zero model $b0")
    assert(b4 < b2, s"4 iters $b4 !< 2 iters $b2")
  }

  test("learned weights point along the planted direction") {
    val feats = LogisticTrainer
      .features(corpus(400), "doc_id", "text")
      .withColumn("label", LogisticTrainer.plantedLabel(col("text")))
    val w = LogisticTrainer.trainWeights(feats, "label", iters = 4)
    // Planted rule rewards token count (x1) and en-evidence (x2).
    assert(w(1) > 0, s"w1 ${w(1)}")
    assert(w(2) > 0, s"w2 ${w(2)}")
  }

  test("training is deterministic across repartitionings") {
    val base = corpus(200)
    def weights(parts: Int): Seq[Long] = {
      val feats = LogisticTrainer
        .features(base.repartition(parts), "doc_id", "text")
        .withColumn("label", LogisticTrainer.plantedLabel(col("text")))
      LogisticTrainer.trainWeights(feats, "label", iters = 3).toSeq
    }
    assert(weights(1) == weights(7))
  }
}
