package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of a linear quality classifier — the missing half of
  * [[HashedLinear]] (which only scores with a pre-trained weight vector).
  * Full-batch gradient descent on a logistic objective with a HARD sigmoid,
  * in pure integer arithmetic end to end, so the trained weights — not just
  * the scores — are bit-identical across engines, runs, and partitionings,
  * and the whole training run sits under the DuckDB oracle gate.
  *
  * Reference anchor: the reference pipeline has no trainable component
  * (`/root/reference/src/3_transform_data.py` is rule-based throughout);
  * this operator is part of the north-star LLM-data extension family —
  * CCNet / GPT-3-style quality filtering trains exactly this shape of
  * linear model over cheap text features, then scores the corpus with it.
  *
  * Why this scales to 100 TB:
  *  - Each GD iteration is ONE map-side-combined aggregation: per-partition
  *    partial sums of the d gradient components (d ≈ 5 longs), merged on a
  *    single reducer. No shuffle of rows, no parameter server; the weight
  *    vector lives driver-side (d scalars, config-sized) and re-enters the
  *    next iteration as literals inside a codegen'd projection.
  *  - T iterations = T corpus scans. Full-batch GD (not minibatch SGD) is
  *    the deliberate choice: SGD's row-order dependence is nondeterministic
  *    under Spark's partitioning, full-batch sums are exact and
  *    order-independent in integer arithmetic.
  *
  * Determinism contract (mirrors the oracle SQL in
  * [[graft.queries.TextQueries]]):
  *  - weights in integer MICRO-units, features small non-negative integers;
  *  - hard sigmoid `p = clamp(0.5 + z/4, 0, 1)` in milli-units:
  *    `p_milli = clamp(500 + floor(z_micro / 4000.0), 0, 1000)` — no exp(),
  *    whose last-ulp behavior differs across libm implementations;
  *  - update `w += floor(G * lrNum / (N * lrDen))` with the division done
  *    in double and floored: every operand is an exact integer below 2^53,
  *    and a quotient of integers is never within a double ulp of an integer
  *    it doesn't equal, so the floor is exact on any IEEE-754 engine. (At
  *    gradient magnitudes beyond 2^53 — corpus row counts ~10^12 with
  *    saturated features — route the division through DECIMAL instead.)
  */
object LogisticTrainer {

  /** Feature column names, in weight-vector order. x0 is the bias input. */
  val featureCols: Seq[String] = Seq("x0", "x1", "x2", "x3", "x4")

  /** Integer document features from one shared [[graft.expr.TextStats]]
    * pass (single codegen'd token walk per document): bias 1, then capped
    * token count, capped English-marker evidence, capped punctuation
    * count, and capped char length in tens — each CENTERED by a fixed
    * corpus-typical constant. Centering matters: with all-positive raw
    * features, every weight shares the bias' job and full-batch GD drifts
    * the whole score mass one way before the (slow-moving, unit-input)
    * bias can compensate; centered inputs let each weight learn its
    * feature's covariance with the label directly.
    */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = TextFunctions.stats(col(textCol))
    docs.select(col(idCol),
      col(textCol),
      lit(1L).as("x0"),
      (least(st.getField("n_tokens"), lit(200L)) - lit(55L)).as("x1"),
      (least(st.getField("ev_en"), lit(50L)) - lit(3L)).as("x2"),
      least(st.getField("punct_count"), lit(100L)).as("x3"),
      (least((length(col(textCol)).cast("long") / lit(10L)).cast("long"),
        lit(300L)) - lit(30L)).as("x4"))
  }

  /** Planted linear concept for specs and the oracle query: the synthetic
    * corpus carries no organic label correlated with its text, so the
    * label is a linear rule over measurable quantities — UNCAPPED token
    * count and English-marker evidence — that a linear trainer must
    * recover. θ=90 splits the sf0.01 corpus 240/260.
    */
  def plantedLabel(textCol: Column, theta: Int = 90): Column = {
    val st = TextFunctions.stats(textCol)
    (st.getField("n_tokens") + lit(10L) * st.getField("ev_en") >= lit(theta.toLong))
      .cast("int")
  }

  /** Milli-unit hard sigmoid of a micro-unit margin column. */
  def pMilli(zMicro: Column): Column =
    greatest(lit(0L), least(lit(1000L),
      lit(500L) + floor(zMicro.cast("double") / lit(4000.0))))

  private def zMicro(w: Array[Long]): Column =
    featureCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }.reduce(_ + _)

  /** Run `iters` full-batch GD steps from w = 0; returns micro-unit
    * weights. `feats` must contain [[featureCols]] and an integer 0/1
    * `labelCol`. One narrow aggregation job per iteration.
    */
  def trainWeights(feats: DataFrame, labelCol: String, iters: Int,
      lrNum: Long = 1L, lrDen: Long = 1L): Array[Long] = {
    val w = Array.fill(featureCols.size)(0L)
    for (_ <- 1 to iters) {
      val err = col(labelCol).cast("long") * lit(1000L) - pMilli(zMicro(w))
      val gradAggs = featureCols.map(c => sum(err * col(c)).as(s"g_$c"))
      val aggs = gradAggs :+ count(lit(1)).as("n")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(featureCols.size)
      for (j <- featureCols.indices)
        w(j) += math.floor(
          (row.getLong(j) * lrNum).toDouble / (n.toDouble * lrDen)).toLong
    }
    w
  }

  /** Train on the planted concept and score every document. Output is all
    * integers: (id, label, z_micro, p_milli, pred).
    */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
      iters: Int = 4, lrNum: Long = 1L, lrDen: Long = 1L,
      theta: Int = 90): DataFrame = {
    val feats = features(docs, idCol, textCol)
      .withColumn("label", plantedLabel(col(textCol), theta))
      .persist()
    try {
      val w = trainWeights(feats, "label", iters, lrNum, lrDen)
      feats.select(col(idCol), col("label"),
          zMicro(w).as("z_micro"))
        .withColumn("p_milli", pMilli(col("z_micro")))
        .withColumn("pred", (col("p_milli") > lit(500L)).cast("int"))
    } finally feats.unpersist(blocking = false)
  }
}
