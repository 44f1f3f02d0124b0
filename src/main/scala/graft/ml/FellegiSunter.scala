package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, JASA
  * 1969) with unsupervised EM parameter estimation — the model behind
  * Splink/fastLink-style entity resolution: given blocked candidate
  * pairs and their field-agreement COMPARISON VECTORS γ, learn per-field
  *   m_f = P(γ_f = 1 | match),  u_f = P(γ_f = 1 | non-match)
  * and the match prevalence λ, without labels, as a two-component
  * Bernoulli-mixture EM. The per-field log2(m/u) agreement weights are
  * the interpretable output every linkage tool reports.
  *
  * Spark-native + oracle-exact shape (the [[KMeans]] contract): the
  * model is a handful of driver-held doubles broadcast into each round's
  * expressions as literals; one round = ONE partial-agg'd aggregation
  * over the pair table. Per-pair responsibilities are a fixed double
  * expression (IEEE-identical across engines), then QUANTIZED to an
  * integer 1e-9 grid BEFORE the sums — so every M-step statistic is an
  * exact BIGINT, aggregation-order-independent, and DuckDB replays the
  * whole EM trajectory bit-for-bit (`q_fs_linkage`). Driver state is
  * O(fields) longs per round — never data.
  *
  * At 100 TB the pair table comes from blocking (see
  * [[graft.ops.FuzzyJoin]] / `q_entity_resolution`); each EM round is a
  * map-side-combined scan of it, and scoring/classification is one
  * map-only projection against the learned literals.
  */
object FellegiSunter {

  /** Mixture parameters; `m`/`u` are per-γ-column, order-aligned. */
  final case class Params(lambda: Double, m: Seq[Double], u: Seq[Double])

  private val Q = 1e9
  private val Floor = 1e-6
  private val Ceil = 0.999999

  private def clamp(x: Double): Double = math.min(Ceil, math.max(Floor, x))

  /** Per-pair match responsibility w under `p`, as a column. Written
    * left-associated in γ order — the EXACT association the oracle SQL
    * uses, so the doubles agree bitwise.
    */
  private def respCol(gammaCols: Seq[String], p: Params): Column = {
    val num = gammaCols.zipWithIndex.foldLeft(lit(p.lambda)) {
      case (acc, (g, i)) =>
        acc * when(col(g), lit(p.m(i))).otherwise(lit(1.0 - p.m(i)))
    }
    val alt = gammaCols.zipWithIndex.foldLeft(lit(1.0 - p.lambda)) {
      case (acc, (g, i)) =>
        acc * when(col(g), lit(p.u(i))).otherwise(lit(1.0 - p.u(i)))
    }
    num / (num + alt)
  }

  /** `rounds` EM iterations from `init` over boolean `gammaCols`.
    * Each round: quantize w to the 1e-9 grid, take exact integer sums
    * (Σwq, Σ(Q−wq), per-field Σ conditioned on γ), divide once.
    */
  def emFit(pairs: DataFrame, gammaCols: Seq[String], rounds: Int,
      init: Params = Params(0.3, Nil, Nil)): Params = {
    require(gammaCols.nonEmpty, "need at least one comparison column")
    val p0 = init match {
      case Params(l, Nil, Nil) =>
        Params(l, Seq.fill(gammaCols.size)(0.9), Seq.fill(gammaCols.size)(0.2))
      case p =>
        require(p.m.size == gammaCols.size && p.u.size == gammaCols.size,
          "m/u arity must match gammaCols")
        p
    }
    (1 to rounds).foldLeft(p0) { (p, _) =>
      val wq = floor(respCol(gammaCols, p) * lit(Q)).cast("long")
      val aggs =
        Seq(sum(wq).as("__sw"), sum(lit(Q.toLong) - wq).as("__su"),
          count(lit(1)).as("__n")) ++
        gammaCols.zipWithIndex.flatMap { case (g, i) => Seq(
          sum(when(col(g), wq).otherwise(lit(0L))).as(s"__swg$i"),
          sum(when(col(g), lit(Q.toLong) - wq).otherwise(lit(0L)))
            .as(s"__sug$i"))
        }
      val r = pairs.agg(aggs.head, aggs.tail: _*).head()
      val sw = r.getAs[Long]("__sw"); val su = r.getAs[Long]("__su")
      val n = r.getAs[Long]("__n")
      require(n > 0, "EM over an empty pair table")
      val lambda = clamp(sw.toDouble / Q / n.toDouble)
      val m = gammaCols.indices.map { i =>
        if (sw == 0L) Floor
        else clamp(r.getAs[Long](s"__swg$i").toDouble / sw.toDouble)
      }
      val u = gammaCols.indices.map { i =>
        if (su == 0L) Floor
        else clamp(r.getAs[Long](s"__sug$i").toDouble / su.toDouble)
      }
      Params(lambda, m, u)
    }
  }

  /** EM fit + readout table: one row per γ column — (field, m, u,
    * weight = log2(m/u), lambda) — the linkage model card. All doubles
    * rounded to 6; lambda repeats on every row (flat readout schema).
    */
  def fieldWeights(pairs: DataFrame, gammaCols: Seq[String], rounds: Int,
      init: Params = Params(0.3, Nil, Nil)): DataFrame = {
    val p = emFit(pairs, gammaCols, rounds, init)
    val rows = gammaCols.zipWithIndex.map { case (g, i) =>
      (g, p.m(i), p.u(i), math.log(p.m(i) / p.u(i)) / math.log(2.0),
        p.lambda)
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    rows.toDF("field", "m", "u", "weight", "lambda")
      .select(col("field"), round(col("m"), 6).as("m"),
        round(col("u"), 6).as("u"), round(col("weight"), 6).as("weight"),
        round(col("lambda"), 6).as("lambda"))
  }

  /** Map-only pair scoring against learned params: adds `match_w`
    * (posterior, rounded 6) and `is_match` at the given threshold.
    */
  def score(pairs: DataFrame, gammaCols: Seq[String], p: Params,
      threshold: Double = 0.5): DataFrame = {
    val w = respCol(gammaCols, p)
    pairs.withColumn("match_w", round(w, 6))
      .withColumn("is_match", w >= lit(threshold))
  }
}
