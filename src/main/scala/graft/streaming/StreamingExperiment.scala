package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming always-valid experiment monitor — the continuous twin of
  * [[graft.ops.Experiment.msprt]]: per experiment key, cumulative arm
  * counts fold in as unit events arrive, and each micro-batch emits one
  * row with the refreshed mixture-SPRT log-likelihood and the running-min
  * always-valid p. Because the p-value process is always-valid, reading
  * it after EVERY batch (the whole point of a live monitor) costs no α
  * inflation — stop the experiment the first time `p_av` crosses the
  * budget.
  *
  * State is four longs (cumulative n_c, n_t, conv_c, conv_t) plus the
  * running-min p per experiment — O(experiments), watermark-free, the
  * [[StreamingCusum]] bounded-state discipline. The scalar likelihood is
  * the SAME JVM arithmetic as the batch operator's Column expressions
  * (`Math.log`/`Math.exp` under both), so a stream fed batch-per-day is
  * bit-identical to the batch trajectory — spec-pinned.
  */
object StreamingExperiment {

  case class Unit(exp: String, treated: Boolean, converted: Boolean)

  case class ExpState(nC: Long, nT: Long, convC: Long, convT: Long,
    pMin: Double)

  case class Readout(exp: String, n_c: Long, n_t: Long, conv_c: Long,
    conv_t: Long, log_lambda: Option[Double], p_av: Option[Double])

  /** logΛ for cumulative counts, None while degenerate — one fixed-order
    * chain shared conceptually with the batch Column expression.
    */
  private[graft] def logLambda(nC: Long, nT: Long, convC: Long, convT: Long,
      tau2: Double): Option[Double] = {
    if (nC <= 0 || nT <= 0) return None
    val conv = convC + convT
    if (conv <= 0 || conv >= nC + nT) return None
    val pool = conv.toDouble / (nC + nT).toDouble
    val v = pool * (1.0 - pool) * (1.0 / nT.toDouble + 1.0 / nC.toDouble)
    val delta = convT.toDouble / nT.toDouble - convC.toDouble / nC.toDouble
    Some(0.5 * Math.log(v / (v + tau2)) +
      delta * delta * tau2 / (2.0 * v * (v + tau2)))
  }

  /** One readout row per experiment per micro-batch that touched it. */
  def monitor(units: DataFrame, tau2: Double): Dataset[Readout] = {
    require(tau2 > 0.0, s"tau2 must be positive, got $tau2")
    val spark = units.sparkSession
    import spark.implicits._
    units.select("exp", "treated", "converted").as[Unit]
      .groupByKey(_.exp)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update(tau2))
  }

  private def update(tau2: Double)(
      key: String,
      events: Iterator[Unit],
      state: GroupState[ExpState]): Iterator[Readout] = {
    var s = state.getOption.getOrElse(ExpState(0L, 0L, 0L, 0L, Double.NaN))
    events.foreach { u =>
      s = s.copy(
        nC = s.nC + (if (u.treated) 0 else 1),
        nT = s.nT + (if (u.treated) 1 else 0),
        convC = s.convC + (if (!u.treated && u.converted) 1 else 0),
        convT = s.convT + (if (u.treated && u.converted) 1 else 0))
    }
    val ll = logLambda(s.nC, s.nT, s.convC, s.convT, tau2)
    // Running min carries across an invalid (degenerate) batch — the
    // batch operator's window min skips NULL days the same way.
    val pNow = ll.map(l => math.min(1.0, Math.exp(-l)))
      .map(p0 => if (s.pMin.isNaN) p0 else math.min(s.pMin, p0))
    val p = pNow.orElse(if (s.pMin.isNaN) None else Some(s.pMin))
    s = s.copy(pMin = p.getOrElse(s.pMin))
    state.update(s)
    Iterator.single(Readout(key, s.nC, s.nT, s.convC, s.convT, ll, p))
  }
}
