package graft.plans

import graft.expr.AsOfTime
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Cast, EqualTo, Expression, IsNotNull, IsNull, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.NullType

/** Rewrites `probe [LEFT] JOIN build ON keys... AND asof_time(pt, bt
  * [, strat])` into [[AsOfJoinPlan]] — the pure-SQL entry to the native
  * as-of path, with SQL's null reading (NULL keys/times never match —
  * see the null-semantics block in [[rewriteOne]]) and DuckDB's
  * join-type split:
  *
  *   - `LEFT JOIN` → probe-preserving as-of (unmatched probes keep null
  *     build values) — DuckDB `ASOF LEFT JOIN`, the reference's price
  *     probe semantic. Analysis has already widened the build side's
  *     nullability for the outer join, so the rewrite is type-exact.
  *   - `JOIN` (inner) → unmatched probes are DROPPED — DuckDB
  *     `ASOF JOIN`. Implemented as the probe-preserving node over a
  *     build side augmented with a literal `true` match indicator, a
  *     null-rejecting filter on that indicator, and a projection
  *     restoring the original output. Matched rows carry genuine build
  *     values, so the inner join's tighter nullability stays sound.
  *
  * Runs in the user-rule optimizer batch (runtime-injectable via
  * `spark.experimental.extraOptimizations`, which an analyzer rule is
  * not), AFTER Catalyst's own predicate pushdown: by then every conjunct
  * referencing a single side has been pushed below the join, so a
  * well-formed condition is exactly equi-key conjuncts plus the one
  * marker. Anything else (a residual inequality, a pushed-in WHERE
  * spanning both sides) is rejected with a pointed error rather than
  * silently changing semantics — the as-of contract is at most one
  * output row per probe row, which an extra post-match predicate would
  * break.
  *
  * SEMANTIC CONSEQUENCE of running post-pushdown, documented and
  * spec-pinned (AsOfJoinNativeSpec "build-side WHERE pre-filters"): a
  * WHERE predicate on BUILD-side columns has been pushed below the join
  * before the rewrite sees it — wherever it was written, including
  * outside a wrapping subquery, since PushDownPredicates moves filters
  * through projections too — so it pre-filters the series and the as-of
  * matches the latest QUALIFYING row (filter-then-match). DuckDB's
  * textual ASOF JOIN instead matches first and filters the joined rows
  * after; the rewrite cannot restore that reading because a pushed WHERE
  * and a user's subquery filter are literally the same plan by the time
  * the user batch runs. Match-then-filter is expressed through the
  * column API — `AsOfJoin.join/joinNative(...).filter(...)` — where the
  * filter sits above a node Catalyst cannot push into (and this
  * package's own [[PushProbeFilterThroughAsOfJoin]] deliberately pushes
  * only probe-side predicates). Probe-side WHEREs are unaffected either
  * way — filtering probes commutes with per-probe matching. A
  * null-rejecting WHERE on build columns also converts LEFT to inner
  * (EliminateOuterJoin), exactly as for ordinary outer joins.
  */
object RewriteAsOfTimeJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _)
        if cond.exists(_.isInstanceOf[AsOfTime]) =>
      rewriteOne(l, r, jt, cond)
    // Any OTHER join shape carrying the marker (RIGHT/FULL/SEMI/ANTI, or
    // a missing condition elsewhere) would survive to physical planning
    // and die inside AsOfTime.eval with the MISLEADING "install the
    // optimizer rules" diagnosis — the rules are installed; the join
    // type is what is unsupported. Fail here, pointedly.
    case j: Join if j.condition.exists(_.exists(_.isInstanceOf[AsOfTime])) =>
      throw new IllegalArgumentException(
        s"asof_time join: only INNER and LEFT OUTER joins are supported " +
          s"(DuckDB's ASOF [LEFT] JOIN split); found ${j.joinType.sql}. " +
          "Rewrite a RIGHT join with the sides swapped; FULL/SEMI/ANTI " +
          "have no one-row-per-probe as-of reading.")
  }

  private def rewriteOne(l: LogicalPlan, r: LogicalPlan, joinType: JoinType,
      cond: Expression): LogicalPlan = {
    def sideOf(e: Expression): Option[Boolean] = // Some(true) = left
      if (e.references.nonEmpty && e.references.subsetOf(l.outputSet))
        Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet))
        Some(false)
      else None
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"asof_time join: $why (condition was: ${cond.sql})")

    val conjuncts = splitConjunctivePredicates(cond)
    val markers = conjuncts.collect { case m: AsOfTime => m }
    if (markers.size != 1)
      fail("exactly one asof_time(...) conjunct is required")
    val m = markers.head
    val keyPairs = conjuncts.filterNot(_.isInstanceOf[AsOfTime]).map {
      case EqualTo(a, b) => (sideOf(a), sideOf(b)) match {
        case (Some(true), Some(false)) => (a, b)
        case (Some(false), Some(true)) => (b, a)
        case _ => fail(s"equi conjunct ${EqualTo(a, b).sql} must compare " +
          "one probe-side expression with one build-side expression")
      }
      case other => fail(s"only equi-key conjuncts may accompany " +
        s"asof_time, found ${other.sql}")
    }
    val (lt, rt) = (sideOf(m.probeTime), sideOf(m.buildTime)) match {
      case (Some(true), Some(false)) => (m.probeTime, m.buildTime)
      case _ => fail("asof_time(probe_ts, build_ts): the first argument " +
        "must come from the left (probe) side and the second from the " +
        "right (build) side")
    }

    // SQL null semantics. AsOfJoinPlan groups NULL KEYS together and
    // sorts NULL TIMES first (the Scala API's documented, window-form-
    // compatible behavior), but SQL `=` / `>=` are never true on NULL —
    // a DuckDB ASOF JOIN matches nothing for a null key or time. The
    // SQL surface must keep SQL's reading:
    //
    //   - build side: drop rows with a null key or null time — they can
    //     match no probe row under SQL comparison. With those gone, a
    //     null-KEY probe row's group has no build rows at all, so it
    //     falls out as unmatched with no extra work, and a null-TIME
    //     probe row finds no BACKWARD match (null sorts before every
    //     real build time).
    //   - probe side: a null-TIME probe row could still take a spurious
    //     FORWARD match (the earliest build time follows null in sort
    //     order), so for forward-containing strategies such rows are
    //     routed around the join: dropped for inner, null-padded via a
    //     union branch for left outer.
    //
    // Every guard is gated on static nullability, so the common
    // non-nullable schema pays no extra filter, scan, or union.
    val buildGuards =
      (keyPairs.map(_._2) :+ rt).filter(_.nullable).map(IsNotNull)
    val rStrict =
      if (buildGuards.isEmpty) r else Filter(buildGuards.reduce(And), r)
    val probeTimeAtRisk = m.strategy != "backward" && lt.nullable

    joinType match {
      case LeftOuter =>
        def node(probe: LogicalPlan) =
          AsOfJoinPlan(probe, rStrict, keyPairs.map(_._1), keyPairs.map(_._2),
            lt, rt, rStrict.output, m.strategy)
        if (!probeTimeAtRisk) node(l)
        else {
          // Null-time probe rows bypass the join with null build values;
          // IsNull/IsNotNull partition the probe exactly (no null holes).
          // Literal(null, dt) directly — the canonical typed null; the
          // Cast(Literal(null, NullType)) form survives to runtime as a
          // per-row Cast on the extraOptimizations path, whose batch
          // runs after ConstantFolding. KNOWN COST of this shape: the
          // probe subplan appears in BOTH Union branches and is
          // evaluated twice (the padded branch has no exchange, so
          // physical reuse cannot deduplicate it) — acceptable for the
          // rare nullable-probe-time LEFT path; callers with expensive
          // probe plans should pre-filter null times themselves.
          val matched = node(Filter(IsNotNull(lt), l))
          val padded = Project(
            l.output ++ rStrict.output.map(a =>
              Alias(Literal(null, a.dataType), a.name)()),
            Filter(IsNull(lt), l))
          Union(Seq(matched, padded))
        }
      case _ => // Inner: drop unmatched probes via a match indicator.
        val lStrict = if (probeTimeAtRisk) Filter(IsNotNull(lt), l) else l
        val ind = Alias(Literal(true), "__asof_matched")()
        val rAug = Project(rStrict.output :+ ind, rStrict)
        val node = AsOfJoinPlan(lStrict, rAug, keyPairs.map(_._1),
          keyPairs.map(_._2), lt, rt, rAug.output, m.strategy)
        // The indicator reads back nullable (null = no match); reference
        // it as such so a later null-propagation pass cannot fold the
        // IsNotNull away.
        val filtered =
          Filter(IsNotNull(ind.toAttribute.withNullability(true)), node)
        Project(l.output ++ rStrict.output, filtered)
    }
  }
}
