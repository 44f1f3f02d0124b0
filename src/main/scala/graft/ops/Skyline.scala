package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline / Pareto-front operator (Börzsönyi et al., ICDE'01): the rows
  * not DOMINATED by any other row, where b dominates a iff b ≥ a on every
  * dimension and > on at least one. The multi-criteria "best documents"
  * selection (longest AND most lexically diverse, cheapest AND fastest…)
  * that a naive formulation writes as an O(n²) NOT EXISTS self-join.
  *
  * 2D maximizing case has a sort-based O(n log n) plan: group to one row
  * per distinct d1 (partial-agg'd max of d2), then one running-max sweep
  * over the DISTINCT-d1 table — a d1 value survives iff its d2-max beats
  * every d2-max at strictly greater d1. Facts are never globally sorted,
  * and neither is the sweep: |distinct d1| is data-driven (d1 = token
  * count or byte length at corpus scale ⇒ 10⁵–10⁶ values), so the
  * running max rides the shared tiled-prefix engine
  * ([[graft.ml.Eval.cumMaxLeg]] over [[graft.ml.Eval.tileOf]] quantile
  * tiles — the kaplanMeier/rocPoints shape with a max leg instead of a
  * sum leg), then survivors broadcast back to tag front rows. Ties
  * survive together (equal points do not dominate each other).
  */
object Skyline {

  /** Pareto front maximizing integer dimensions (d1, d2): returns the
    * input rows that are on the front.
    */
  def front2d(df: DataFrame, d1: String, d2: String): DataFrame = {
    val perD1 = df.groupBy(col(d1)).agg(max(col(d2)).as("__gmax"))
    // Exclusive descending running max over the distinct-d1 frame: tiles
    // are value ranges, so every row of a HIGHER tile has strictly
    // greater d1 (broadcast offset leg) and same-tile strictly-greater
    // rows are the tile-local exclusive window — together exactly the
    // strictly-greater-d1 mass the dominance test needs. perD1 has one
    // row per d1, so row frames and range frames agree.
    val kept = graft.ml.Eval.cumMaxLeg(
        graft.ml.Eval.tileOf(perD1, col(d1)), col(d1),
        "__gmax", "__prev", descending = true)
      .filter(col("__prev").isNull || col("__gmax") > col("__prev"))
      .select(col(d1), col("__gmax"))
    df.join(broadcast(kept), Seq(d1))
      .filter(col(d2) === col("__gmax"))
      .drop("__gmax")
  }

  /** d-dimensional Pareto front, maximizing every integer dimension.
    * Dispatches to the O(n log n) [[front2d]] sweep for two dimensions;
    * otherwise runs the distributed sort-filter-skyline (SFS, Chomicki
    * et al. ICDE'03) two-phase plan:
    *
    *   1. LOCAL front per partition: rows sorted within the partition by
    *      descending coordinate sum, then one scan keeping a row iff no
    *      already-kept row dominates it. Sum-descending order makes the
    *      scan EXACT with a grow-only kept set — a dominator has ≥ on
    *      every dimension and > on one, hence a strictly larger sum, so
    *      it always precedes anything it dominates (equal-sum rows can
    *      never dominate each other). No shuffle; each partition reduces
    *      to its own front.
    *   2. GLOBAL front of the union of local fronts — correct because a
    *      globally undominated row is undominated in its own partition,
    *      so phase 1 never discards a front row. The union is
    *      front-sized, not data-sized; it SHUFFLES to one bounded
    *      executor task (same finish discipline as the dedup family's
    *      union-find: a single task, never a driver collect) and runs
    *      the identical sorted scan. A shuffle boundary, not a narrow
    *      `coalesce(1)` — coalesce would fold every upstream partition
    *      into the one final task and serialize phase 1 itself.
    *
    * GUARDED finish: phase 1's output is materialized (local checkpoint)
    * and counted first. While the union of local fronts exceeds
    * `unionBound`, additional distributed SFS rounds run — re-shuffle
    * the survivors into ~count/unionBound partitions and scan again, so
    * rows dominated by a row that sat in a different partition die
    * before anything funnels into one task. Rounds stop when the bound
    * is met, the survivor set stops shrinking (< 10% per round — an
    * intrinsically large front, e.g. fully anti-correlated dimensions,
    * which no plan can bound below its own output size), or after 8
    * rounds. Each round's checkpoint is released once the next round
    * materializes ([[Checkpoints]] discipline).
    *
    * Memory bound, stated: phase 1 holds one partition's FRONT (not the
    * partition); the final task holds the post-round survivor set —
    * ≤ max(unionBound, intrinsic front size), never silently n.
    *
    * Rows with a NULL in any dimension are dropped (a NULL coordinate
    * can neither dominate nor be ranked — same policy as the similarity
    * family). Duplicate coordinate vectors survive together. Dimension
    * values must fit LONG; the sum ordering uses exact long arithmetic.
    */
  def front(df: DataFrame, dims: Seq[String],
      unionBound: Long = 1L << 21): DataFrame =
    frontWithRounds(df, dims, unionBound)._1

  /** [[front]] plus the per-round survivor counts (head = the phase-1
    * union size; one further entry per guard round) — the observable the
    * guard spec asserts on. Empty for the 2-d sweep dispatch.
    */
  private[graft] def frontWithRounds(df: DataFrame, dims: Seq[String],
      unionBound: Long): (DataFrame, Seq[Long]) = {
    require(dims.size >= 2, s"need >= 2 dimensions, got ${dims.size}")
    require(unionBound > 0, s"unionBound must be positive, got $unionBound")
    if (dims.size == 2) return (front2d(df, dims.head, dims.last), Nil)

    val clean = df.filter(dims.map(col(_).isNotNull).reduce(_ && _))
    val withV = clean
      .withColumn("__v", array(dims.map(col(_).cast("long")): _*))
      .withColumn("__s", dims.map(col(_).cast("long")).reduce(_ + _))
    val schema = withV.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val vIdx = schema.fieldIndex("__v")
    val sIdx = schema.fieldIndex("__s")

    def dominates(a: IndexedSeq[Long], b: IndexedSeq[Long]): Boolean = {
      var gt = false
      var i = 0
      while (i < a.length) {
        if (a(i) < b(i)) return false
        if (a(i) > b(i)) gt = true
        i += 1
      }
      gt
    }

    // Sum-descending scan with a STRICT-SUM CUT: a dominator has ≥ on
    // every dimension and > on one, hence a strictly larger sum — so a
    // row need only be checked against kept rows whose sum is strictly
    // greater than its own (`front[0 until cut)`, maintained as one
    // monotone pointer over the sorted run). Equal-sum rows never
    // compare at all, which is what keeps the INTRINSIC-front worst case
    // (anti-correlated dims, e.g. every point on a constant-sum simplex:
    // front = n) linear instead of O(front²) — the skyline-skew
    // rehearsal measured the unguarded scan unbounded there (n²/2
    // dominance tests in the final task at 4M rows).
    def sfsScan(it: Iterator[org.apache.spark.sql.Row])
        : Iterator[org.apache.spark.sql.Row] = {
      val front = scala.collection.mutable.ArrayBuffer
        .empty[IndexedSeq[Long]]
      var cut = 0
      var curSum = Long.MaxValue
      it.filter { r =>
        val v = r.getSeq[Long](vIdx).toIndexedSeq
        val s = r.getLong(sIdx)
        if (s < curSum) { cut = front.length; curSum = s }
        var dominated = false
        var i = 0
        while (i < cut && !dominated) {
          dominated = dominates(front(i), v)
          i += 1
        }
        if (!dominated) front += v
        !dominated
      }
    }

    // Materialize phase 1 behind a shuffle-independent checkpoint so the
    // guard can count it, and so the finish below reads front-sized
    // blocks instead of recomputing the corpus scan inside its own task.
    var cur = withV
      .sortWithinPartitions(col("__s").desc)
      .mapPartitions(sfsScan)(enc)
      .localCheckpoint(eager = true)
    var cnt = cur.count()
    val counts = scala.collection.mutable.ArrayBuffer(cnt)
    var rounds = 0
    while (cnt > unionBound && rounds < 8) {
      val target = math.max(1L, (cnt + unionBound - 1) / unionBound)
        .min(Int.MaxValue.toLong).toInt
      // Round-robin, NOT hash-by-__s: sum is low-cardinality exactly in
      // the anti-correlated cases that trigger the guard, and hashing on
      // it would funnel equal-sum survivors into one partition — the
      // skew this round exists to avoid. Round-robin keeps rounds even
      // and is deterministic (Spark sorts within partitions before
      // round-robin redistribution for retry safety).
      val next = cur
        .repartition(target)
        .sortWithinPartitions(col("__s").desc)
        .mapPartitions(sfsScan)(enc)
        .localCheckpoint(eager = true)
      val nextCnt = next.count()
      Checkpoints.release(cur)
      val shrinking = nextCnt < cnt - cnt / 10
      cur = next
      cnt = nextCnt
      counts += cnt
      rounds += 1
      if (!shrinking) rounds = 8 // intrinsic front: stop, finish anyway
    }
    val result = cur
      .repartition(1)
      .sortWithinPartitions(col("__s").desc)
      .mapPartitions(sfsScan)(enc)
      .drop("__v", "__s")
    (result, counts.toSeq)
  }
}
