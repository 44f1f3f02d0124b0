package graft.plans

import graft.SparkTestBase
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Catalyst as-of join (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec) must agree with the library union+window form on non-null
  * values, and its physical plan must be the co-partitioned sort-merge
  * shape: one exchange + one sort per side, no union, no window.
  */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkTestBase {

  private def randomCase(seed: Int) = {
    val rng = new scala.util.Random(seed)
    val keys = Array("a", "b", "c")
    val buildRaw = Seq.fill(rng.nextInt(41))(
      (keys(rng.nextInt(3)), rng.nextInt(51), rng.nextLong().abs % 999 + 1))
    // (key, t) deduped: equal-instant winners are undefined in both forms.
    val build = buildRaw.groupBy(b => (b._1, b._2)).map(_._2.head).toSeq
    val probes = Seq.fill(rng.nextInt(40) + 1)(
      (if (rng.nextInt(4) == 3) "d" else keys(rng.nextInt(3)), rng.nextInt(51)))
    (probes, build)
  }

  /** Run `body` with the broadcast threshold pinned, restoring after. */
  private def withThreshold[T](v: String)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  test("bit-identical to the union+window form on random series, all strategies, BOTH execs") {
    import spark.implicits._
    // Tiny frames plan as BroadcastAsOfJoinExec at the default threshold;
    // threshold -1 forces the co-partitioned merge — both physical paths
    // must agree with the library form.
    Seq("10MB", "-1").foreach { thr =>
      withThreshold(thr) {
        (1 to 8).foreach { round =>
          val (probes, build) = randomCase(round * 31 + 7)
          val probeDf = probes.zipWithIndex
            .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("pid", "key", "t")
          val buildDf = build.toDF("key", "bt", "value")
          Seq("backward", "forward", "backward_then_forward").foreach { strat =>
            val want = AsOfJoin.join(probeDf, buildDf, Seq("key"), "t", "bt",
              Seq("value"), strat).collect().map(_.toSeq).toSet
            val got = AsOfJoin.joinNative(probeDf, buildDf, Seq("key"), "t", "bt",
              Seq("value"), strat).collect().map(_.toSeq).toSet
            assert(got == want, s"threshold $thr round $round strategy $strat")
          }
        }
      }
    }
  }

  test("self-join (probe and build from the same source) resolves cleanly") {
    import spark.implicits._
    val events = Seq(
      ("u1", 1, "view", 10L), ("u1", 3, "purchase", 0L),
      ("u1", 5, "view", 20L), ("u2", 2, "purchase", 0L))
      .toDF("user", "t", "kind", "price")
    val probes = events.filter(col("kind") === "purchase").select("user", "t")
    val build = events.filter(col("kind") === "view")
      .select(col("user"), col("t").as("pt"), col("price"))
    val got = AsOfJoin.joinNative(probes, build, Seq("user"), "t", "pt", Seq("price"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.get(2))).toSet
    assert(got == Set(("u1", 3, 10L), ("u2", 2, null)))
  }

  test("physical plan is AsOfJoinExec with one exchange and one sort per side") {
    import spark.implicits._
    withThreshold("-1") { // disable the broadcast pick: exercise the merge
      val probeDf = Seq((1L, "a", 5)).toDF("pid", "key", "t")
      val buildDf = Seq(("a", 3, 9L)).toDF("key", "bt", "value")
      val df = AsOfJoin.joinNative(probeDf, buildDf, Seq("key"), "t", "bt", Seq("value"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin ["), plan) // AsOfJoinExec prints as "AsOfJoin"
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val sorts = plan.linesIterator.count(_.contains("Sort ["))
      assert(exchanges == 2, s"want 2 exchanges:\n$plan")
      assert(sorts == 2, s"want 2 sorts:\n$plan")
      assert(!plan.contains("Window"), s"no window stage expected:\n$plan")
      assert(!plan.contains("Union"), s"no union expected:\n$plan")
    }
  }

  test("small build side plans as BroadcastAsOfJoin: zero shuffles, zero sorts") {
    import spark.implicits._
    val probeDf = Seq((1L, "a", 5), (2L, "a", 1), (3L, "b", 9))
      .toDF("pid", "key", "t").repartition(3)
    val buildDf = Seq(("a", 3, 9L), ("b", 8, 5L)).toDF("key", "bt", "value")
    val df = AsOfJoin.joinNative(probeDf, buildDf, Seq("key"), "t", "bt", Seq("value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // The probe side must NOT shuffle or sort (its own repartition above
    // is the only exchange allowed upstream of the join input).
    assert(!plan.linesIterator.exists(_.contains("Exchange hashpartitioning")), plan)
    assert(!plan.linesIterator.exists(_.contains("Sort [")), plan)
    val got = df.collect().map(r => r.getLong(0) -> r.get(3)).toMap
    assert(got === Map(1L -> 9L, 2L -> 9L, 3L -> 5L))
  }

  test("broadcast exec matches merge exec on the null-key/null-time cases") {
    import spark.implicits._
    val probeDf = Seq(
      (1L, Option.empty[String], Option(5)),
      (2L, Option("a"), Option.empty[Int]),
      (3L, Option("a"), Option(4)))
      .toDF("pid", "key", "t")
    val buildDf = Seq(
      (Option.empty[String], Option(3), 7L),
      (Option("a"), Option(1), 11L),
      (Option("a"), Option(9), 13L))
      .toDF("key", "bt", "value")
    def run() = AsOfJoin.joinNative(probeDf, buildDf, Seq("key"), "t", "bt",
      Seq("value"), "backward_then_forward")
      .collect().map(r => r.getLong(0) -> r.get(3)).toMap
    val viaBroadcast = withThreshold("10MB")(run())
    val viaMerge = withThreshold("-1")(run())
    assert(viaBroadcast === viaMerge)
    assert(viaBroadcast === Map(1L -> 7L, 2L -> 11L, 3L -> 11L))
  }

  test("keyless as-of joins on the global time axis (AllTuples, not zip-by-luck)") {
    import spark.implicits._
    // Many input partitions per side with different counts: with the old
    // UnspecifiedDistribution this either threw (unequal counts) or zipped
    // unrelated partitions; AllTuples must collapse both sides first.
    val probeDf = Seq.tabulate(20)(i => (i.toLong, i)).toDF("pid", "t").repartition(7)
    val buildDf = Seq((2, 100L), (10, 200L), (15, 300L)).toDF("bt", "value").repartition(3)
    val got = AsOfJoin.joinNative(probeDf, buildDf, Seq.empty, "t", "bt", Seq("value"))
      .collect().map(r => r.getLong(0) -> r.get(2)).toMap
    assert(got(0L) == 100L) // before first build row: forward fallback
    assert(got(5L) == 100L && got(9L) == 100L)
    assert(got(10L) == 200L && got(14L) == 200L)
    assert(got(15L) == 300L && got(19L) == 300L)
  }

  test("value column sharing a probe column's name resolves by attribute") {
    import spark.implicits._
    val probeDf = Seq((1L, "a", 5, 999L)).toDF("pid", "key", "t", "value")
    val buildDf = Seq(("a", 3, 42L)).toDF("key", "bt", "value")
    val row = AsOfJoin.joinNative(probeDf, buildDf, Seq("key"), "t", "bt", Seq("value"))
      .collect().head
    assert(row.getLong(3) == 999L) // probe's own `value` first…
    assert(row.getLong(4) == 42L)  // …then the build-side value column
  }

  test("SQL asof_time marker: plain SQL reaches the native exec, all strategies") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    AsOfJoinStrategy.register(spark)
    val (probes, build) = randomCase(91)
    probes.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("pid", "key", "t").createOrReplaceTempView("sql_probes")
    build.toDF("key", "bt", "value").createOrReplaceTempView("sql_build")
    Seq("backward", "forward", "backward_then_forward").foreach { strat =>
      // LEFT JOIN = probe-preserving, the AsOfJoin.join contract.
      val df = spark.sql(
        s"""SELECT p.pid, p.key, p.t, b.value
           |FROM sql_probes p LEFT JOIN sql_build b
           |  ON p.key = b.key AND asof_time(p.t, b.bt, '$strat')""".stripMargin)
      val want = AsOfJoin.join(
        spark.table("sql_probes"), spark.table("sql_build"),
        Seq("key"), "t", "bt", Seq("value"), strat)
        .collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet == want, strat)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), s"$strat plan:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        s"$strat fell back to a standard join:\n$plan")
      // Plain JOIN = inner: exactly the matched probe rows, same values.
      val inner = spark.sql(
        s"""SELECT p.pid, p.key, p.t, b.value
           |FROM sql_probes p JOIN sql_build b
           |  ON p.key = b.key AND asof_time(p.t, b.bt, '$strat')""".stripMargin)
        .collect().map(_.toSeq).toSet
      assert(inner == want.filter(_.last != null), s"inner $strat")
    }
    // Two-arg default is backward — DuckDB ASOF convention.
    val dflt = spark.sql(
      """SELECT p.pid, b.value FROM sql_probes p LEFT JOIN sql_build b
        |  ON p.key = b.key AND asof_time(p.t, b.bt)""".stripMargin)
      .collect().map(_.toSeq).toSet
    val wantB = AsOfJoin.join(spark.table("sql_probes"), spark.table("sql_build"),
      Seq("key"), "t", "bt", Seq("value"), "backward")
      .select("pid", "value").collect().map(_.toSeq).toSet
    assert(dflt == wantB)
  }

  test("SQL asof_time marker: unused columns prune through both join shapes") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    AsOfJoinStrategy.register(spark)
    Seq((1L, "a", 5, "wide probe payload"))
      .toDF("pid", "key", "t", "junk_p").createOrReplaceTempView("prune_p")
    Seq(("a", 3, 9L, "wide build payload"))
      .toDF("key", "bt", "value", "junk_b").createOrReplaceTempView("prune_b")
    def node(sql: String) = {
      val df = spark.sql(sql)
      assert(df.collect().map(_.toSeq).toSet == Set(Seq(1L, 9L)), sql)
      df.queryExecution.optimizedPlan
        .collectFirst { case j: AsOfJoinPlan => j }
        .getOrElse(fail(s"no AsOfJoinPlan in: ${df.queryExecution.optimizedPlan}"))
    }
    // LEFT shape: Project directly over the node.
    val l = node(
      """SELECT p.pid, b.value FROM prune_p p LEFT JOIN prune_b b
        |ON p.key = b.key AND asof_time(p.t, b.bt)""".stripMargin)
    assert(!l.left.output.map(_.name).contains("junk_p"), l.left.output)
    assert(!l.rightValues.map(_.name).contains("junk_b"), l.rightValues)
    // INNER shape: Project over the restoring Project over the indicator
    // Filter — the unused payloads must still prune, the match indicator
    // must survive for the filter.
    val i = node(
      """SELECT p.pid, b.value FROM prune_p p JOIN prune_b b
        |ON p.key = b.key AND asof_time(p.t, b.bt)""".stripMargin)
    assert(!i.left.output.map(_.name).contains("junk_p"), i.left.output)
    assert(!i.rightValues.map(_.name).contains("junk_b"), i.rightValues)
    assert(i.rightValues.map(_.name).contains("__asof_matched"), i.rightValues)
  }

  test("SQL asof_time marker: build-side WHERE pre-filters the series (pinned)") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    AsOfJoinStrategy.register(spark)
    Seq((1L, "k", 3)).toDF("pid", "key", "t").createOrReplaceTempView("pf_p")
    Seq(("k", 1, 200L), ("k", 2, 50L))
      .toDF("key", "bt", "price").createOrReplaceTempView("pf_b")
    // Catalyst pushes `price > 100` below the join before the rewrite
    // runs (and EliminateOuterJoin drops LEFT), so the as-of matches the
    // latest QUALIFYING quote — (bt=1, 200) — the filter-then-match
    // semantic the rule's scaladoc documents. DuckDB's textual
    // ASOF-then-WHERE would match (bt=2, 50) and drop the row.
    val preFiltered = spark.sql(
      """SELECT p.pid, b.price FROM pf_p p LEFT JOIN pf_b b
        |ON p.key = b.key AND asof_time(p.t, b.bt)
        |WHERE b.price > 100""".stripMargin).collect().map(_.toSeq)
    assert(preFiltered.toSeq == Seq(Seq(1L, 200L)))
    // A wrapping subquery does NOT change that: PushDownPredicates moves
    // the filter through the projection into the (still-ordinary) join
    // before the rewrite fires — same plan, same result.
    val subquery = spark.sql(
      """SELECT * FROM (
        |  SELECT p.pid, b.price FROM pf_p p LEFT JOIN pf_b b
        |  ON p.key = b.key AND asof_time(p.t, b.bt))
        |WHERE price > 100""".stripMargin).collect().map(_.toSeq)
    assert(subquery.toSeq == Seq(Seq(1L, 200L)))
    // Match-then-filter lives in the column API: the filter sits above
    // AsOfJoinPlan, which Catalyst cannot push into (and the package's
    // own pushdown rule moves only probe-side predicates). The matched
    // row (bt=2, 50) fails the filter and the probe disappears.
    val probes = spark.table("pf_p")
    val build = spark.table("pf_b")
    val api = AsOfJoin.joinNative(probes, build, Seq("key"), "t", "bt",
      Seq("price"), "backward")
      .filter(col("price") > 100)
      .collect()
    assert(api.isEmpty)
  }

  test("SQL asof_time marker: malformed conditions fail loudly") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    AsOfJoinStrategy.register(spark)
    Seq((1L, "a", 5)).toDF("pid", "key", "t").createOrReplaceTempView("bad_p")
    Seq(("a", 3, 9L)).toDF("key", "bt", "value").createOrReplaceTempView("bad_b")
    // Reversed time sides.
    val e1 = intercept[Exception] {
      spark.sql(
        """SELECT * FROM bad_p p JOIN bad_b b
          |ON p.key = b.key AND asof_time(b.bt, p.t)""".stripMargin).collect()
    }
    assert(e1.getMessage.contains("probe"), e1.getMessage)
    // A non-equi extra conjunct spanning both sides.
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT * FROM bad_p p JOIN bad_b b
          |ON p.key = b.key AND asof_time(p.t, b.bt) AND p.t > b.value""".stripMargin)
        .collect()
    }
    assert(e2.getMessage.contains("equi"), e2.getMessage)
    // Unknown strategy literal is a type-check failure at analysis.
    val e3 = intercept[Exception] {
      spark.sql(
        """SELECT * FROM bad_p p JOIN bad_b b
          |ON p.key = b.key AND asof_time(p.t, b.bt, 'sideways')""".stripMargin)
        .collect()
    }
    assert(e3.getMessage.toLowerCase.contains("strategy"), e3.getMessage)
  }

  test("SQL asof_time marker: SQL null semantics (NULL = NULL never matches)") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    AsOfJoinStrategy.register(spark)
    // The Scala API groups null keys together and lets a null-time probe
    // fall forward (window-form parity, pinned below); the SQL surface
    // must instead read like SQL: `p.key = b.key` is never true on NULL,
    // and `>=`/`<` never true on a NULL time — DuckDB ASOF behavior.
    Seq(
      (1L, Option.empty[String], Option(5)), // null key
      (2L, Option("a"), Option.empty[Int]),  // null time
      (3L, Option("a"), Option(4)))          // healthy
      .toDF("pid", "key", "t").createOrReplaceTempView("nul_p")
    Seq(
      (Option.empty[String], Option(3), 7L),  // null build key: dead row
      (Option("a"), Option.empty[Int], 99L),  // null build time: dead row
      (Option("a"), Option(1), 11L),
      (Option("a"), Option(9), 13L))
      .toDF("key", "bt", "value").createOrReplaceTempView("nul_b")
    Seq("backward", "forward", "backward_then_forward").foreach { strat =>
      val left = spark.sql(
        s"""SELECT p.pid, b.value FROM nul_p p LEFT JOIN nul_b b
           |ON p.key = b.key AND asof_time(p.t, b.bt, '$strat')""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap
      // Null-key and null-time probes never match, under EVERY strategy
      // (forward used to spuriously match the earliest build row).
      assert(left(1L) == null, s"$strat null-key probe")
      assert(left(2L) == null, s"$strat null-time probe")
      val healthy = strat match {
        case "forward" => 13L
        case _ => 11L
      }
      assert(left(3L) == healthy, s"$strat healthy probe")
      val inner = spark.sql(
        s"""SELECT p.pid, b.value FROM nul_p p JOIN nul_b b
           |ON p.key = b.key AND asof_time(p.t, b.bt, '$strat')""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap
      assert(inner == Map(3L -> healthy), s"$strat inner")
    }
  }

  test("null keys group together, null times sort first (window-form parity)") {
    import spark.implicits._
    val probeDf = Seq(
      (1L, Option.empty[String], Option(5)),
      (2L, Option("a"), Option.empty[Int]))
      .toDF("pid", "key", "t")
    val buildDf = Seq(
      (Option.empty[String], Option(3), 7L),
      (Option("a"), Option(1), 11L))
      .toDF("key", "bt", "value")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => r.getLong(0) -> r.get(3)).toMap
    val want = run(AsOfJoin.join(probeDf, buildDf, Seq("key"), "t", "bt", Seq("value")))
    val got = run(AsOfJoin.joinNative(probeDf, buildDf, Seq("key"), "t", "bt", Seq("value")))
    assert(got == want)
    // Null key probe matched the null-key build row; null-time probe falls
    // forward to the key's build row.
    assert(got(1L) == 7L && got(2L) == 11L)
  }

  test("unsupported join types with asof_time fail pointedly, not with " +
      "the misleading install-the-rules error") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    AsOfJoinStrategy.register(spark)
    Seq((1L, "a", 5)).toDF("pid", "key", "t").createOrReplaceTempView("rj_p")
    Seq(("a", 3, 9L)).toDF("key", "bt", "value").createOrReplaceTempView("rj_b")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT * FROM rj_p p RIGHT JOIN rj_b b
          |ON p.key = b.key AND asof_time(p.t, b.bt)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("INNER and LEFT OUTER"), e.getMessage)
    assert(!e.getMessage.contains("Install"), e.getMessage)
  }

  test("type-mismatched key/time sides are rejected at plan construction, " +
      "never silently mis-compared") {
    import spark.implicits._
    val p = Seq((1, 5L)).toDF("key", "t")     // int key
    val b = Seq((1L, 3L, 9L)).toDF("key", "bt", "v") // long key
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinNative(p, b, Seq("key"), "t", "bt", Seq("v"))
    }
    assert(e.getMessage.contains("type mismatch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.joinNative(
        Seq((1L, 5)).toDF("key", "t"),        // int time
        Seq((1L, 3L, 9L)).toDF("key", "bt", "v"), // long time
        Seq("key"), "t", "bt", Seq("v"))
    }
    assert(e2.getMessage.contains("time type mismatch"), e2.getMessage)
  }

  test("cardinality stats: the node reports probe-sized output, not the " +
      "children's product") {
    import spark.implicits._
    val p = (1L to 1000L).map(i => (i % 7, i)).toDF("key", "t")
    val b = (1L to 1000L).map(i => (i % 7, i, i * 2)).toDF("key", "bt", "v")
    val joinedDf = AsOfJoin.joinNative(p, b, Seq("key"), "t", "bt", Seq("v"))
    val node = joinedDf.queryExecution.optimizedPlan.collectFirst {
      case n: AsOfJoinPlan => n
    }.get
    val product = node.left.stats.sizeInBytes *
      node.right.stats.sizeInBytes
    assert(node.stats.sizeInBytes < product,
      s"stats ${node.stats.sizeInBytes} should be far below the default " +
        s"product estimate $product")
    assert(node.stats.sizeInBytes >= node.left.stats.sizeInBytes)
  }
}
