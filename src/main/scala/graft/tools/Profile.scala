// Empirical per-stage profile (guide §1.1 without the UI): run one or
// more queries at bench-shaped settings and print, for every stage the
// query triggered, its wall time, task count, shuffle read/write bytes
// and input bytes — the "where is the time actually going" table.
//   sbt "runMain graft.tools.Profile <sfDir> <query...>"
package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, ms: Long, tasks: Int,
        inMB: Double, srMB: Double, swMB: Double)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n'), ms,
            i.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    })

    // Per-operator metrics (the SQL-tab view): walk the executed plan,
    // descending into adaptive/query-stage/cached wrappers.
    def walk(p: org.apache.spark.sql.execution.SparkPlan,
        depth: Int, out: StringBuilder): Unit = {
      import org.apache.spark.sql.execution._
      val ms = p.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
      out.append("  " * depth).append(p.nodeName)
      if (ms.nonEmpty) out.append("  [").append(ms.take(8).mkString(", ")).append("]")
      out.append('\n')
      val children: Seq[SparkPlan] = p match {
        case a: adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: adaptive.QueryStageExec => Seq(q.plan)
        case r: exchange.ReusedExchangeExec => Seq(r.child)
        case c: columnar.InMemoryTableScanExec =>
          Seq(c.relation.cachedPlan)
        case s: SubqueryExec => Seq(s.child)
        case o => o.children
      }
      children.foreach(walk(_, depth + 1, out))
    }

    names.foreach { name =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val sb = new StringBuilder
      walk(df.queryExecution.executedPlan, 0, sb)
      println(sb.result())
      // Listener events drain asynchronously.
      Thread.sleep(500)
      println(f"\n===== $name: $sec%.2f s =====")
      val ss = stages.synchronized(stages.sortBy(-_.ms).toSeq)
      println(f"${"stage"}%6s ${"ms"}%8s ${"tasks"}%6s ${"input"}%9s " +
        f"${"shRead"}%9s ${"shWrite"}%9s  name")
      ss.takeWhile(_.ms > 0).take(40).foreach { s =>
        println(f"${s.id}%6d ${s.ms}%8d ${s.tasks}%6d ${s.inMB}%8.1fM " +
          f"${s.srMB}%8.1fM ${s.swMB}%8.1fM  ${s.name.take(60)}")
      }
      val totalMs = ss.map(_.ms.max(0)).sum
      println(f"stages: ${ss.size}, summed stage ms: $totalMs (wall ${sec * 1000}%.0f)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
