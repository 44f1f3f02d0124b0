// Repeat-timing harness: sbt "runMain graft.tools.TimeQuery <sfDir> <n> <query...>"
// Prints per-iteration wall seconds — iteration 1 includes planning +
// codegen compile; the gap to later iterations is fixed overhead, which
// Bench pays once per query.
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
