package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver-run): times every declared query at the target
  * scale factor on a local[N] session configured the way the engine is
  * meant to run — shuffle partitions sized to cores, AQE on — and prints
  * ONE JSON line with per-query wall seconds.
  *
  * Each timing covers plan construction + full execution to a count()
  * action (results are not collected; count keeps the whole plan, since
  * every query ends in a projection/aggregation that count cannot prune).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JVM + catalog warm-up on the smallest table so the first measured
    // query doesn't pay one-time session costs.
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also land the line in a file: sbt prefixes stdout with [info], which
    // can defeat a line-oriented JSON parse downstream.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
