package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val cur = () => graft.queries.TextQueries.queries("q_text_curation")(spark, sfDir)
    val ded = () => graft.queries.DedupQueries.queries("q_dedup_exact")(spark, sfDir)
    time("dedup_exact cold")(ded().count())
    time("dedup_exact warm")(ded().count())
    time("curation cold")(cur().count())
    time("curation warm")(cur().count())
    time("curation warm2")(cur().count())
    cur().explain("formatted")
    spark.stop()
  }
}
