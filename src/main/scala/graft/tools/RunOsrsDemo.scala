package graft.tools

import java.nio.file.{Files, Paths}
import java.time.{ZonedDateTime, ZoneOffset}

import graft.OsrsPipeline
import graft.config.{ConfigLoader, Toml}
import graft.gold.GoldSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo program: synthesize a raw clan-chat message log from the
  * event fixtures, load the REFERENCE'S OWN TOML config files, run the full
  * pipeline, and publish every gold table through the blue/green sink.
  *
  *   sbt "runMain graft.tools.RunOsrsDemo /tmp/graft_gold"
  *
  * This is the whole reference system as one Spark driver program: config →
  * parse → enrich → ~30 gold tables → atomic publish.
  */
object RunOsrsDemo {
  def main(args: Array[String]): Unit = {
    val goldRoot = args.headOption.getOrElse("/tmp/graft_gold_demo")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-osrs-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(p: String) = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
    val refDir = "/root/reference/src"
    val config =
      if (Files.exists(Paths.get(s"$refDir/config.example.toml")))
        ConfigLoader.pipelineConfig(
          read(s"$refDir/config.example.toml"),
          read(s"$refDir/historical_personal_bests.example.toml"),
          read(s"$refDir/historical_collection_logs.example.toml"))
      else OsrsPipeline.Config()

    // Synthetic raw log: one OSRS-shaped line per fixture event.
    val coins = format_number(round(col("value") * 1000, 0).cast("long"), 0)
    val msg = when(col("event_type") === "purchase",
      format_string("user_%d received a drop: Item_%d (%s coins) from Mob_%d.",
        col("user_id"), pmod(col("event_id"), lit(50)), coins, pmod(col("event_id"), lit(7))))
      .when(col("event_type") === "click",
        format_string("user_%d has reached Attack level %d.",
          col("user_id"), pmod(col("event_id"), lit(98)) + 2))
      .when(col("event_type") === "signup",
        format_string("user_%d has achieved a new Zulrah personal best: %d:%02d",
          col("user_id"), pmod(col("event_id"), lit(3)) + 1, pmod(col("event_id"), lit(60))))
      .when(col("event_type") === "view",
        format_string("user_%d received a new collection log item: Item_%d (%d/1577)",
          col("user_id"), pmod(col("event_id"), lit(50)), pmod(col("event_id"), lit(1400))))
      .otherwise(format_string("<:Owner:1>**user_%d**: gz %d", col("user_id"), col("event_id")))

    val raw = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id").as("id"), col("ts").as("timestamp"), msg.as("raw_content"))

    val gold = OsrsPipeline.run(raw,
      ZonedDateTime.of(2024, 2, 5, 12, 0, 0, 0, ZoneOffset.UTC), config)

    val sink = new GoldSink(goldRoot)
    val liveDir = sink.publish(gold)
    println(s"[demo] published ${gold.size} gold tables to $liveDir")
    gold.keys.toSeq.sorted.foreach { name =>
      val n = spark.read.parquet(s"$liveDir/$name").count()
      println(f"[demo]   $name%-40s $n%6d rows")
    }
    spark.stop()
  }
}
