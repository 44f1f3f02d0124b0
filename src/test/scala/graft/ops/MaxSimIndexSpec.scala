package graft.ops

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted token index must serve probe batches with EXACTLY the
  * rows the inline [[MaxSim.topKViaAnnMd5]] produces on the same knobs,
  * amortize one build across many probe batches, stay crash-safe behind
  * the generation marker, and append idempotently.
  */
class MaxSimIndexSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // The MaxSimSpec clustered fixture: 4 tokens per doc along cluster
  // axes with deterministic noise.
  private def toks(n: Int = 60): DataFrame = (for {
    i <- 0 until n
    t <- 0 until 4
  } yield {
    val axis = (i % 6) * 4 + t
    val v = Array.tabulate(24)(d =>
      (if (d == axis) 3.0 else 0.0) + (((i * 31 + d * 7 + t * 13) % 11) - 5) / 20.0)
    (i.toLong, t, v)
  }).toDF("id", "pos", "tv")

  private def canon(df: DataFrame): Set[(Long, Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      math.rint(r.getDouble(3) * 1e6) / 1e6)).toSet

  test("persisted probe equals inline topKViaAnnMd5; many batches reuse " +
    "one artifact") {
    val c = toks()
    val path = Files.createTempDirectory("maxsim_idx").toString
    MaxSimIndex.write(spark, path, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    for (lo <- Seq(0L, 6L)) {
      val probes = c.filter(col("id") >= lo && col("id") < lo + 6)
      val want = canon(MaxSim.topKViaAnnMd5(probes, c, "id", "pos", "tv",
        k = 3, dims = 24, tokenK = 8, numPlanes = 3, tables = 2,
        simPrecision = 6))
      val got = canon(MaxSimIndex.topK(spark, path, probes,
        "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
      assert(got == want && got.nonEmpty, s"batch at $lo")
    }
  }

  test("append: delta docs probe identically to a from-scratch build; " +
    "replayed append is a counted no-op") {
    val c = toks(48)
    val first = c.filter(col("id") < 36)
    val delta = c.filter(col("id") >= 36)
    val path = Files.createTempDirectory("maxsim_idx_app").toString
    MaxSimIndex.write(spark, path, first, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    MaxSimIndex.append(spark, path, delta, "id", "pos", "tv")
    val scratch = Files.createTempDirectory("maxsim_idx_scr").toString
    MaxSimIndex.write(spark, scratch, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    val probes = c.filter(col("id") < 4 || col("id") >= 44)
    def probeOf(p: String) = canon(MaxSimIndex.topK(spark, p, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    assert(probeOf(path) == probeOf(scratch))
    // Replay: same delta again — nothing appended twice.
    val rowsBefore = spark.read.parquet(
      s"$path/${MaxSimIndex.liveVersion(spark, path)}/toks").count()
    MaxSimIndex.append(spark, path, delta, "id", "pos", "tv")
    val rowsAfter = spark.read.parquet(
      s"$path/${MaxSimIndex.liveVersion(spark, path)}/toks").count()
    assert(rowsBefore == rowsAfter, "replayed append added rows")
    assert(probeOf(path) == probeOf(scratch))
  }

  test("row-level replay guard heals a torn append") {
    val c = toks(48)
    val first = c.filter(col("id") < 36)
    val delta = c.filter(col("id") >= 36)
    val path = Files.createTempDirectory("maxsim_idx_torn_app").toString
    MaxSimIndex.write(spark, path, first, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    // "Torn" append: only half of each delta doc's tokens landed (the
    // crash-mid-append visibility state). A doc-level guard would see
    // these ids as stored and freeze the damage forever.
    MaxSimIndex.append(spark, path, delta.filter(col("pos") < 2),
      "id", "pos", "tv")
    // Redelivery of the FULL batch appends exactly the missing rows.
    MaxSimIndex.append(spark, path, delta, "id", "pos", "tv")
    val scratch = Files.createTempDirectory("maxsim_idx_torn_scr").toString
    MaxSimIndex.write(spark, scratch, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    val probes = c.filter(col("id") >= 44)
    def probeOf(p: String) = canon(MaxSimIndex.topK(spark, p, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    assert(probeOf(path) == probeOf(scratch))
  }

  test("delete masks before the tokenK cut (probe == survivors build), " +
    "compact folds physically, re-append resurrects") {
    val c = toks(48)
    val dead = c.filter(col("id") >= 36)
    val surv = c.filter(col("id") < 36)
    val path = Files.createTempDirectory("maxsim_idx_del").toString
    MaxSimIndex.write(spark, path, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    MaxSimIndex.delete(spark, path,
      dead.select("id").distinct(), "id")
    val scratch = Files.createTempDirectory("maxsim_idx_del_scr").toString
    MaxSimIndex.write(spark, scratch, surv, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    val probes = c.filter(col("id") < 6)
    def probeOf(p: String) = canon(MaxSimIndex.topK(spark, p, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    assert(probeOf(path) == probeOf(scratch) && probeOf(path).nonEmpty)
    // Mask-only until compact: the raw tree still holds every row.
    def rawRows() = spark.read.parquet(
      s"$path/${MaxSimIndex.liveVersion(spark, path)}/toks").count()
    val before = rawRows()
    MaxSimIndex.compact(spark, path)
    assert(rawRows() < before, "compact did not drop masked rows")
    assert(!new java.io.File(
      s"$path/${MaxSimIndex.liveVersion(spark, path)}/tombstones").exists())
    assert(probeOf(path) == probeOf(scratch))
    // Post-compact, the replay guard no longer knows the ids: re-append
    // resurrects them and probes equal the full build again.
    MaxSimIndex.append(spark, path, dead, "id", "pos", "tv")
    val full = Files.createTempDirectory("maxsim_idx_del_full").toString
    MaxSimIndex.write(spark, full, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    assert(probeOf(path) == probeOf(full))
  }

  test("replayed and never-stored deletes append nothing") {
    val c = toks(24)
    val path = Files.createTempDirectory("maxsim_idx_del_replay").toString
    MaxSimIndex.write(spark, path, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    import spark.implicits._
    MaxSimIndex.delete(spark, path, Seq(3L).toDF("id"), "id")
    val live = MaxSimIndex.liveVersion(spark, path)
    def tombRows() = spark.read.parquet(s"$path/$live/tombstones").count()
    val t1 = tombRows()
    MaxSimIndex.delete(spark, path, Seq(3L, 999L).toDF("id"), "id")
    assert(tombRows() == t1, "replayed/never-stored delete appended")
  }

  test("empty bootstrap: write over an empty token table, then append " +
    "and probe — the documented streaming bootstrap path") {
    val c = toks(24)
    val path = Files.createTempDirectory("maxsim_idx_boot").toString
    // Initial generation over ZERO rows: partitionBy emits no parquet
    // data files, so reads must fall back to the canonical schema
    // instead of dying on inference.
    MaxSimIndex.write(spark, path, c.filter(col("id") < 0), "id", "pos",
      "tv", dims = 24, numPlanes = 3, tables = 2)
    // topK over the empty artifact: zero rows, not an exception.
    assert(MaxSimIndex.topK(spark, path, c.filter(col("id") < 3),
      "id", "pos", "tv", k = 2, tokenK = 8, simPrecision = 6).count() == 0)
    // First append fills it; probes then equal a from-scratch build.
    MaxSimIndex.append(spark, path, c, "id", "pos", "tv")
    val scratch = Files.createTempDirectory("maxsim_idx_boot_scr").toString
    MaxSimIndex.write(spark, scratch, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    val probes = c.filter(col("id") < 4)
    def probeOf(p: String) = canon(MaxSimIndex.topK(spark, p, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    assert(probeOf(path) == probeOf(scratch) && probeOf(path).nonEmpty)
  }

  test("non-integral ids fail fast instead of writing a corrupt index") {
    val bad = toks(8).select(concat(lit("d-"),
      col("id").cast("string")).as("id"), col("pos"), col("tv"))
    val path = Files.createTempDirectory("maxsim_idx_badid").toString
    val e = intercept[IllegalArgumentException] {
      MaxSimIndex.write(spark, path, bad, "id", "pos", "tv", dims = 24)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("a torn rebuild leaves the previous generation live; a committed " +
    "one retires it") {
    val c = toks(36)
    val path = Files.createTempDirectory("maxsim_idx_torn").toString
    MaxSimIndex.write(spark, path, c.filter(col("id") < 24),
      "id", "pos", "tv", dims = 24, numPlanes = 3, tables = 2)
    val v1 = MaxSimIndex.liveVersion(spark, path)
    // Torn writer: a higher-numbered tree with data but NO commit marker.
    val torn = new java.io.File(s"$path/tokens_v9/toks")
    torn.mkdirs()
    assert(MaxSimIndex.liveVersion(spark, path) == v1)
    assert(MaxSimIndex.topK(spark, path,
      c.filter(col("id") < 3), "id", "pos", "tv", k = 2,
      tokenK = 8, simPrecision = 6).count() > 0)
    // A real rebuild commits PAST the torn number and retires both.
    MaxSimIndex.write(spark, path, c, "id", "pos", "tv", dims = 24,
      numPlanes = 3, tables = 2)
    assert(MaxSimIndex.liveVersion(spark, path) == "tokens_v10")
    assert(!new java.io.File(s"$path/$v1").exists())
    assert(!new java.io.File(s"$path/tokens_v9").exists())
  }

  test("probe uses the generation's own knobs from meta.json") {
    val c = toks(36)
    val path = Files.createTempDirectory("maxsim_idx_meta").toString
    MaxSimIndex.write(spark, path, c, "id", "pos", "tv", dims = 24,
      numPlanes = 2, tables = 3)
    val m = MaxSimIndex.readMeta(spark,
      s"$path/${MaxSimIndex.liveVersion(spark, path)}")
    assert(m == MaxSimIndex.Meta(24, 2, 3))
    val want = canon(MaxSim.topKViaAnnMd5(c.filter(col("id") < 5), c,
      "id", "pos", "tv", k = 3, dims = 24, tokenK = 6, numPlanes = 2,
      tables = 3, simPrecision = 6))
    val got = canon(MaxSimIndex.topK(spark, path, c.filter(col("id") < 5),
      "id", "pos", "tv", k = 3, tokenK = 6, simPrecision = 6))
    assert(got == want)
  }
}
