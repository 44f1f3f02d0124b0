package graft.ops

import java.nio.file.Files

import graft.SparkTestBase
import graft.ml.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generation retention + rollback ([[VersionedTree]] `retain`): a
  * commit with retain = N keeps the newest N committed generations —
  * buying [[GraphIndex.rollback]]-style undo — while torn trees are
  * always garbage-collected, readers always resolve the newest commit,
  * and retain = 1 (the default) keeps today's live-only behavior.
  */
class TreeRetentionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def vec(i: Long): Array[Double] =
    Array.tabulate(6)(d =>
      (if (d == (i % 6).toInt) 4.0 else 0.0) +
        (((i * 31 + d * 7) % 11) - 5) / 40.0)

  private def corpusDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def gens(path: String, prefix: String): Seq[String] =
    new java.io.File(path).listFiles()
      .map(_.getName).filter(_.matches(s"${prefix}_v\\d+")).sorted.toSeq

  test("GraphIndex: retain=2 keeps history, rollback restores the " +
    "previous generation, retain=1 trims back to live-only") {
    val path = Files.createTempDirectory("gidx_retain").toString
    GraphIndex.write(spark, path, corpusDf(0L until 36L),
      "vec_id", "embedding", k = 4, rounds = 6, simPrecision = 6,
      retain = 2)
    def edges(): Set[(Long, Long)] =
      GraphIndex.edges(spark, path).select("id", "nbr")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e1 = edges()
    assert(gens(path, "graph") == Seq("graph_v1"))

    // A maintenance commit with retain=2: both generations stay on
    // disk, readers see the new one.
    GraphIndex.applyMaintenanceBatch(spark, path,
      corpusDf(36L until 40L), "vec_id", "embedding", k = 4, rounds = 6,
      simPrecision = 6, retain = 2)
    assert(gens(path, "graph") == Seq("graph_v1", "graph_v2"))
    val e2 = edges()
    assert(e2 != e1 && e2.exists(_._1 >= 36L))

    // Rollback: the bad generation retires, the previous serves again.
    GraphIndex.rollback(spark, path)
    assert(gens(path, "graph") == Seq("graph_v1"))
    assert(edges() == e1, "rollback must restore the previous reads")
    // No history left: a second rollback fails fast.
    assertThrows[IllegalArgumentException](GraphIndex.rollback(spark, path))

    // Default retain=1 trims history back to live-only.
    GraphIndex.applyMaintenanceBatch(spark, path,
      corpusDf(36L until 40L), "vec_id", "embedding", k = 4, rounds = 6,
      simPrecision = 6, retain = 2)
    GraphIndex.applyMaintenanceBatch(spark, path,
      corpusDf(40L until 44L), "vec_id", "embedding", k = 4, rounds = 6,
      simPrecision = 6) // retain defaults to 1
    assert(gens(path, "graph").size == 1, gens(path, "graph").toString)
  }

  test("PqIndex: rollback across a rebuild restores the earlier " +
    "corpus's probes; torn trees never count as history") {
    val c = corpusDf(0L until 48L)
    val model = Pq.fit(c, "vec_id", "embedding", dims = 6, m = 2,
      k = 4, iterations = 1)
    val cent = c.filter(pmod(col("vec_id"), lit(8)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    val path = Files.createTempDirectory("pq_retain").toString
    PqIndex.write(spark, path, c, "vec_id", "embedding", cent, model)
    def probe(): Set[(Long, Long)] =
      PqIndex.topK(spark, path, c.filter(col("vec_id") < 4),
          "vec_id", "embedding", k = 3, candidateK = 10, nprobe = 2)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = probe()

    // Torn leftover between the commits must not pollute retention.
    new java.io.File(s"$path/pq_v5/lists").mkdirs()
    PqIndex.write(spark, path, c.filter(col("vec_id") < 24),
      "vec_id", "embedding", cent, model, retain = 2)
    assert(gens(path, "pq") == Seq("pq_v1", "pq_v6"),
      gens(path, "pq").toString)
    val half = probe()
    assert(half != full)

    PqIndex.rollback(spark, path)
    assert(gens(path, "pq") == Seq("pq_v1"))
    assert(probe() == full, "rollback must restore the earlier corpus")
  }
}
