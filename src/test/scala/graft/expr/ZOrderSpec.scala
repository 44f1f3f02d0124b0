package graft.expr

import java.nio.file.Files

import graft.SparkTestBase
import graft.gold.ZOrderLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  /** Reference interleave, written independently of the expression. */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    var out = 0L
    for (j <- vals.indices; i <- 0 until bits)
      out |= ((vals(j) >>> i) & 1L) << (i * vals.length + j)
    out
  }

  test("codegen'd interleave matches the reference on random values (2 and 3 dims)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(500)((rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong,
      rng.nextInt(1 << 16).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(ZOrder.zOrder(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got2.toSeq == rows.map(r => refZ(Seq(r._1, r._2), 16)))
    val got3 = df.select(ZOrder.zOrder(Seq(col("x"), col("y"), col("w")), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got3.toSeq == rows.map(r => refZ(Seq(r._1, r._2, r._3), 16)))
  }

  test("null input nulls the key; SQL registration works") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = Seq((Option(3), Option(5)), (Option(1), None)).toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val rows = spark.sql("SELECT z_order(8, x, y) AS z FROM zin ORDER BY x").collect()
    assert(rows(0).isNullAt(0)) // (1, null) → null key
    assert(rows(1).getLong(0) == refZ(Seq(3L, 5L), 8))
  }

  test("z-order layout bounds per-file spans in ALL clustered dimensions") {
    import spark.implicits._
    val n = 128
    val pts = for { x <- 0 until n; y <- 0 until n } yield (x, y)
    val df = pts.toDF("x", "y")
    val dir = Files.createTempDirectory("graft_zorder").toString

    ZOrderLayout.write(df, s"$dir/z", Seq("x", "y"), bitsPerDim = 7, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/xsort")

    def spans(path: String): Array[(Int, Int)] = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))

    val z = spans(s"$dir/z")
    // A contiguous z-range is (nearly) a quad-tree block, EXCEPT the few
    // files straddling a high-bit boundary (the z-jump), which span one
    // dimension widely. So: most files tight in BOTH dims, and total span
    // mass well under the single-sort control.
    assert(z.count { case (xs, ys) => xs <= 100 && ys <= 100 } >= z.length - 3,
      s"z spans too wide: ${z.mkString(",")}")
    // Control: single-column sort leaves the other dimension unclustered —
    // every file spans (almost) the full y domain.
    val xsorted = spans(s"$dir/xsort")
    assert(xsorted.forall(_._2 >= 120))
    val zTotal = z.map { case (a, b) => a + b }.sum
    val cTotal = xsorted.map { case (a, b) => a + b }.sum
    assert(zTotal < 0.75 * cTotal, s"z=$zTotal control=$cTotal")
  }
}
