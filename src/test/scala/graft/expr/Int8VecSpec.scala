package graft.expr

import graft.SparkTestBase
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Int8VecSpec extends AnyFunSuite with SparkTestBase {

  test("pack roundtrips signed bytes; out-of-range codes are rejected") {
    import spark.implicits._
    val packed = Seq(Tuple1(Seq(-128, -1, 0, 1, 127)))
      .toDF("c").select(Int8Vec.packInt8(col("c"))).as[Array[Byte]].head()
    assert(packed.toSeq == Seq(-128, -1, 0, 1, 127).map(_.toByte))
    val bad = Seq(Tuple1(Seq(128))).toDF("c")
      .select(Int8Vec.packInt8(col("c")))
    intercept[Exception](bad.collect())
  }

  test("packed dot equals the array-form quantized dot and a scala model") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 40).map { i =>
      (i.toLong,
        Array.fill(24)((rnd.nextFloat() - 0.5f) * 3f),
        Array.fill(24)((rnd.nextFloat() - 0.5f) * 3f))
    }
    val df = rows.toDF("id", "a", "b")
    val qa = Similarity.quantizeInt8(col("a"))
    val qb = Similarity.quantizeInt8(col("b"))
    val got = df.select(col("id"),
        Int8Vec.int8Dot(Int8Vec.packInt8(qa.getField("codes")),
          Int8Vec.packInt8(qb.getField("codes"))).as("packed"),
        aggregate(zip_with(qa.getField("codes"), qb.getField("codes"),
          (x, y) => (x * y).cast("long")), lit(0L), (s, v) => s + v).as("arr"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, packed, arr) => assert(packed == arr, s"row $id") }
  }

  test("length mismatch NULLS the dot — schema drift must not read as a " +
      "plausible prefix similarity; null inputs propagate") {
    import spark.implicits._
    val df = Seq((Seq(2, 3, 4), Seq(5, 6))).toDF("a", "b")
    val d = df.select(Int8Vec.int8Dot(Int8Vec.packInt8(col("a")),
      Int8Vec.packInt8(col("b"))).as("d")).collect()
    assert(d.head.isNullAt(0),
      "mismatched dims silently dotted their common prefix")
    val n = Seq((Some(Seq(1)), Option.empty[Seq[Int]])).toDF("a", "b")
      .select(Int8Vec.int8Dot(Int8Vec.packInt8(col("a")),
        Int8Vec.packInt8(col("b"))).as("d")).collect()
    assert(n.head.isNullAt(0))
  }

  test("a null ELEMENT nulls the packed vector (and so the dot)") {
    import spark.implicits._
    // A corrupt codes array must not pack its null as a silent 0 — the
    // dot would read as a plausible similarity instead of surfacing the
    // data bug.
    val df = Seq((Seq(Some(5), None, Some(3)), Seq(Some(1), Some(2), Some(4))))
      .toDF("a", "b")
    val r = df.select(
      Int8Vec.packInt8(col("a")).as("pa"),
      Int8Vec.int8Dot(Int8Vec.packInt8(col("a")),
        Int8Vec.packInt8(col("b"))).as("d")).collect()
    assert(r.head.isNullAt(0) && r.head.isNullAt(1))
  }

  test("pack_int8 / int8_dot are registered SQL functions") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT int8_dot(pack_int8(array(1, 2)), pack_int8(array(3, 4))) AS d")
      .head().getLong(0)
    assert(r == 11L)
  }
}
