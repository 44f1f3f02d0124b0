package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CdcChunksSpec extends AnyFunSuite with SparkTestBase {

  private def chunk(bytes: Array[Byte], min: Int = 16, bits: Int = 5,
      max: Int = 128): Seq[(Int, Int, Long)] = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("b")
      .select(explode(CdcChunks.chunks(col("b"), min, bits, max)).as("c"))
      .select("c.offset", "c.length", "c.hash")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
  }

  private def synth(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => (((i * 131) ^ (seed * 31) ^ (i >> 3)) % 251).toByte)

  test("chunks tile the input exactly and respect size bounds") {
    val data = synth(5000, 1)
    val got = chunk(data)
    assert(got.head._1 == 0)
    got.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ => ()
    }
    assert(got.map(_._2).sum == data.length)
    // Every chunk but the last within [min, max].
    got.dropRight(1).foreach { case (_, l, _) =>
      assert(l >= 16 && l <= 128, s"length $l")
    }
    assert(got.last._2 >= 1 && got.last._2 <= 128)
    // avgBits=5 → expected chunk ≈ 16 + 32; a 5000-byte input splits well.
    assert(got.size > 40, s"${got.size} chunks")
  }

  test("boundaries are shift-resistant: prepending bytes preserves most chunks") {
    val data = synth(8000, 2)
    val shifted = Array[Byte](7, 77, -3) ++ data
    val a = chunk(data).map(_._3)
    val b = chunk(shifted).map(_._3)
    val shared = a.toSet.intersect(b.toSet).size
    // A fixed-size chunker would share ~0 after a 3-byte shift; CDC
    // re-synchronizes after the first boundary.
    assert(shared >= a.size * 6 / 10, s"shared $shared of ${a.size}")
  }

  test("identical content anywhere in two payloads yields shared hashes") {
    val common = synth(4000, 3)
    val p1 = synth(500, 4) ++ common
    val p2 = synth(900, 5) ++ common
    val h1 = chunk(p1).map(_._3).toSet
    val h2 = chunk(p2).map(_._3).toSet
    assert(h1.intersect(h2).size >= 30, s"${h1.intersect(h2).size}")
  }

  test("empty and tiny inputs") {
    assert(chunk(Array.emptyByteArray).isEmpty)
    val one = chunk(Array[Byte](42))
    assert(one == Seq((0, 1, one.head._3)))
  }

  test("property: tiling + bounds hold over randomized inputs and params") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 60) {
      val n = rnd.nextInt(4000)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val min = 1 + rnd.nextInt(64)
      val max = min + 1 + rnd.nextInt(256)
      val bits = 1 + rnd.nextInt(10)
      val got = CdcChunks.run(bytes, min, bits, max).array
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow])
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      assert(got.map(_._2).sum == n, s"n=$n min=$min bits=$bits max=$max")
      got.headOption.foreach { case (o, _, _) => assert(o == 0) }
      got.sliding(2).foreach {
        case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
        case _ => ()
      }
      got.dropRight(1).foreach { case (_, l, _) => assert(l <= max) }
      got.foreach { case (_, l, _) => assert(l >= 1 && l <= max) }
    }
  }

  test("deterministic across partitioning and repeated runs") {
    import spark.implicits._
    val rows = (0 until 40).map(i => (i.toLong, synth(2000 + i * 13, i)))
    def run(parts: Int) = rows.toDF("id", "b").repartition(parts)
      .select(col("id"), explode(CdcChunks.chunks(col("b"), 16, 5, 128)).as("c"))
      .select(col("id"), col("c.hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1) == run(7))
  }
}
