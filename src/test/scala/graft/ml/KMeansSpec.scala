package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class KMeansSpec extends AnyFunSuite with SparkTestBase {

  // Two tight planted blobs far apart: k=2 must separate them perfectly
  // whatever the seeds landed on.
  private def blobs = {
    import spark.implicits._
    val a = (0L until 20L).map(i => (i, Array(10.0f + (i % 3) * 0.01f, 10.0f)))
    val b = (100L until 120L).map(i => (i, Array(-10.0f, -10.0f + (i % 3) * 0.01f)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("two planted blobs separate perfectly at k=2") {
    val out = KMeans.fitAssign(blobs, "vec_id", "embedding", k = 2, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val blobA = out.filter(_._1 < 100L).values.toSet
    val blobB = out.filter(_._1 >= 100L).values.toSet
    assert(blobA.size == 1 && blobB.size == 1 && blobA != blobB)
  }

  test("assignments and distances are partition-invariant") {
    val base = KMeans.fitAssign(blobs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val repart = KMeans.fitAssign(blobs.repartition(7), "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(base.sameElements(repart))
  }

  test("fit matches a sequential driver-side model bit-for-bit") {
    import spark.implicits._
    // Deterministic pseudo-random 6-dim vectors (no Math.random — rerun
    // identity matters more than realism here).
    val rows = (0L until 80L).map { i =>
      (i, Array.tabulate(6)(d => (((i * 2654435761L + d * 40503L) % 2000L) - 1000L) / 400.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", k = 4, iterations = 3)

    // Sequential re-derivation with the same integer rules.
    val scale = 1000L
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong)
    }
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    var cents = q.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(4).map(_._2.clone()).toArray
    def nearest(v: Array[Long]): Int =
      cents.zipWithIndex.map { case (c, j) =>
        (c.map(x => x * x).sum - 2L * c.zip(v).map { case (a, b) => a * b }.sum, j)
      }.min._2
    for (_ <- 1 to 3) {
      val groups = q.groupBy { case (_, v) => nearest(v) }
      cents = cents.zipWithIndex.map { case (old, j) =>
        groups.get(j) match {
          case Some(members) =>
            Array.tabulate(old.length) { d =>
              val s = members.map(_._2(d)).sum
              math.floorDiv(s, members.size.toLong) // sums exact; floor div
            }
          case None => old
        }
      }
    }
    assert(model.centroids.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
  }

  test("empty input fits the degenerate model and assigns nothing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val model = KMeans.fit(empty, "vec_id", "embedding", k = 3, iterations = 2)
    assert(model.centroids.isEmpty)
    assert(KMeans.assign(blobs, "vec_id", "embedding",
      KMeans.fit(blobs, "vec_id", "embedding", 2, 0)).count() == 40L)
  }
}
