package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "first payload"), (2L, "second payload"), (3L, "third"))
      .toDF("doc_id", "text")
  }

  test("binary wrap + stubbed decode is deterministic and schema-typed") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "image")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "source_uri"))
    assert(media.schema("payload").dataType.typeName == "binary")

    val d1 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq) // deterministic stub
    assert(d1.length == 3)
    assert(d1.forall(r => r.width >= 64 && r.height >= 64 && r.channels == 3))
  }

  test("feature extraction emits fixed-dim vectors per payload") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "image")
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.feature.length == 8))
    // distinct payloads → distinct features (hash-derived)
    assert(feats.map(_.feature.toSeq).distinct.length == 3)
  }

  test("frame sampling fans out only video rows") {
    import spark.implicits._
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "video").toDF()
      .unionByName(Multimodal.mediaFromText(docs, "doc_id", "text", "image").toDF()
        .withColumn("media_id", col("media_id") + 100))
    val frames = Multimodal.sampleFrames(media, stride = 5, maxFrames = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.map(_._1).toSet == Set(1L, 2L, 3L)) // only the video rows
    assert(frames.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0, 5, 10, 15))
  }
}
