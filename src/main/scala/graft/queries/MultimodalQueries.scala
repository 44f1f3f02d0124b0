package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing under the oracle gate: documents wrap as opaque
  * binary payloads, run the typed `mapPartitions` decode / feature /
  * frame-sample transforms, and the DuckDB oracle replicates the
  * md5-derived `DECODE_STUB` bodies — so the schema, batch shape, null
  * routing and fan-out of the multimodal path are hash-checked end-to-end
  * even though the codec bodies are deterministic fakes (no image/audio
  * libraries in this container; see [[graft.multimodal.Multimodal]]).
  */
object MultimodalQueries extends QueryGroup {

  private val h60 = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    // Decode + quality gate: stats per payload, low-luma rows dropped —
    // the metadata-only projection that downstream joins should use
    // (payloads never cross a shuffle).
    "q_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(s, dir), "doc_id", "text", "image")
      Multimodal.decodeImages(media).toDF()
        .filter(col("mean_luma") >= 0.25)
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("mean_luma"))
    }),

    // Fixed-dim fake embedding, exploded to (id, dim_idx, val) so the
    // float payload compares exactly after a 3-decimal round.
    "q_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(s, dir), "doc_id", "text", "image")
      Multimodal.extractFeatures(media, dim = 8).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("int").as("dim_idx"),
          round(col("col").cast("double"), 3).as("val"))
    }),

    // Video frame-sampling fan-out: every 5th frame, 4 frames per video.
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text", "video").toDF()
      Multimodal.sampleFrames(media, stride = 5, maxFrames = 4)
        .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"))
    }))

  val oracles: Map[String, String] = Map(
    "q_multimodal_decode" ->
      s"""WITH h AS (SELECT doc_id, $h60 AS h FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(64 + h % 512 AS INT) AS width,
         |  CAST(64 + (h // 512) % 512 AS INT) AS height,
         |  CAST(3 AS INT) AS channels,
         |  ((h // 262144) % 1000) / 1000.0 AS mean_luma
         |FROM h
         |WHERE ((h // 262144) % 1000) / 1000.0 >= 0.25""".stripMargin,
    "q_multimodal_features" ->
      s"""WITH h AS (SELECT doc_id, $h60 % 1048576 AS h FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(d AS INT) AS dim_idx,
         |  round(((h * 31 + d) % 1000) / 1000.0, 3) AS val
         |FROM h, range(0, 8) t(d)""".stripMargin,
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
        |FROM documents, range(0, 20, 5) t(f)
        |WHERE doc_id % 3 = 0""".stripMargin)
}
