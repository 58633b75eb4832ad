package graft.llm

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed in batches the way a Pandas-UDF / mapInPandas pipeline would.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * deterministic fake (byte statistics), but the Spark-side shape is real:
  * binary column, per-batch iteration in `mapPartitions` (the JVM analog of
  * a mapInPandas batch), metadata projection, and partition-friendly
  * layout. Swap `fakeDecode` for a real codec and nothing else changes.
  *
  * Rows-only check (no SQL oracle): binary batch processing is not
  * SQL-expressible.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeature(
      doc_id: Long, media_type: String, payload_bytes: Long,
      feat_mean: Double, n_frames: Long, batch_size: Long)

  /** Deterministic stand-in for a codec: byte-level statistics. */
  private def fakeDecode(payload: Array[Byte]): (Double, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    val frames = 1L + (sum % 16) // "frame-sample": pick a stable frame count
    (mean, frames)
  }

  def multimodalPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3L)) + 1L).cast("int")).as("media_type"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
    // Batched "decode": iterate each partition in fixed-size batches, the
    // same shape a mapInPandas arrow-batch pipeline has.
    media.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch =>
        batch.map { r =>
          val (mean, frames) = fakeDecode(r.payload)
          MediaFeature(r.doc_id, r.media_type, r.payload.length.toLong,
            mean, if (r.media_type == "video") frames else 1L, batch.size.toLong)
        }
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_pipeline" -> multimodalPipeline)

  /** Not SQL-expressible (binary batch processing) — rows-only check. */
  val oracles: Map[String, String] = Map.empty
}
