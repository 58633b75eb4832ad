package graft.llm

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed in batches the way a Pandas-UDF / mapInPandas pipeline would.
  *
  * The container has no image/audio codecs, so decode / resize /
  * frame-sample are deterministic fakes over the payload bytes, but the
  * Spark-side shape is real: binary column, per-batch iteration in
  * `mapPartitions` (the JVM analog of a mapInPandas arrow batch), typed
  * metadata projection, and partition-friendly layout. Swap the `fake*`
  * functions for real codecs and nothing else changes.
  *
  * Rows-only check (no SQL oracle): binary batch processing is not
  * SQL-expressible.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeature(
      doc_id: Long, media_type: String, payload_bytes: Long,
      width: Long, height: Long, resized_w: Long, resized_h: Long,
      n_frames: Long, sampled_frames: Long, feat_mean: Double, batch_size: Long)

  /** Deterministic stand-in for a codec: byte statistics -> "dimensions". */
  private def fakeDecode(payload: Array[Byte]): (Long, Long, Double) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    val w = 160L + (sum % 8) * 80L       // "decoded" width 160..720
    val h = (w * 9L) / 16L               // 16:9
    (w, h, mean)
  }

  /** Resize preserving aspect: cap the long edge at 256. */
  private def fakeResize(w: Long, h: Long): (Long, Long) = {
    val long = math.max(w, h)
    if (long <= 256) (w, h)
    else ((w * 256) / long, (h * 256) / long)
  }

  /** Sample every 4th frame ("video" has one frame per 2KB of payload). */
  private def fakeFrameSample(payloadLen: Int): (Long, Long) = {
    val frames = 1L + payloadLen / 2048
    (frames, (frames + 3) / 4)
  }

  def multimodalPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      // Null payloads (nullable text column) are skipped rather than
      // crashing the batch decode.
      .filter(col("text").isNotNull)
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
          val (w, h, mean) = fakeDecode(r.payload)
          val (rw, rh) = fakeResize(w, h)
          val (frames, sampled) =
            if (r.media_type == "video") fakeFrameSample(r.payload.length)
            else (1L, 1L)
          MediaFeature(r.doc_id, r.media_type, r.payload.length.toLong,
            w, h, rw, rh, frames, sampled, mean, batch.size.toLong)
        }
      }
    }.toDF()
  }

  /** Cross-modal alignment: pair each media document with its embedding
    * row (doc_id <-> vec_id — the caption/image pairing step of a
    * multimodal training set) and roll up per (media_type, label):
    * pair counts, text volume, and the embedding-norm range. Aggregates
    * are integers plus order-free float min/max, so the oracle is exact;
    * the join is a plain equi-join that co-partitions on the id at scale.
    */
  def mediaEmbedAlign(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3L)) + 1L).cast("int")).as("media_type"),
        col("n_chars"))
    val vecs = Embeddings.withNorm(spark, dir)
      .select(col("vec_id"), col("nrm"), col("label"))
    media.join(vecs, col("doc_id") === col("vec_id"))
      .groupBy("media_type", "label")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum("n_chars").cast("long").as("sum_chars"),
        min("nrm").as("min_nrm"),
        max("nrm").as("max_nrm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_pipeline" -> multimodalPipeline,
    "media_embed_align" -> mediaEmbedAlign)

  /** multimodal_pipeline is not SQL-expressible (binary batch processing)
    * — rows-only check. The alignment rollup is exact SQL.
    */
  val oracles: Map[String, String] = Map(
    "media_embed_align" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |        x -> x * x)), (a, x) -> a + x)) AS nrm
        |  FROM embeddings),
        |m AS (
        |  SELECT doc_id, n_chars,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
        |      AS media_type
        |  FROM documents)
        |SELECT media_type, label, COUNT(*) AS n_pairs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(nrm) AS min_nrm, MAX(nrm) AS max_nrm
        |FROM m JOIN e ON doc_id = vec_id
        |GROUP BY media_type, label""".stripMargin)
}
