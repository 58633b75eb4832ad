package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Broker-side log management semantics: segment rolling, leader-epoch
  * bookkeeping, and publish-rate quotas.
  *
  * - Segment rolling models the size-based log-segment split every Kafka
  *   log manager performs (the reference exposes the log config surface in
  *   /root/reference/kafka-impl/.../KafkaLogConfig.java; Pulsar's ledger
  *   rollover plays the segment role — see offset_translate's ledger model).
  * - Leader epochs model the epoch fields the Kafka protocol carries on
  *   ListOffsets/OffsetFetch responses
  *   (/root/reference/kafka-impl/.../utils/KafkaResponseUtils.java:379,426 —
  *   the reference reports -1 "unknown"; we compute what a broker tracking
  *   epoch bumps would return).
  * - Publish quotas model the reference's publish throttling
  *   (/root/reference/kafka-impl/.../KafkaRequestHandler.java:275
  *   throttling-publish-buffer; tests/PublishRateLimitTest.java).
  *
  * Scale: all three are one window or one aggregation on the natural
  * (topic, part) / producer keys — partial-agg friendly, no extra wide
  * exchange beyond the log view's own shuffle.
  */
object BrokerOps {

  /** Size-based segment rolling: a new 16 KiB segment starts whenever the
    * cumulative byte position crosses the segment boundary; per-segment
    * base/end offsets, record count, bytes, and time span (the inputs to
    * retention and compaction scheduling).
    */
  def logSegments(spark: SparkSession, dir: String): DataFrame = {
    val before = Window.partitionBy("topic", "part").orderBy("offs")
      .rowsBetween(Window.unboundedPreceding, -1)
    LogOps.log(spark, dir)
      .withColumn("rec_bytes", (length(col("v")) + length(col("k")) + lit(16)).cast("long"))
      .withColumn("seg_id",
        expr("coalesce(sum(rec_bytes) over (partition by topic, part order by offs rows between unbounded preceding and 1 preceding), 0) div 16384"))
      .groupBy("topic", "part", "seg_id")
      .agg(
        min("offs").as("base_offset"),
        (max("offs") + 1L).as("end_offset"),
        count(lit(1)).as("n_records"),
        sum("rec_bytes").cast("long").as("seg_bytes"),
        min("tms").as("first_ms"),
        max("tms").as("last_ms"))
  }

  /** Leader-epoch table: the leader changes every 100 offsets (a
    * deterministic stand-in for controller elections); per epoch the start
    * offset, end offset, and record count — exactly what an
    * OffsetsForLeaderEpoch lookup resolves against.
    */
  def leaderEpoch(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .withColumn("epoch", expr("offs div 100"))
      .groupBy("topic", "part", "epoch")
      .agg(
        min("offs").as("epoch_start"),
        (max("offs") + 1L).as("epoch_end"),
        count(lit(1)).as("n_records"))

  /** Producer publish quota: each producer gets 1536 bytes/day; rollup of
    * days over quota and the accumulated throttle time
    * (throttle_ms = excess / rate, rate = quota per day in ms).
    */
  def clientQuota(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .select(
        pmod(col("k").cast("long"), lit(16L)).as("producer_id"),
        expr("(tms div 86400000) * 86400000").as("day_ms"),
        (length(col("v")) + length(col("k")) + lit(16)).cast("long").as("rec_bytes"))
      .groupBy("producer_id", "day_ms")
      .agg(sum("rec_bytes").cast("long").as("bytes"))
      .withColumn("over", when(col("bytes") > 1536L, 1L).otherwise(0L))
      .withColumn("throttle_ms",
        when(col("over") === 1L, expr("((bytes - 1536) * 1000) div 1536")).otherwise(0L))
      .groupBy("producer_id")
      .agg(
        count(lit(1)).as("n_days"),
        sum("over").cast("long").as("n_throttled"),
        sum("bytes").cast("long").as("total_bytes"),
        max("bytes").as("max_day_bytes"),
        sum("throttle_ms").cast("long").as("total_throttle_ms"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "log_segments" -> logSegments,
    "leader_epoch" -> leaderEpoch,
    "client_quota" -> clientQuota)

  private val L = LogOps.logSqlCte

  val oracles: Map[String, String] = Map(
    "log_segments" -> (L +
      """sized AS (
        |  SELECT topic, part, offs, tms,
        |    length(v) + length(k) + 16 AS rec_bytes,
        |    CAST(COALESCE(SUM(length(v) + length(k) + 16) OVER (
        |      PARTITION BY topic, part ORDER BY offs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 16384
        |      AS BIGINT) AS seg_id
        |  FROM log)
        |SELECT topic, part, seg_id, MIN(offs) AS base_offset,
        |  MAX(offs) + 1 AS end_offset, COUNT(*) AS n_records,
        |  CAST(SUM(rec_bytes) AS BIGINT) AS seg_bytes,
        |  MIN(tms) AS first_ms, MAX(tms) AS last_ms
        |FROM sized GROUP BY topic, part, seg_id""".stripMargin),
    "leader_epoch" -> (LogOps.logSql +
      """SELECT topic, part, offs // 100 AS epoch, MIN(offs) AS epoch_start,
        |  MAX(offs) + 1 AS epoch_end, COUNT(*) AS n_records
        |FROM log GROUP BY topic, part, offs // 100""".stripMargin),
    "client_quota" -> (L +
      """days AS (
        |  SELECT CAST(k AS BIGINT) % 16 AS producer_id,
        |    (tms // 86400000) * 86400000 AS day_ms,
        |    CAST(SUM(length(v) + length(k) + 16) AS BIGINT) AS bytes
        |  FROM log GROUP BY 1, 2),
        |flagged AS (
        |  SELECT *, CASE WHEN bytes > 1536 THEN 1 ELSE 0 END AS over,
        |    CASE WHEN bytes > 1536 THEN ((bytes - 1536) * 1000) // 1536
        |         ELSE 0 END AS throttle_ms
        |  FROM days)
        |SELECT producer_id, COUNT(*) AS n_days,
        |  CAST(SUM(over) AS BIGINT) AS n_throttled,
        |  CAST(SUM(bytes) AS BIGINT) AS total_bytes,
        |  MAX(bytes) AS max_day_bytes,
        |  CAST(SUM(throttle_ms) AS BIGINT) AS total_throttle_ms
        |FROM flagged GROUP BY producer_id""".stripMargin))
}
