package graft.admin

import graft.coordinator.Groups
import graft.log.LogOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Admin/metadata surface (/root/reference/kafka-impl/.../AdminManager.java,
  * TopicAndMetadata.java): topic descriptions and group listings.
  *
  * Scale: both are metadata rollups — one partial-aggregatable pass over the
  * log, then trivially small frames.
  */
object Admin {

  /** DescribeTopics: partition count, record counts, offset/size totals. */
  def topicMetadata(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n"),
        (max("offs") + 1L).as("log_end"),
        sum(length(col("v")) + length(col("k"))).cast("long").as("bytes"))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_partitions"),
        sum("n").cast("long").as("n_records"),
        sum("log_end").cast("long").as("log_end_sum"),
        sum("bytes").cast("long").as("approx_bytes"))

  /** ListGroups: every group with its subscription breadth and last commit. */
  def listGroups(spark: SparkSession, dir: String): DataFrame =
    Groups.commits(spark, dir)
      .groupBy("group_id")
      .agg(
        countDistinct("topic").as("n_topics"),
        count(lit(1)).as("n_partitions"),
        sum("committed").cast("long").as("total_committed"),
        max("commit_ms").as("last_commit_ms"))

  /** DescribeCluster-style single-row totals. */
  def clusterSummary(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir).agg(
      countDistinct("topic").as("n_topics"),
      countDistinct(concat(col("topic"), lit("#"), col("part").cast("string")))
        .as("n_partitions"),
      count(lit(1)).as("n_records"),
      sum(length(col("v")) + length(col("k"))).cast("long").as("approx_bytes"),
      countDistinct("k").as("n_producers"))

  /** CreatePartitions impact analysis (AdminManager.java:127,
    * handleCreatePartitions): when a topic grows 8 -> 12 partitions,
    * records keyed by pmod(key) land elsewhere; per topic, how many keys
    * and records move — mod-placement's reshuffle cost, the number a
    * consistent-hashing layout would shrink.
    */
  def repartitionMap(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .withColumn("part_12", pmod(col("k").cast("long"), lit(12L)))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("part") =!= col("part_12"), 1L).otherwise(0L))
          .as("n_moved"),
        countDistinct(when(col("part") =!= col("part_12"), col("k")))
          .as("n_keys_moved"))

  /** Kafka <-> Pulsar topic-name mapping
    * (/root/reference/kafka-impl/.../utils/KopTopic.java: a Kafka topic is
    * persistent://tenant/namespace/topic-partition-N on the Pulsar side).
    */
  def topicNameMap(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .select("topic", "part").distinct()
      .select(
        col("topic"), col("part"),
        concat(lit("persistent://public/default/"), col("topic"),
          lit("-partition-"), col("part").cast("string")).as("pulsar_name"))
      .withColumn("kafka_name",
        regexp_extract(col("pulsar_name"), "^persistent://[^/]+/[^/]+/(.+)-partition-[0-9]+$", 1))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topic_metadata" -> topicMetadata,
    "list_groups" -> listGroups,
    "cluster_summary" -> clusterSummary,
    "repartition_map" -> repartitionMap,
    "topic_name_map" -> topicNameMap)

  private val L = LogOps.logSqlCte

  // One source of truth for the commit-log model: Groups owns the SQL.
  private val commitsSql: String = Groups.commitsSql

  val oracles: Map[String, String] = Map(
    "topic_metadata" -> (L +
      """pp AS (
        |  SELECT topic, part, COUNT(*) AS n, MAX(offs) + 1 AS log_end,
        |    CAST(SUM(length(v) + length(k)) AS BIGINT) AS bytes
        |  FROM log GROUP BY topic, part)
        |SELECT topic, COUNT(*) AS n_partitions,
        |  CAST(SUM(n) AS BIGINT) AS n_records,
        |  CAST(SUM(log_end) AS BIGINT) AS log_end_sum,
        |  CAST(SUM(bytes) AS BIGINT) AS approx_bytes
        |FROM pp GROUP BY topic""".stripMargin),
    "cluster_summary" -> (LogOps.logSql +
      """SELECT CAST(COUNT(DISTINCT topic) AS BIGINT) AS n_topics,
        |  CAST(COUNT(DISTINCT topic || '#' || CAST(part AS VARCHAR)) AS BIGINT)
        |    AS n_partitions,
        |  COUNT(*) AS n_records,
        |  CAST(SUM(length(v) + length(k)) AS BIGINT) AS approx_bytes,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_producers
        |FROM log""".stripMargin),
    "list_groups" -> (L + commitsSql +
      """SELECT group_id, CAST(COUNT(DISTINCT topic) AS BIGINT) AS n_topics,
        |  COUNT(*) AS n_partitions,
        |  CAST(SUM(committed) AS BIGINT) AS total_committed,
        |  MAX(commit_ms) AS last_commit_ms
        |FROM commits GROUP BY group_id""".stripMargin),
    "repartition_map" -> (LogOps.logSql +
      """SELECT topic, COUNT(*) AS n_records,
        |  CAST(SUM(CASE WHEN part <> CAST(k AS BIGINT) % 12 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved,
        |  CAST(COUNT(DISTINCT CASE WHEN part <> CAST(k AS BIGINT) % 12
        |    THEN k END) AS BIGINT) AS n_keys_moved
        |FROM log GROUP BY topic""".stripMargin),
    "topic_name_map" -> (LogOps.logSql +
      """SELECT topic, part,
        |  'persistent://public/default/' || topic || '-partition-'
        |    || CAST(part AS VARCHAR) AS pulsar_name,
        |  regexp_extract('persistent://public/default/' || topic
        |      || '-partition-' || CAST(part AS VARCHAR),
        |    '^persistent://[^/]+/[^/]+/(.+)-partition-[0-9]+$', 1) AS kafka_name
        |FROM (SELECT DISTINCT topic, part FROM log)""".stripMargin))
}
