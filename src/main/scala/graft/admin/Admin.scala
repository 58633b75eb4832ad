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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topic_metadata" -> topicMetadata,
    "list_groups" -> listGroups,
    "cluster_summary" -> clusterSummary)

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
        |FROM commits GROUP BY group_id""".stripMargin))
}
