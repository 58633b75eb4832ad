package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (analytics.Analytics.queries, analytics.Analytics.oracles),
      (log.LogOps.queries, log.LogOps.oracles),
      (coordinator.Groups.queries, coordinator.Groups.oracles),
      (txn.Transactions.queries, txn.Transactions.oracles),
      (registry.SchemaRegistry.queries, registry.SchemaRegistry.oracles),
      (admin.Admin.queries, admin.Admin.oracles),
      (llm.Dedup.queries, llm.Dedup.oracles),
      (llm.TextAnalysis.queries, llm.TextAnalysis.oracles),
      (llm.Similarity.queries, llm.Similarity.oracles),
      (llm.Sampling.queries, llm.Sampling.oracles),
      (llm.Multimodal.queries, llm.Multimodal.oracles),
      (streaming.Streams.queries, streaming.Streams.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Analytics.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
