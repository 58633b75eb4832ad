package graft.sources

import graft.log.LogOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the log at scale.
  *
  * The reference keeps one managed ledger per topic-partition
  * (/root/reference/kafka-impl/.../storage/PartitionLog.java:487); the
  * Spark-native equivalent is a parquet lake partitioned by (topic, day)
  * with files bucket-sorted by partition: topic/time predicates become
  * partition pruning (no file even opened), and per-partition operators
  * (fetch, compaction, offsets) scan only their slice. At 100 TB this
  * layout, not the operators, is what keeps queries interactive.
  */
object LogStore {

  /** Materialize the canonical log view into a partitioned layout:
    * `outPath/topic=<t>/day=<d>/...`, files sorted by (part, offs) within
    * each partition so per-partition reads are sequential.
    */
  def materialize(spark: SparkSession, dir: String, outPath: String): Unit =
    LogOps.log(spark, dir)
      // 'd'-prefixed day token so partition-column type inference reads it
      // back as a string, keeping the schema stable across the round trip.
      .withColumn("day", concat(lit("d"), expr("CAST(tms div 86400000 AS STRING)")))
      .repartition(col("topic"), col("day"))
      // Leading partition columns satisfy the parquet writer's required
      // ordering, so it does not insert a second sort that would void the
      // (part, offs) file order.
      .sortWithinPartitions("topic", "day", "part", "offs")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("topic", "day")
      .parquet(outPath)

  /** Read the materialized log; topic/day predicates prune partitions
    * (visible as PartitionFilters in the scan node).
    */
  def read(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)

  /** Fetch against the materialized layout — the partition-pruned analog of
    * LogOps.fetch: the topic predicate eliminates directories instead of
    * rows.
    */
  def fetchFromStore(spark: SparkSession, outPath: String, topic: String,
      fromOffset: Long, maxRecords: Long): DataFrame =
    read(spark, outPath)
      .filter(col("topic") === topic && col("offs") >= fromOffset &&
        col("offs") < fromOffset + maxRecords)
}
