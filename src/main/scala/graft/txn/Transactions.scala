package graft.txn

import graft.log.LogOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional-log semantics
  * (/root/reference/kafka-impl/.../coordinator/transaction/TransactionCoordinator.java,
  * storage/ProducerStateManager.java, storage/AbortedTxn.java).
  *
  * Deterministic simulation on the log view: producer_id = key mod 16,
  * producer sequence = event_id div 20 (collisions model idempotent-producer
  * retries), txn_id = event_id mod 64, and a txn aborts iff the first md5
  * hex digit of its id is 0/1/2 (~19% — md5 is identical across engines).
  *
  * Scale: read_committed is a scan-side filter (predicate on a hash —
  * codegen'd, no shuffle); the aborted-txn "index" the reference keeps per
  * partition is here the broadcast-sized txn_id -> aborted map folded into
  * the predicate itself.
  */
object Transactions {

  private def txnLog(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .withColumn("txn_id", pmod(col("event_id"), lit(64L)))
      .withColumn("aborted",
        when(substring(md5(col("txn_id").cast("string")), 1, 1)
          .isin("0", "1", "2"), 1L).otherwise(0L))

  private val txnSql: String =
    """txn AS (
      |  SELECT *, event_id % 64 AS txn_id,
      |    CASE WHEN substring(md5(CAST(event_id % 64 AS VARCHAR)), 1, 1)
      |      IN ('0','1','2') THEN 1 ELSE 0 END AS aborted
      |  FROM log)
      |""".stripMargin

  /** Idempotent-producer dedup: duplicate (producer, sequence) appends are
    * dropped; rollup of kept vs duplicate counts per producer.
    */
  def producerDedup(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .select(
        pmod(col("k").cast("long"), lit(16L)).as("producer_id"),
        expr("event_id div 20").as("seq"))
      .groupBy("producer_id")
      .agg(
        count(lit(1)).as("n_total"),
        countDistinct("seq").as("n_kept"),
        (count(lit(1)) - countDistinct("seq")).as("n_dup"))

  /** READ_COMMITTED isolation: records of aborted txns filtered out;
    * per-partition committed counts and the max committed offset.
    */
  def readCommitted(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir).groupBy("topic", "part").agg(
      sum(when(col("aborted") === 0L, 1L).otherwise(0L)).as("n_committed"),
      max(when(col("aborted") === 0L, col("offs"))).as("max_committed_offs"),
      sum(col("aborted")).as("n_aborted_filtered"))

  /** Transaction metadata rollup: state, span, partitions touched per txn. */
  def txnState(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir)
      .groupBy("txn_id")
      .agg(
        max(when(col("aborted") === 1L, lit("ABORTED")).otherwise(lit("COMMITTED")))
          .as("state"),
        count(lit(1)).as("n_records"),
        countDistinct(concat(col("topic"), lit("#"), col("part").cast("string")))
          .as("n_partitions"),
        min("tms").as("first_ms"),
        max("tms").as("last_ms"))

  /** Producer-epoch fencing (storage/ProducerStateEntry.java): a producer's
    * epoch bumps every 500 events; once a higher epoch has appended,
    * records still arriving with an older epoch are fenced. Arrival order
    * is event_id; rollup of fenced counts per producer.
    */
  def producerFencing(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val recs = LogOps.log(spark, dir)
      .select(
        pmod(col("k").cast("long"), lit(16L)).as("producer_id"),
        col("event_id"),
        expr("(event_id div 500) % 8").as("epoch"))
    val arrival = Window.partitionBy("producer_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    recs
      .withColumn("max_epoch_so_far", max("epoch").over(arrival))
      .withColumn("fenced", when(col("epoch") < col("max_epoch_so_far"), 1L).otherwise(0L))
      .groupBy("producer_id")
      .agg(
        count(lit(1)).as("n_records"),
        sum("fenced").cast("long").as("n_fenced"),
        max("epoch").as("last_epoch"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "producer_fencing" -> producerFencing,
    "producer_dedup" -> producerDedup,
    "read_committed" -> readCommitted,
    "txn_state" -> txnState)

  private val L = LogOps.logSqlCte

  val oracles: Map[String, String] = Map(
    "producer_fencing" -> (L +
      """recs AS (
        |  SELECT CAST(k AS BIGINT) % 16 AS producer_id, event_id,
        |    (event_id // 500) % 8 AS epoch
        |  FROM log),
        |flagged AS (
        |  SELECT producer_id, epoch,
        |    CASE WHEN epoch < MAX(epoch) OVER (PARTITION BY producer_id
        |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    THEN 1 ELSE 0 END AS fenced
        |  FROM recs)
        |SELECT producer_id, COUNT(*) AS n_records,
        |  CAST(SUM(fenced) AS BIGINT) AS n_fenced,
        |  MAX(epoch) AS last_epoch
        |FROM flagged GROUP BY producer_id""".stripMargin),
    "producer_dedup" -> (L +
      """pseq AS (
        |  SELECT CAST(k AS BIGINT) % 16 AS producer_id, event_id // 20 AS seq
        |  FROM log)
        |SELECT producer_id, COUNT(*) AS n_total,
        |  CAST(COUNT(DISTINCT seq) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) - COUNT(DISTINCT seq) AS BIGINT) AS n_dup
        |FROM pseq GROUP BY producer_id""".stripMargin),
    "read_committed" -> (L + txnSql +
      """SELECT topic, part,
        |  CAST(SUM(CASE WHEN aborted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_committed,
        |  MAX(CASE WHEN aborted = 0 THEN offs END) AS max_committed_offs,
        |  CAST(SUM(aborted) AS BIGINT) AS n_aborted_filtered
        |FROM txn GROUP BY topic, part""".stripMargin),
    "txn_state" -> (L + txnSql +
      """SELECT txn_id,
        |  MAX(CASE WHEN aborted = 1 THEN 'ABORTED' ELSE 'COMMITTED' END) AS state,
        |  COUNT(*) AS n_records,
        |  CAST(COUNT(DISTINCT topic || '#' || CAST(part AS VARCHAR)) AS BIGINT) AS n_partitions,
        |  MIN(tms) AS first_ms, MAX(tms) AS last_ms
        |FROM txn GROUP BY txn_id""".stripMargin))
}
