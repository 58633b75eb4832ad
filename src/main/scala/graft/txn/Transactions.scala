package graft.txn

import graft.functions.Parity.md5LongSql
import graft.log.LogOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
        when(txnFate(col("txn_id")) === "ABORTED", 1L).otherwise(0L))

  private def txnSql: String =
    s"""txn AS (
      |  SELECT *, event_id % 64 AS txn_id,
      |    CASE WHEN (${fateSql("event_id % 64")}) = 'ABORTED'
      |      THEN 1 ELSE 0 END AS aborted
      |  FROM log)
      |""".stripMargin

  /** The engine-wide md5 transaction-fate draw, ONE definition (first hex
    * digit of md5(txn_id): 0-2 aborted, 3-4 still open, else committed) —
    * the same draw [[txnLog]]'s `aborted` flag and [[lsoLag]]'s undecided
    * set sample from. Returns ABORTED / ONGOING / COMMITTED; consumers
    * needing Kafka response vocabulary (CompleteAbort etc.) map on top.
    */
  private[graft] def txnFate(txnId: Column): Column = {
    val tag = substring(md5(txnId.cast("string")), 1, 1)
    when(tag.isin("0", "1", "2"), "ABORTED")
      .when(tag.isin("3", "4"), "ONGOING")
      .otherwise("COMMITTED")
  }

  /** [[txnFate]] as a DuckDB SQL expression over `e` (package-visible so
    * proxy_routing's marker fan-out samples the SAME fate draw).
    */
  private[graft] def fateSql(e: String): String =
    s"""CASE WHEN substring(md5(CAST($e AS VARCHAR)), 1, 1) IN ('0','1','2')
       |      THEN 'ABORTED'
       |    WHEN substring(md5(CAST($e AS VARCHAR)), 1, 1) IN ('3','4')
       |      THEN 'ONGOING'
       |    ELSE 'COMMITTED' END""".stripMargin

  /** Idempotent-producer dedup: duplicate (producer, sequence) appends are
    * dropped; rollup of kept vs duplicate counts per producer.
    */
  def producerDedup(spark: SparkSession, dir: String): DataFrame =
    LogOps.logBase(spark, dir)
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
  /** Transaction-log replay accounting — the txn sibling of
    * Groups.offsetsLoadReplay: what the transaction coordinator rebuilds
    * when it loads a __transaction_state partition at startup/failover
    * (TransactionStateManager.loadTransactionsForTxnTopicPartition,
    * /root/reference/kafka-impl/.../coordinator/transaction/
    * TransactionStateManager.java:689-795, completeLoadedTransactions
    * :797-850). Per transactional id: the replay is last-record-wins
    * (the load loop `transactionMetadataMap.put` overwrites, :783-787),
    * a tombstone REMOVES the id (:781-783, `tombstoned` — the retired-id
    * case, loaded = 0), and at load completion the recovery pass scans
    * the cache: a transaction that crashed between prepare and complete
    * — state PrepareCommit / PrepareAbort — gets its markers RE-SENT
    * (prepareComplete + sendTxnMarkersCallback, :815-842;
    * `recovery_marker` COMMIT/ABORT with `n_marker_partitions` fanned to
    * its partition set); every other state is a no-op. The loaded state
    * maps the engine-wide fate draw to Kafka's vocabulary: ONGOING ->
    * Ongoing, COMMITTED/ABORTED -> Prepare* or Complete* by a
    * deterministic crash-phase draw (the crash-at-prepare slice IS the
    * recovery population). n_log_records models the value rewrites a
    * transaction's lifecycle appends: begin + one per added partition +
    * prepare + complete as reached, + the tombstone. meta_partition is
    * the coordinator_placement md5 mapping for txn ids.
    *
    * Scale: one data-sized pass (the shared txn rollup), then a 64-row
    * decision frame.
    */
  def txnLogReplay(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val base = txnLog(spark, dir)
      .groupBy("txn_id")
      .agg(countDistinct(concat(col("topic"), lit("#"),
        col("part").cast("string"))).as("n_partitions"))
    base
      .withColumn("fate", txnFate(col("txn_id")))
      .withColumn("crashed_at_prepare",
        pmod(md5Long(concat(lit("txph#"), col("txn_id").cast("string"))),
          lit(3L)) === 0L)
      .withColumn("loaded_state",
        when(col("fate") === "ONGOING", "Ongoing")
          .when(col("fate") === "COMMITTED",
            when(col("crashed_at_prepare"), "PrepareCommit")
              .otherwise("CompleteCommit"))
          .otherwise(
            when(col("crashed_at_prepare"), "PrepareAbort")
              .otherwise("CompleteAbort")))
      .withColumn("tombstoned",
        when(pmod(md5Long(concat(lit("txdel#"),
          col("txn_id").cast("string"))), lit(8L)) === 0L, 1L)
          .otherwise(0L))
      .withColumn("recovery_marker",
        when(col("tombstoned") === 1L, "NONE")
          .when(col("loaded_state") === "PrepareCommit", "COMMIT")
          .when(col("loaded_state") === "PrepareAbort", "ABORT")
          .otherwise("NONE"))
      .select(
        pmod(md5Long(concat(lit("t"), col("txn_id").cast("string"))),
          lit(50L)).as("meta_partition"),
        col("txn_id"), col("n_partitions"), col("loaded_state"),
        col("tombstoned"),
        (lit(1L) - col("tombstoned")).as("loaded"),
        col("recovery_marker"),
        when(col("recovery_marker") =!= "NONE", col("n_partitions"))
          .otherwise(0L).as("n_marker_partitions"),
        (lit(1L) + col("n_partitions") +
          when(col("loaded_state").startsWith("Prepare"), 1L)
            .when(col("loaded_state").startsWith("Complete"), 2L)
            .otherwise(0L) + col("tombstoned")).as("n_log_records"))
  }

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
    val recs = LogOps.logBase(spark, dir)
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

  /** Transaction-timeout sweep (TransactionCoordinator.abortTimedOutTransactions,
    * /root/reference/kafka-impl/.../coordinator/transaction/TransactionCoordinator.java:983):
    * each (txn_id, day) is a transaction instance; instances still open
    * longer than the 4-hour transaction.timeout.ms would be aborted by the
    * coordinator's periodic sweep. Per-txn rollup of instances vs timeouts.
    */
  def txnExpire(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir)
      .withColumn("day_ms", expr("(tms div 86400000) * 86400000"))
      .groupBy("txn_id", "day_ms")
      .agg(
        min("tms").as("first_ms"),
        max("tms").as("last_ms"),
        count(lit(1)).as("n_records"))
      .withColumn("timed_out",
        when(col("last_ms") - col("first_ms") > 14400000L, 1L).otherwise(0L))
      .groupBy("txn_id")
      .agg(
        count(lit(1)).as("n_instances"),
        sum("timed_out").cast("long").as("n_timed_out"),
        max(col("last_ms") - col("first_ms")).as("max_duration_ms"))

  /** Out-of-order-sequence detection (storage/ProducerAppendInfo.java:83 —
    * the broker validates each batch's baseSequence against the producer's
    * last appended sequence). Records are sequenced per producer in arrival
    * order; ~1/16 are "lost in transit" (md5 coin on event_id), and the
    * detector reports the sequence gaps the broker would reject.
    */
  def producerGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seqd = LogOps.logBase(spark, dir)
      .select(
        pmod(col("k").cast("long"), lit(16L)).as("producer_id"),
        col("event_id"))
      .withColumn("seq",
        row_number().over(Window.partitionBy("producer_id").orderBy("event_id"))
          .cast("long") - 1L)
    val delivered = seqd
      .filter(substring(md5(col("event_id").cast("string")), 1, 1) =!= "f")
    val w = Window.partitionBy("producer_id").orderBy("seq")
    delivered
      .withColumn("prev", coalesce(lag(col("seq"), 1).over(w), lit(-1L)))
      .withColumn("gap", col("seq") - col("prev") - 1L)
      .groupBy("producer_id")
      .agg(
        count(lit(1)).as("n_delivered"),
        sum(when(col("gap") > 0L, 1L).otherwise(0L)).as("n_gaps"),
        sum("gap").cast("long").as("n_missing"),
        max("gap").as("max_gap"))
  }

  /** Last-stable-offset lag, the READ_COMMITTED staleness metric
    * (storage/PartitionLog.java firstUndecidedOffset + AbortedTxn.java):
    * per partition, the first offset belonging to a still-open
    * transaction (txns whose md5 tag marks them undecided), the LSO a
    * READ_COMMITTED consumer is capped at (log end when nothing is open),
    * and how far that cap trails the log end.
    */
  def lsoLag(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir)
      .withColumn("open",
        when(txnFate(col("txn_id")) === "ONGOING", 1L).otherwise(0L))
      .groupBy("topic", "part")
      .agg(
        (max("offs") + 1L).as("log_end"),
        min(when(col("open") === 1L, col("offs"))).as("first_undecided"),
        countDistinct(when(col("open") === 1L, col("txn_id")))
          .as("n_open_txns"))
      .withColumn("lso", coalesce(col("first_undecided"), col("log_end")))
      .withColumn("lso_lag", col("log_end") - col("lso"))

  /** Producer-id block allocation ledger
    * (coordinator/transaction/ProducerIdManagerImpl.java:44 —
    * PID_BLOCK_SIZE=1000; getNewProducerIdBlock at :83 claims the next
    * contiguous [prev_end+1, prev_end+1000] block from the shared counter;
    * the Long.MAX_VALUE exhaustion guard at :98). Each (user, topic)
    * connection to the broker that owns its partition is a producer
    * session needing one PID; brokers claim ceil(sessions/1000) blocks
    * from the global sequence in broker order. Per broker: sessions
    * served, blocks claimed, the id range held, ids left unused in the
    * last block, and the exhaustion headroom the :98 guard checks.
    *
    * Scale: distinct-user counting is the only wide stage (partial
    * aggregation on (topic, part)); everything after is a 4-row frame.
    */
  def producerIdBlocks(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    import org.apache.spark.sql.expressions.Window
    LogOps.logBase(spark, dir)
      .groupBy("topic", "part")
      .agg(countDistinct("k").as("n_producers"))
      .withColumn("broker",
        pmod(md5Long(concat_ws("#", col("topic"), col("part"))), lit(4L)))
      .groupBy("broker")
      .agg(sum("n_producers").cast("long").as("n_sessions"))
      .withColumn("n_blocks", expr("(n_sessions + 999) div 1000"))
      .withColumn("blocks_before",
        (sum("n_blocks").over(Window.orderBy("broker")) - col("n_blocks"))
          .cast("long"))
      .select(
        col("broker"), col("n_sessions"), col("n_blocks"),
        (col("blocks_before") * 1000L).as("block_start"),
        ((col("blocks_before") + col("n_blocks")) * 1000L - 1L)
          .as("block_end"),
        (col("n_blocks") * 1000L - col("n_sessions")).as("ids_unused"),
        expr(s"(${Long.MaxValue}L - ((blocks_before + n_blocks) * 1000 - 1))" +
          " div 1000").as("headroom_blocks"))
  }

  /** Transaction-marker fan-out
    * (coordinator/transaction/TransactionMarkerChannelManager.java:245
    * `addTxnMarkersToSend` -> addTxnMarkersToBrokerQueue, :400
    * `writeTxnCompletion`): when a transaction completes, the coordinator
    * writes one COMMIT/ABORT control marker to EVERY partition the txn
    * touched, batching markers per destination broker (one TxnMarkerEntry
    * per broker queue). Per txn: the marker verb, partitions to mark,
    * broker batches the queue drain sends, and records covered. Broker
    * placement reuses [[producerIdBlocks]]'s md5 partition->broker map.
    *
    * Scale: one partial-aggregated shuffle on txn_id (64 groups of
    * distinct-counted small sets); no per-record state.
    */
  def txnMarkers(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    txnLog(spark, dir)
      .withColumn("tp", concat(col("topic"), lit("#"), col("part").cast("string")))
      .withColumn("broker", pmod(md5Long(col("tp")), lit(4L)))
      .groupBy("txn_id")
      .agg(
        max(when(col("aborted") === 1L, lit("ABORT")).otherwise(lit("COMMIT")))
          .as("marker"),
        countDistinct("tp").as("n_markers"),
        countDistinct("broker").as("n_broker_batches"),
        count(lit(1)).as("n_records"))
  }

  /** Transactional offset commits (GroupMetadata.java:197
    * `pendingTransactionalOffsetCommits`, :470 `prepareTxnOffsetCommit`,
    * :512 `onTxnOffsetCommitAppend`; KafkaRequestHandler
    * .handleTxnOffsetCommit): the exactly-once consume-transform-produce
    * loop commits its group offsets INSIDE the producer's transaction, so
    * per (group, partition) there are two offsets — the last plain commit
    * and an in-flight transactional one. The transactional commit
    * materializes only once its COMMIT marker lands; an abort rolls it
    * back as if never written; while the txn is open the commit is
    * pending, and an OffsetFetch with `require_stable` must refuse to
    * answer (stable_offset NULL) instead of serving a value that may roll
    * back.
    *
    * Model: each (group, partition) carries one transactional commit at
    * the midpoint between the plain committed offset and the log end,
    * owned by txn_id = md5(group#topic#part) mod 64; the txn's fate reuses
    * the engine-wide md5 state tag (0-2 aborted, 3-4 ongoing, else
    * committed — the same draw as [[lsoLag]]'s undecided set).
    *
    * Scale: one broadcast-sized frame (|groups| x |partitions|) derived
    * from the leo aggregate; no per-record state.
    */
  def txnOffsetCommits(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    graft.coordinator.Groups.commits(spark, dir)
      .withColumn("txn_id",
        pmod(md5Long(concat_ws("#", col("group_id"), col("topic"),
          col("part").cast("string"))), lit(64L)))
      .withColumn("txn_state", txnFate(col("txn_id")))
      .withColumn("txn_offset",
        col("committed") + expr("(log_end - committed) div 2"))
      .withColumn("materialized",
        when(col("txn_state") === "COMMITTED",
          greatest(col("txn_offset"), col("committed")))
          .otherwise(col("committed")))
      .select(
        col("group_id"), col("topic"), col("part"),
        col("committed").as("base_committed"),
        col("txn_id"), col("txn_state"), col("txn_offset"),
        col("materialized"),
        when(col("txn_state") === "ONGOING", 1L).otherwise(0L).as("pending"),
        when(col("txn_state") === "ABORTED", 1L).otherwise(0L).as("rolled_back"),
        when(col("txn_state") === "ONGOING", lit(null).cast("long"))
          .otherwise(col("materialized")).as("stable_offset"))
  }

  /** DescribeProducers response (KafkaRequestHandler.java:2032
    * `handleDescribeProducersRequest`; ProducerStateManager's per-partition
    * producer map): per (topic, partition, producer) the active state the
    * admin API reports — producer epoch, last partition-local sequence,
    * last append timestamp, and whether the producer currently holds an
    * open transaction on the partition (with its start offset, the LSO
    * blocker lsoLag measures). Sequences are per (producer, partition) —
    * the partition's record count for that producer minus one — matching
    * the broker's per-partition ProducerStateEntry.
    *
    * Scale: one partial-aggregated shuffle on (topic, part, producer);
    * every aggregate is map-side combinable.
    */
  def describeProducers(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir)
      .withColumn("producer_id", pmod(col("k").cast("long"), lit(16L)))
      .withColumn("epoch", expr("(event_id div 500) % 8"))
      .withColumn("open",
        when(txnFate(col("txn_id")) === "ONGOING", 1L).otherwise(0L))
      .groupBy("topic", "part", "producer_id")
      .agg(
        count(lit(1)).as("n_records"),
        (count(lit(1)) - 1L).as("last_seq"),
        max("epoch").as("producer_epoch"),
        max("tms").as("last_ms"),
        max("open").as("open_txn"),
        min(when(col("open") === 1L, col("offs"))).as("txn_start_offs"))

  /** ListTransactions with a state filter (KafkaRequestHandler.java:2133
    * `handleListTransactionsRequest`, :2151
    * `handleDescribeTransactionsRequest`): the transaction listing at txn
    * grain — coordinator state (Ongoing / CompleteAbort / CompleteCommit
    * from the engine-wide md5 tag), producers and partitions involved,
    * start time and span — filtered to the non-completed-commit states
    * (the `filteredStates` a "what is stuck or rolling back" operator call
    * passes). One partial-aggregated shuffle on txn_id.
    */
  def listTransactions(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir)
      .withColumn("fate", txnFate(col("txn_id")))
      .withColumn("state",
        when(col("fate") === "ABORTED", "CompleteAbort")
          .when(col("fate") === "ONGOING", "Ongoing")
          .otherwise("CompleteCommit"))
      .groupBy("txn_id", "state")
      .agg(
        countDistinct(pmod(col("k").cast("long"), lit(16L))).as("n_producers"),
        countDistinct(concat(col("topic"), lit("#"), col("part").cast("string")))
          .as("n_partitions"),
        min("tms").as("start_ms"),
        (max("tms") - min("tms")).as("duration_ms"))
      .filter(col("state") =!= "CompleteCommit")

  /** AddPartitionsToTxn registry (KafkaRequestHandler
    * .handleAddPartitionsToTxn -> TransactionCoordinator
    * .handleAddPartitionsToTransaction): before a producer writes a
    * partition inside a transaction, the coordinator registers it in the
    * txn's partition set — the set EndTxn later fans markers out to
    * ([[txnMarkers]]). The registry view: per (txn, partition) the
    * registration order (first-touch order of the partition within the
    * txn), the first record that triggered the add, and the records that
    * followed. One partial-aggregated shuffle on (txn_id, topic, part) +
    * a 64-group window for the order.
    */
  def addPartitionsToTxn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("txn_id").orderBy("first_event_id")
    txnLog(spark, dir)
      .groupBy("txn_id", "topic", "part")
      .agg(
        min("event_id").as("first_event_id"),
        min("tms").as("first_ms"),
        min("offs").as("first_offs"),
        count(lit(1)).as("n_records"))
      .withColumn("add_seq", row_number().over(w).cast("long"))
  }

  /** DescribeTransactions (KafkaRequestHandler.java:2151
    * `handleDescribeTransactionsRequest` -> TransactionCoordinator
    * .java:238-300 `handleDescribeTransactions`): the per-transactional-id
    * metadata row the admin API returns — current producer id and epoch
    * (the latest append's, matching the coordinator's "current" pid/epoch),
    * admin-vocabulary state, the static transaction timeout, start
    * timestamp, and the registered partition set (the same set
    * [[addPartitionsToTxn]] builds and EndTxn fans markers to), flattened
    * to a sorted list for a stable row shape. Ids the coordinator has no
    * metadata for answer TRANSACTIONAL_ID_NOT_FOUND with NULL state —
    * modeled by describing ids 0..79 against the 64-txn universe.
    *
    * Scale: one partial-aggregated shuffle on txn_id compresses the log to
    * 64 metadata rows; the queried-id frame joins against that broadcast —
    * the probe side never touches the log again.
    */
  def describeTransactions(spark: SparkSession, dir: String): DataFrame = {
    val tp = concat(col("topic"), lit("#"), col("part").cast("string"))
    val meta = txnLog(spark, dir)
      .withColumn("producer_id", pmod(col("k").cast("long"), lit(16L)))
      .withColumn("epoch", expr("(event_id div 500) % 8"))
      .withColumn("tp", tp)
      .groupBy("txn_id")
      .agg(
        max(struct(col("event_id"), col("producer_id")))
          .getField("producer_id").as("producer_id"),
        max(struct(col("event_id"), col("epoch")))
          .getField("epoch").as("producer_epoch"),
        min("tms").as("start_ms"),
        countDistinct("tp").as("n_partitions"),
        array_join(array_sort(collect_set(col("tp"))), ",").as("partitions"))
      .withColumn("state",
        when(txnFate(col("txn_id")) === "ABORTED", "CompleteAbort")
          .when(txnFate(col("txn_id")) === "ONGOING", "Ongoing")
          .otherwise("CompleteCommit"))
    spark.range(0L, 80L, 1, 1).toDF("txn_id")
      .join(broadcast(meta), Seq("txn_id"), "left")
      // Existence sentinel = the meta-side n_partitions (countDistinct of
      // a non-null key, so non-null exactly when the left join matched) -
      // mirroring the oracle's dm.txn_id IS NULL; start_ms would latently
      // diverge if a record ever carried a NULL timestamp.
      .withColumn("error_code",
        when(col("n_partitions").isNull, "TRANSACTIONAL_ID_NOT_FOUND")
          .otherwise("NONE"))
      .withColumn("txn_timeout_ms",
        when(col("n_partitions").isNotNull, lit(60000L)))
      .select("txn_id", "error_code", "state", "producer_id",
        "producer_epoch", "txn_timeout_ms", "start_ms", "n_partitions",
        "partitions")
  }

  /** AddOffsetsToTxn (KafkaRequestHandler.java:2546
    * `handleAddOffsetsToTxn` -> TransactionCoordinator
    * .handleAddPartitionsToTransaction with the group's offsets-topic
    * partition): before a transactional consumer can
    * [[txnOffsetCommits]], the coordinator registers the group's
    * __consumer_offsets partition into the transaction — the
    * coordinator_placement ∘ add_partitions_to_txn composition. Per
    * (txn, group): the registered metadata partition (the group's
    * md5-hash placement, identical to Groups.coordinatorPlacement), the
    * broker coordinating it, how many (topic, partition) offset commits
    * flow through the registration, and the transaction's fate.
    *
    * Scale: one partial-aggregated shuffle on (txn_id, group_id) over the
    * groups x partitions commit frame; everything else is hash arithmetic
    * on the aggregated (≤ 64 x 4)-row result.
    */
  def addOffsetsToTxn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    graft.coordinator.Groups.commits(spark, dir)
      .withColumn("txn_id",
        pmod(md5Long(concat_ws("#", col("group_id"), col("topic"),
          col("part").cast("string"))), lit(64L)))
      .groupBy("txn_id", "group_id")
      .agg(count(lit(1)).as("n_commit_partitions"))
      .withColumn("meta_topic", lit("__consumer_offsets"))
      .withColumn("meta_partition", pmod(md5Long(col("group_id")), lit(50L)))
      .withColumn("coordinator_broker",
        pmod(md5Long(concat(col("meta_topic"), lit("#"),
          col("meta_partition").cast("string"))), lit(4L)))
      .withColumn("txn_state", txnFate(col("txn_id")))
      .withColumn("pending_commit",
        when(col("txn_state") === "ONGOING", 1L).otherwise(0L))
  }

  /** Snapshot cadence for [[producerStateSnapshot]] — a snapshot is cut
    * at every multiple of this many offsets.
    */
  private val SnapInterval = 256L

  /** Producer-state snapshot / recovery plan
    * (storage/ProducerStateManagerSnapshot.java:24-33 — a snapshot
    * carries (offset, producers, ongoingTxns, abortedIndexList);
    * ProducerStateManager.java:80-105 applySnapshotAndRecover —
    * recovery applies the latest snapshot then replays from its offset,
    * or replays the whole partition when none exists): per partition,
    * with snapshots cut every [[SnapInterval]] offsets, the latest
    * snapshot boundary, what it captured (distinct producers, txns
    * still open at the boundary, aborted-index entries), the replay
    * tail a recovering broker must re-read, and the recovery mode.
    *
    * Scale: the boundary frame is a partial-aggregated |partitions|-row
    * checkpoint broadcast back onto the scan; the txn-lifetime and
    * producer branches are both partial-aggregated — the honest cost is
    * two compressed passes, metadata-sized joins after.
    */
  def producerStateSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val base = txnLog(spark, dir)
    val bounds = base.groupBy("topic", "part")
      .agg((max("offs") + lit(1L)).as("log_end"))
      .withColumn("snap_off",
        expr(s"(log_end div $SnapInterval) * $SnapInterval"))
      .localCheckpoint()
    val txns = base.join(broadcast(bounds), Seq("topic", "part"))
      .groupBy("topic", "part", "txn_id")
      .agg(min("offs").as("mn"), max("offs").as("mx"),
        max("snap_off").as("snap_off"))
      .withColumn("fate", txnFate(col("txn_id")))
      .groupBy("topic", "part")
      .agg(
        sum(when(col("mn") < col("snap_off") &&
          (col("fate") === "ONGOING" || col("mx") >= col("snap_off")), 1L)
          .otherwise(0L)).as("n_ongoing_at_snap"),
        sum(when(col("fate") === "ABORTED" && col("mx") < col("snap_off"),
          1L).otherwise(0L)).as("n_aborted_index"))
    val prods = base.join(broadcast(bounds), Seq("topic", "part"))
      .filter(col("offs") < col("snap_off"))
      .groupBy("topic", "part")
      .agg(countDistinct("k").as("n_producers_snap"))
    bounds.join(txns, Seq("topic", "part"))
      .join(prods, Seq("topic", "part"), "left")
      .withColumn("n_producers_snap",
        coalesce(col("n_producers_snap"), lit(0L)))
      .withColumn("replay_tail", col("log_end") - col("snap_off"))
      .withColumn("recovery",
        when(col("snap_off") > 0L, "SNAPSHOT_REPLAY")
          .otherwise("FULL_REPLAY"))
  }

  /** Snapshot-buffer replay — the compacted `__kop_producer_state` read a
    * recovering broker performs before the log replay
    * (storage/PulsarTopicProducerStateManagerSnapshotBuffer.java:375
    * `readLatestSnapshot` — the reader walks the buffer topic and keeps
    * the LAST message per topic-partition key (:369 `latestSnapshots.put`
    * overwrites — read-latest-per-key, the compaction contract);
    * storage/ProducerStateManager.java:80-105 `applySnapshotAndRecover` —
    * a snapshot whose topicUUID differs from the live topic's is IGNORED
    * (the topic was deleted and re-created; its old state must not leak
    * into the new incarnation) and recovery falls back to a full replay
    * from offset 0). Completes the recovery triad with
    * Groups.offsetsLoadReplay / txnLogReplay: per partition, the snapshot
    * generations written over the [[SnapInterval]] cadence, the stale
    * generations the latest-per-key read supersedes, the UUID-mismatch
    * draw (an md5 coin, ~1/8 re-created), what the applied snapshot
    * restores (the [[producerStateSnapshot]] boundary capture: producers,
    * open txns, aborted index), and the replay tail from the applied
    * boundary to the log end.
    *
    * Scale: composes [[producerStateSnapshot]]'s |partitions|-row frame —
    * the data-sized work is its two partial-aggregated passes; everything
    * here is in-row arithmetic on metadata.
    */
  def snapshotBufferReplay(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    producerStateSnapshot(spark, dir)
      .withColumn("n_snapshots_written", expr(s"log_end div $SnapInterval"))
      .withColumn("n_stale_skipped",
        greatest(col("n_snapshots_written") - 1L, lit(0L)))
      .withColumn("topic_recreated",
        when(col("n_snapshots_written") > 0L &&
          pmod(md5Long(concat_ws("#", lit("snapuuid"), col("topic"),
            col("part").cast("string"))), lit(8L)) === 0L, 1L)
          .otherwise(0L))
      .withColumn("applied_snap_off",
        when(col("n_snapshots_written") === 0L ||
          col("topic_recreated") === 1L, 0L)
          .otherwise(col("snap_off")))
      .select(
        col("topic"), col("part"), col("log_end"),
        col("n_snapshots_written"), col("n_stale_skipped"),
        col("topic_recreated"),
        col("snap_off").as("latest_snap_off"),
        col("applied_snap_off"),
        when(col("applied_snap_off") > 0L, col("n_producers_snap"))
          .otherwise(0L).as("restored_producers"),
        when(col("applied_snap_off") > 0L, col("n_ongoing_at_snap"))
          .otherwise(0L).as("restored_ongoing"),
        when(col("applied_snap_off") > 0L, col("n_aborted_index"))
          .otherwise(0L).as("restored_aborted"),
        (col("log_end") - col("applied_snap_off")).as("replay_tail"),
        when(col("n_snapshots_written") === 0L, "NO_SNAPSHOT")
          .when(col("topic_recreated") === 1L, "UUID_MISMATCH")
          .otherwise("SNAPSHOT_REPLAY").as("recovery"))
  }

  /** Marker-channel retry accounting — the failure path of the per-broker
    * marker queues (coordinator/transaction/TransactionMarkerChannelManager
    * .java:549-566: a failed channel to a destination broker re-enqueues
    * the WHOLE drained batch via addTxnMarkersToBrokerQueue, and the
    * fixed-delay drain (:584, every 100 ms) retries it next tick; :471-530
    * `tryAppendToLog`/`retryLogAppends` is the same requeue-and-redrain
    * discipline on the txn-log side). Extends [[txnMarkers]]' fan-out: per
    * destination broker, the marker entries enqueued (one per completed
    * txn per broker — an ONGOING txn has no completion to mark), the
    * entries whose first send fails (a deterministic md5 draw per
    * (txn, broker): 8 outcomes — 5 clean, 2 one-retry, 1 two-retry), the
    * requeue rounds, total send attempts, and the drain latency under the
    * 100 ms fixed-delay schedule (an entry sent on round r drains at
    * (r+1)·100 ms after enqueue).
    *
    * Scale: one partial-aggregated shuffle on (txn_id, broker) — at most
    * 64·4 groups; the broker rollup is metadata-sized.
    */
  def txnMarkerRetries(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    txnLog(spark, dir)
      .withColumn("tp",
        concat(col("topic"), lit("#"), col("part").cast("string")))
      .withColumn("broker", pmod(md5Long(col("tp")), lit(4L)))
      .groupBy("txn_id", "broker")
      .agg(countDistinct("tp").as("n_partitions"))
      .withColumn("fate", txnFate(col("txn_id")))
      .filter(col("fate") =!= "ONGOING")
      .withColumn("draw",
        pmod(md5Long(concat_ws("#", lit("mkretry"),
          col("txn_id").cast("string"), col("broker").cast("string"))),
          lit(8L)))
      .withColumn("fail_rounds",
        when(col("draw") === 7L, 2L).when(col("draw") >= 5L, 1L)
          .otherwise(0L))
      .groupBy("broker")
      .agg(
        count(lit(1)).as("n_marker_entries"),
        sum("n_partitions").cast("long").as("n_partitions"),
        sum(when(col("fate") === "ABORTED", 1L).otherwise(0L)).cast("long")
          .as("n_abort_markers"),
        sum(when(col("fail_rounds") > 0L, 1L).otherwise(0L)).cast("long")
          .as("n_failed_first_send"),
        sum("fail_rounds").cast("long").as("n_requeues"),
        (sum("fail_rounds") + count(lit(1))).cast("long")
          .as("n_send_attempts"),
        (max("fail_rounds") + 1L).as("max_rounds"),
        ((max("fail_rounds") + 1L) * 100L).as("max_drain_ms"),
        sum((col("fail_rounds") + 1L) * 100L).cast("long")
          .as("sum_drain_ms"))
  }

  /** EndTxn request validation — the decision table of
    * TransactionCoordinator.endTxnByStatus
    * (/root/reference/kafka-impl/.../coordinator/transaction/
    * TransactionCoordinator.java:812-844, with getPreEndTxnErrors :870
    * and the epoch pre-check :799-801): evaluated as a WHAT-IF per
    * (transaction, requested result) pair — both COMMIT and ABORT
    * requests against each txn's current coordinator state:
    * Ongoing accepts either (transitioning to the matching Prepare
    * state); CompleteCommit/CompleteAbort accept only the MATCHING
    * retry (idempotent NONE, no transition) and reject the other as
    * INVALID_TXN_STATE; PrepareCommit/PrepareAbort answer the matching
    * result CONCURRENT_TRANSACTIONS (still in flight) and the mismatch
    * INVALID_TXN_STATE; Empty rejects both. A stale producer epoch
    * (md5 coin) short-circuits everything as PRODUCER_FENCED. States
    * refine [[txnFate]] with a second hex digit so every branch of the
    * reference's switch is exercised.
    *
    * Scale: the 64-txn state frame crossed with the 2-row result table
    * in-row — metadata-sized end to end.
    */
  def endTxnValidation(spark: SparkSession, dir: String): DataFrame = {
    val states = txnLog(spark, dir)
      .groupBy("txn_id")
      .agg(count(lit(1)).as("n_records"))
      .withColumn("fate", txnFate(col("txn_id")))
      .withColumn("sub",
        substring(md5(concat(lit("endstate#"), col("txn_id").cast("string"))),
          1, 1))
      .withColumn("state",
        when(col("fate") === "COMMITTED",
          when(col("sub").isin("0", "1", "2", "3"), "PrepareCommit")
            .otherwise("CompleteCommit"))
          .when(col("fate") === "ABORTED",
            when(col("sub").isin("0", "1", "2", "3"), "PrepareAbort")
              .otherwise("CompleteAbort"))
          .otherwise(when(col("sub").isin("0", "1", "2", "3"), "Empty")
            .otherwise("Ongoing")))
      .withColumn("epoch_ok",
        substring(md5(concat(lit("endepoch#"), col("txn_id").cast("string"))),
          1, 1) =!= "0")
    states.crossJoin(
      spark.range(0, 2, 1, 1).select(when(col("id") === 0L, "COMMIT")
        .otherwise("ABORT").as("requested_result")))
      .withColumn("outcome",
        when(!col("epoch_ok"), "PRODUCER_FENCED")
          .when(col("state") === "Ongoing", "NONE")
          .when(col("state") === "CompleteCommit",
            when(col("requested_result") === "COMMIT", "NONE")
              .otherwise("INVALID_TXN_STATE"))
          .when(col("state") === "CompleteAbort",
            when(col("requested_result") === "ABORT", "NONE")
              .otherwise("INVALID_TXN_STATE"))
          .when(col("state") === "PrepareCommit",
            when(col("requested_result") === "COMMIT",
              "CONCURRENT_TRANSACTIONS").otherwise("INVALID_TXN_STATE"))
          .when(col("state") === "PrepareAbort",
            when(col("requested_result") === "ABORT",
              "CONCURRENT_TRANSACTIONS").otherwise("INVALID_TXN_STATE"))
          .otherwise("INVALID_TXN_STATE"))
      .withColumn("next_state",
        when(col("outcome") =!= "NONE", lit(null).cast("string"))
          .when(col("state") === "Ongoing",
            when(col("requested_result") === "COMMIT", "PrepareCommit")
              .otherwise("PrepareAbort"))
          .otherwise(col("state")))
      .select(col("txn_id"), col("state"), col("requested_result"),
        col("epoch_ok"), col("outcome"), col("next_state"), col("n_records"))
  }

  /** InitProducerId request handling — the three admission branches of
    * TransactionCoordinator.handleInitProducerId
    * (/root/reference/kafka-impl/.../coordinator/transaction/
    * TransactionCoordinator.java:318-385): a NULL transactional id is
    * blindly accepted with a fresh PID at epoch 0 (the idempotent-only
    * producer path); an EMPTY transactional id is INVALID_REQUEST; a
    * named id first validates the client's transactionTimeoutMs against
    * (0, transactionMaxTimeoutMs] (TransactionStateManager.java:636-637,
    * max = 15 min — TransactionConfig.java:31) rejecting
    * INVALID_TRANSACTION_TIMEOUT, then bumps the producer epoch on the
    * existing metadata. Idempotent requests are one per connection
    * ([[graft.admin.Admin]]'s 32-conn universe), named requests one per
    * transactional id; timeouts are md5 coins straddling the max.
    *
    * Scale: in-row decisions on the |txns| + |conns| metadata frame.
    */
  def initProducerId(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val named = txnLog(spark, dir).groupBy("txn_id")
      .agg(count(lit(1)).as("n_records"))
      .withColumn("transactional_id",
        concat(lit("txn-"), col("txn_id").cast("string")))
      .withColumn("timeout_ms",
        element_at(array(lit(0L), lit(60000L), lit(900000L),
          lit(1800000L)),
          (pmod(md5Long(concat(lit("txnto#"), col("transactional_id"))),
            lit(4L)) + 1L).cast("int")))
      .withColumn("prev_epoch",
        pmod(md5Long(concat(lit("epoch#"), col("transactional_id"))),
          lit(8L)))
      .select(
        col("transactional_id"),
        lit("transactional").as("request_kind"),
        col("timeout_ms"),
        when(col("timeout_ms") <= 0L || col("timeout_ms") > 900000L,
          "INVALID_TRANSACTION_TIMEOUT").otherwise("NONE").as("outcome"),
        when(col("timeout_ms") > 0L && col("timeout_ms") <= 900000L,
          lit(9000L) + col("txn_id")).as("producer_id"),
        when(col("timeout_ms") > 0L && col("timeout_ms") <= 900000L,
          col("prev_epoch") + 1L).as("producer_epoch"))
    val anon = spark.range(0, 32, 1, 1)
      .select(concat(lit("conn"), col("id")).as("conn"), col("id"))
      .select(
        lit(null).cast("string").as("transactional_id"),
        lit("idempotent").as("request_kind"),
        lit(null).cast("long").as("timeout_ms"),
        lit("NONE").as("outcome"),
        (lit(5000L) + col("id")).as("producer_id"),
        lit(0L).as("producer_epoch"))
    val empty = spark.range(0, 1, 1, 1).select(
      lit("").as("transactional_id"),
      lit("transactional").as("request_kind"),
      lit(60000L).as("timeout_ms"),
      lit("INVALID_REQUEST").as("outcome"),
      lit(null).cast("long").as("producer_id"),
      lit(null).cast("long").as("producer_epoch"))
    named.unionByName(anon).unionByName(empty)
  }

  /** The aborted-transaction index a READ_COMMITTED fetch response
    * carries (format AbortedIndexEntry — /root/reference/kafka-impl/
    * .../coordinator/transaction/AbortedIndexEntry.java; the reference
    * materializes it per partition so MessageFetchContext can ship the
    * aborted (pid, firstOffset) list alongside the records): per
    * (topic, partition), each aborted transaction's first/last offset
    * and record count — the metadata a client-side consumer uses to
    * drop aborted batches without a second round trip.
    *
    * Scale: one partial-aggregated rollup on the (topic, part)
    * partitioning every log op reuses; the abort filter is the shared
    * engine-wide fate draw.
    */
  def abortedTxnIndex(spark: SparkSession, dir: String): DataFrame =
    txnLog(spark, dir)
      .filter(col("aborted") === 1L)
      .groupBy("topic", "part", "txn_id")
      .agg(
        min("offs").as("first_offset"),
        max("offs").as("last_offset"),
        count(lit(1)).as("n_records"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snapshot_buffer_replay" -> snapshotBufferReplay,
    "txn_marker_retries" -> txnMarkerRetries,
    "end_txn_validation" -> endTxnValidation,
    "init_producer_id" -> initProducerId,
    "aborted_txn_index" -> abortedTxnIndex,
    "producer_state_snapshot" -> producerStateSnapshot,
    "add_offsets_to_txn" -> addOffsetsToTxn,
    "describe_transactions" -> describeTransactions,
    "add_partitions_to_txn" -> addPartitionsToTxn,
    "txn_offset_commits" -> txnOffsetCommits,
    "describe_producers" -> describeProducers,
    "list_transactions" -> listTransactions,
    "txn_markers" -> txnMarkers,
    "producer_id_blocks" -> producerIdBlocks,
    "lso_lag" -> lsoLag,
    "producer_fencing" -> producerFencing,
    "producer_dedup" -> producerDedup,
    "read_committed" -> readCommitted,
    "txn_state" -> txnState,
    "txn_log_replay" -> txnLogReplay,
    "txn_expire" -> txnExpire,
    "producer_gaps" -> producerGaps)

  private val L = LogOps.logSqlCte

  /** The [[producerStateSnapshot]] boundary frame as a reusable CTE chain
    * (no leading comma; continues `txn`; ends with `snapb(topic, part,
    * log_end, snap_off, n_ongoing_at_snap, n_aborted_index,
    * n_producers_snap)`) — ONE SQL spelling of the snapshot capture,
    * shared by the producer_state_snapshot and snapshot_buffer_replay
    * oracles so the boundary arithmetic cannot drift.
    */
  private lazy val snapBoundarySql: String =
    s"""bounds AS (
      |  SELECT topic, part, MAX(offs) + 1 AS log_end,
      |    ((MAX(offs) + 1) // 256) * 256 AS snap_off
      |  FROM txn GROUP BY topic, part),
      |tl AS (
      |  SELECT topic, part, txn_id, MIN(offs) AS mn, MAX(offs) AS mx
      |  FROM txn GROUP BY topic, part, txn_id),
      |ts AS (
      |  SELECT tl.topic, tl.part,
      |    CAST(SUM(CASE WHEN mn < snap_off AND
      |        ((${fateSql("txn_id")}) = 'ONGOING' OR mx >= snap_off)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ongoing_at_snap,
      |    CAST(SUM(CASE WHEN (${fateSql("txn_id")}) = 'ABORTED'
      |        AND mx < snap_off
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_aborted_index
      |  FROM tl JOIN bounds USING (topic, part)
      |  GROUP BY tl.topic, tl.part),
      |pr AS (
      |  SELECT txn.topic, txn.part,
      |    CAST(COUNT(DISTINCT k) AS BIGINT) AS n_producers_snap
      |  FROM txn JOIN bounds USING (topic, part)
      |  WHERE offs < snap_off
      |  GROUP BY txn.topic, txn.part),
      |snapb AS (
      |  SELECT b.topic, b.part, log_end, snap_off,
      |    n_ongoing_at_snap, n_aborted_index,
      |    COALESCE(n_producers_snap, 0) AS n_producers_snap
      |  FROM bounds b
      |  JOIN ts USING (topic, part)
      |  LEFT JOIN pr USING (topic, part))""".stripMargin

  val oracles: Map[String, String] = Map(
    "init_producer_id" -> (L + txnSql +
      s""", named AS (
        |  SELECT 'txn-' || CAST(txn_id AS VARCHAR) AS transactional_id,
        |    txn_id
        |  FROM txn GROUP BY txn_id),
        |nd AS (
        |  SELECT transactional_id,
        |    CASE ${md5LongSql("'txnto#' || transactional_id")} % 4
        |      WHEN 0 THEN 0 WHEN 1 THEN 60000 WHEN 2 THEN 900000
        |      ELSE 1800000 END AS timeout_ms,
        |    ${md5LongSql("'epoch#' || transactional_id")} % 8
        |      AS prev_epoch,
        |    txn_id
        |  FROM named)
        |SELECT transactional_id, 'transactional' AS request_kind,
        |  CAST(timeout_ms AS BIGINT) AS timeout_ms,
        |  CASE WHEN timeout_ms <= 0 OR timeout_ms > 900000
        |    THEN 'INVALID_TRANSACTION_TIMEOUT' ELSE 'NONE' END AS outcome,
        |  CASE WHEN timeout_ms > 0 AND timeout_ms <= 900000
        |    THEN 9000 + txn_id END AS producer_id,
        |  CASE WHEN timeout_ms > 0 AND timeout_ms <= 900000
        |    THEN prev_epoch + 1 END AS producer_epoch
        |FROM nd
        |UNION ALL
        |SELECT NULL, 'idempotent', NULL, 'NONE', 5000 + g,
        |  CAST(0 AS BIGINT)
        |FROM (SELECT CAST(g AS BIGINT) AS g FROM generate_series(0, 31) t(g))
        |UNION ALL
        |SELECT '', 'transactional', CAST(60000 AS BIGINT),
        |  'INVALID_REQUEST', NULL, NULL""".stripMargin),
    "aborted_txn_index" -> (L + txnSql +
      """SELECT topic, part, txn_id,
        |  MIN(offs) AS first_offset, MAX(offs) AS last_offset,
        |  COUNT(*) AS n_records
        |FROM txn WHERE aborted = 1
        |GROUP BY topic, part, txn_id""".stripMargin),
    "end_txn_validation" -> (L + txnSql +
      s""", st AS (
        |  SELECT txn_id, COUNT(*) AS n_records,
        |    (${fateSql("txn_id")}) AS fate,
        |    substring(md5('endstate#' || CAST(txn_id AS VARCHAR)), 1, 1)
        |      AS sub,
        |    substring(md5('endepoch#' || CAST(txn_id AS VARCHAR)), 1, 1)
        |      <> '0' AS epoch_ok
        |  FROM txn GROUP BY txn_id),
        |sd AS (
        |  SELECT *,
        |    CASE WHEN fate = 'COMMITTED' THEN
        |        CASE WHEN sub IN ('0','1','2','3') THEN 'PrepareCommit'
        |          ELSE 'CompleteCommit' END
        |      WHEN fate = 'ABORTED' THEN
        |        CASE WHEN sub IN ('0','1','2','3') THEN 'PrepareAbort'
        |          ELSE 'CompleteAbort' END
        |      ELSE CASE WHEN sub IN ('0','1','2','3') THEN 'Empty'
        |        ELSE 'Ongoing' END END AS state
        |  FROM st),
        |oc AS (
        |  SELECT txn_id, state, requested_result, epoch_ok, n_records,
        |    CASE WHEN NOT epoch_ok THEN 'PRODUCER_FENCED'
        |      WHEN state = 'Ongoing' THEN 'NONE'
        |      WHEN state = 'CompleteCommit' THEN
        |        CASE WHEN requested_result = 'COMMIT' THEN 'NONE'
        |          ELSE 'INVALID_TXN_STATE' END
        |      WHEN state = 'CompleteAbort' THEN
        |        CASE WHEN requested_result = 'ABORT' THEN 'NONE'
        |          ELSE 'INVALID_TXN_STATE' END
        |      WHEN state = 'PrepareCommit' THEN
        |        CASE WHEN requested_result = 'COMMIT'
        |          THEN 'CONCURRENT_TRANSACTIONS'
        |          ELSE 'INVALID_TXN_STATE' END
        |      WHEN state = 'PrepareAbort' THEN
        |        CASE WHEN requested_result = 'ABORT'
        |          THEN 'CONCURRENT_TRANSACTIONS'
        |          ELSE 'INVALID_TXN_STATE' END
        |      ELSE 'INVALID_TXN_STATE' END AS outcome
        |  FROM sd CROSS JOIN (SELECT 'COMMIT' AS requested_result
        |    UNION ALL SELECT 'ABORT') rr)
        |SELECT txn_id, state, requested_result, epoch_ok, outcome,
        |  CASE WHEN outcome <> 'NONE' THEN NULL
        |    WHEN state = 'Ongoing' THEN
        |      CASE WHEN requested_result = 'COMMIT' THEN 'PrepareCommit'
        |        ELSE 'PrepareAbort' END
        |    ELSE state END AS next_state,
        |  n_records
        |FROM oc""".stripMargin),
    "add_offsets_to_txn" -> (L + graft.coordinator.Groups.commitsSql +
      s""", toc AS (
         |  SELECT group_id,
         |    ${md5LongSql("group_id || '#' || topic || '#' || CAST(part AS VARCHAR)")}
         |      % 64 AS txn_id
         |  FROM commits),
         |reg AS (
         |  SELECT txn_id, group_id, COUNT(*) AS n_commit_partitions,
         |    '__consumer_offsets' AS meta_topic,
         |    ${md5LongSql("group_id")} % 50
         |      AS meta_partition
         |  FROM toc GROUP BY txn_id, group_id)
         |SELECT txn_id, group_id, n_commit_partitions, meta_topic,
         |  meta_partition,
         |  ${md5LongSql("meta_topic || '#' || CAST(meta_partition AS VARCHAR)")} % 4
         |    AS coordinator_broker,
         |  ${fateSql("txn_id")} AS txn_state,
         |  CAST(CASE WHEN (${fateSql("txn_id")}) = 'ONGOING' THEN 1 ELSE 0
         |    END AS BIGINT) AS pending_commit
         |FROM reg""".stripMargin),
    "describe_transactions" -> (L + txnSql +
      s""", dm AS (
         |  SELECT txn_id,
         |    max_by(CAST(k AS BIGINT) % 16, event_id) AS producer_id,
         |    max_by((event_id // 500) % 8, event_id) AS producer_epoch,
         |    MIN(tms) AS start_ms,
         |    CAST(COUNT(DISTINCT topic || '#' || CAST(part AS VARCHAR))
         |      AS BIGINT) AS n_partitions,
         |    string_agg(DISTINCT topic || '#' || CAST(part AS VARCHAR), ','
         |      ORDER BY topic || '#' || CAST(part AS VARCHAR)) AS partitions
         |  FROM txn GROUP BY txn_id),
        |q AS (SELECT range AS txn_id FROM range(0, 80))
        |SELECT q.txn_id,
        |  CASE WHEN dm.txn_id IS NULL THEN 'TRANSACTIONAL_ID_NOT_FOUND'
        |    ELSE 'NONE' END AS error_code,
        |  CASE WHEN dm.txn_id IS NULL THEN NULL
        |    WHEN (${fateSql("dm.txn_id")}) = 'ABORTED' THEN 'CompleteAbort'
        |    WHEN (${fateSql("dm.txn_id")}) = 'ONGOING' THEN 'Ongoing'
        |    ELSE 'CompleteCommit' END AS state,
        |  dm.producer_id, dm.producer_epoch,
        |  CASE WHEN dm.txn_id IS NULL THEN NULL
        |    ELSE CAST(60000 AS BIGINT) END AS txn_timeout_ms,
        |  dm.start_ms, dm.n_partitions, dm.partitions
        |FROM q LEFT JOIN dm ON q.txn_id = dm.txn_id""".stripMargin),
    "add_partitions_to_txn" -> (L + txnSql +
      """, reg AS (
        |  SELECT txn_id, topic, part,
        |    MIN(event_id) AS first_event_id, MIN(tms) AS first_ms,
        |    MIN(offs) AS first_offs, COUNT(*) AS n_records
        |  FROM txn GROUP BY txn_id, topic, part)
        |SELECT txn_id, topic, part, first_event_id, first_ms, first_offs,
        |  n_records,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY txn_id
        |    ORDER BY first_event_id) AS BIGINT) AS add_seq
        |FROM reg""".stripMargin),
    "txn_offset_commits" -> (L + graft.coordinator.Groups.commitsSql +
      s""", toc AS (
         |  SELECT group_id, topic, part, committed, log_end,
         |    ${md5LongSql("group_id || '#' || topic || '#' || CAST(part AS VARCHAR)")}
         |      % 64 AS txn_id
         |  FROM commits),
         |st AS (
         |  SELECT *,
         |    committed + (log_end - committed) // 2 AS txn_offset
         |  FROM toc),
         |fin AS (
         |  SELECT group_id, topic, part, committed AS base_committed, txn_id,
         |    ${fateSql("txn_id")} AS txn_state,
         |    txn_offset
         |  FROM st),
        |mat AS (
        |  SELECT *, CASE WHEN txn_state = 'COMMITTED'
        |      THEN GREATEST(txn_offset, base_committed)
        |      ELSE base_committed END AS materialized
        |  FROM fin)
        |SELECT group_id, topic, part, base_committed, txn_id, txn_state,
        |  txn_offset, materialized,
        |  CAST(CASE WHEN txn_state = 'ONGOING' THEN 1 ELSE 0 END AS BIGINT)
        |    AS pending,
        |  CAST(CASE WHEN txn_state = 'ABORTED' THEN 1 ELSE 0 END AS BIGINT)
        |    AS rolled_back,
        |  CASE WHEN txn_state = 'ONGOING' THEN NULL ELSE materialized END
        |    AS stable_offset
        |FROM mat""".stripMargin),
    "describe_producers" -> (L + txnSql +
      s""", pr AS (
         |  SELECT topic, part, CAST(k AS BIGINT) % 16 AS producer_id,
         |    (event_id // 500) % 8 AS epoch, tms, offs,
         |    CASE WHEN (${fateSql("txn_id")}) = 'ONGOING'
         |      THEN 1 ELSE 0 END AS open
         |  FROM txn)
        |SELECT topic, part, producer_id,
        |  COUNT(*) AS n_records,
        |  COUNT(*) - 1 AS last_seq,
        |  MAX(epoch) AS producer_epoch,
        |  MAX(tms) AS last_ms,
        |  CAST(MAX(open) AS BIGINT) AS open_txn,
        |  MIN(CASE WHEN open = 1 THEN offs END) AS txn_start_offs
        |FROM pr GROUP BY topic, part, producer_id""".stripMargin),
    "list_transactions" -> (L + txnSql +
      s""", lt AS (
         |  SELECT txn_id,
         |    CASE (${fateSql("txn_id")})
         |      WHEN 'ABORTED' THEN 'CompleteAbort'
         |      WHEN 'ONGOING' THEN 'Ongoing'
         |      ELSE 'CompleteCommit' END AS state,
         |    CAST(k AS BIGINT) % 16 AS producer_id,
         |    topic || '#' || CAST(part AS VARCHAR) AS tp, tms
         |  FROM txn)
        |SELECT txn_id, state,
        |  CAST(COUNT(DISTINCT producer_id) AS BIGINT) AS n_producers,
        |  CAST(COUNT(DISTINCT tp) AS BIGINT) AS n_partitions,
        |  MIN(tms) AS start_ms,
        |  MAX(tms) - MIN(tms) AS duration_ms
        |FROM lt
        |WHERE state <> 'CompleteCommit'
        |GROUP BY txn_id, state""".stripMargin),
    "txn_markers" -> (L + txnSql +
      s""", tpb AS (
        |  SELECT txn_id, aborted,
        |    topic || '#' || CAST(part AS VARCHAR) AS tp,
        |    ${md5LongSql("topic || '#' || CAST(part AS VARCHAR)")} % 4
        |      AS broker
        |  FROM txn)
        |SELECT txn_id,
        |  MAX(CASE WHEN aborted = 1 THEN 'ABORT' ELSE 'COMMIT' END) AS marker,
        |  CAST(COUNT(DISTINCT tp) AS BIGINT) AS n_markers,
        |  CAST(COUNT(DISTINCT broker) AS BIGINT) AS n_broker_batches,
        |  COUNT(*) AS n_records
        |FROM tpb GROUP BY txn_id""".stripMargin),
    "producer_id_blocks" -> (L +
      s"""pp AS (
         |  SELECT topic, part, COUNT(DISTINCT k) AS n_producers,
         |    ${md5LongSql("topic || '#' || CAST(part AS VARCHAR)")} % 4
         |      AS broker
         |  FROM log GROUP BY topic, part),
         |pb AS (
         |  SELECT broker, CAST(SUM(n_producers) AS BIGINT) AS n_sessions,
         |    CAST((SUM(n_producers) + 999) // 1000 AS BIGINT) AS n_blocks
         |  FROM pp GROUP BY broker),
         |seq AS (
         |  SELECT *, CAST(SUM(n_blocks) OVER (ORDER BY broker) - n_blocks
         |    AS BIGINT) AS blocks_before
         |  FROM pb)
         |SELECT broker, n_sessions, n_blocks,
         |  blocks_before * 1000 AS block_start,
         |  (blocks_before + n_blocks) * 1000 - 1 AS block_end,
         |  n_blocks * 1000 - n_sessions AS ids_unused,
         |  (${Long.MaxValue} - ((blocks_before + n_blocks) * 1000 - 1)) // 1000
         |    AS headroom_blocks
         |FROM seq""".stripMargin),
    "producer_state_snapshot" -> (L + txnSql +
      s""", $snapBoundarySql
        |SELECT topic, part, log_end, snap_off,
        |  n_ongoing_at_snap, n_aborted_index, n_producers_snap,
        |  log_end - snap_off AS replay_tail,
        |  CASE WHEN snap_off > 0 THEN 'SNAPSHOT_REPLAY'
        |    ELSE 'FULL_REPLAY' END AS recovery
        |FROM snapb""".stripMargin),
    // Chains the SAME snapshot-boundary frame as producer_state_snapshot
    // (snapBoundarySql — one spelling), then the buffer-read model on top.
    "snapshot_buffer_replay" -> (L + txnSql +
      s""", $snapBoundarySql,
        |flags AS (
        |  SELECT *, log_end // 256 AS n_snapshots_written,
        |    CASE WHEN log_end // 256 > 0 AND ${md5LongSql(
             "'snapuuid#' || topic || '#' || CAST(part AS VARCHAR)")} % 8 = 0
        |      THEN 1 ELSE 0 END AS topic_recreated
        |  FROM snapb),
        |app AS (
        |  SELECT *,
        |    CASE WHEN n_snapshots_written = 0 OR topic_recreated = 1
        |      THEN 0 ELSE snap_off END AS applied_snap_off
        |  FROM flags)
        |SELECT topic, part, log_end,
        |  CAST(n_snapshots_written AS BIGINT) AS n_snapshots_written,
        |  CAST(GREATEST(n_snapshots_written - 1, 0) AS BIGINT)
        |    AS n_stale_skipped,
        |  CAST(topic_recreated AS BIGINT) AS topic_recreated,
        |  snap_off AS latest_snap_off,
        |  CAST(applied_snap_off AS BIGINT) AS applied_snap_off,
        |  CAST(CASE WHEN applied_snap_off > 0 THEN n_producers_snap
        |    ELSE 0 END AS BIGINT) AS restored_producers,
        |  CAST(CASE WHEN applied_snap_off > 0 THEN n_ongoing_at_snap
        |    ELSE 0 END AS BIGINT) AS restored_ongoing,
        |  CAST(CASE WHEN applied_snap_off > 0 THEN n_aborted_index
        |    ELSE 0 END AS BIGINT) AS restored_aborted,
        |  CAST(log_end - applied_snap_off AS BIGINT) AS replay_tail,
        |  CASE WHEN n_snapshots_written = 0 THEN 'NO_SNAPSHOT'
        |       WHEN topic_recreated = 1 THEN 'UUID_MISMATCH'
        |       ELSE 'SNAPSHOT_REPLAY' END AS recovery
        |FROM app""".stripMargin),
    "txn_marker_retries" -> (L + txnSql +
      s""", pairs AS (
        |  SELECT txn_id, broker, COUNT(DISTINCT tp) AS n_partitions
        |  FROM (SELECT txn_id, topic || '#' || CAST(part AS VARCHAR) AS tp,
        |          ${md5LongSql(
             "topic || '#' || CAST(part AS VARCHAR)")} % 4 AS broker
        |        FROM txn)
        |  GROUP BY txn_id, broker),
        |fp AS (
        |  SELECT *, (${fateSql("txn_id")}) AS fate FROM pairs
        |  WHERE (${fateSql("txn_id")}) <> 'ONGOING'),
        |dr AS (
        |  SELECT *,
        |    CASE WHEN d = 7 THEN 2 WHEN d >= 5 THEN 1 ELSE 0 END
        |      AS fail_rounds
        |  FROM (SELECT *, ${md5LongSql(
             "'mkretry#' || CAST(txn_id AS VARCHAR) || '#' || CAST(broker AS VARCHAR)")} % 8
        |          AS d
        |        FROM fp))
        |SELECT broker, COUNT(*) AS n_marker_entries,
        |  CAST(SUM(n_partitions) AS BIGINT) AS n_partitions,
        |  CAST(SUM(CASE WHEN fate = 'ABORTED' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_abort_markers,
        |  CAST(SUM(CASE WHEN fail_rounds > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_failed_first_send,
        |  CAST(SUM(fail_rounds) AS BIGINT) AS n_requeues,
        |  CAST(SUM(fail_rounds) + COUNT(*) AS BIGINT) AS n_send_attempts,
        |  CAST(MAX(fail_rounds) + 1 AS BIGINT) AS max_rounds,
        |  CAST((MAX(fail_rounds) + 1) * 100 AS BIGINT) AS max_drain_ms,
        |  CAST(SUM((fail_rounds + 1) * 100) AS BIGINT) AS sum_drain_ms
        |FROM dr GROUP BY broker""".stripMargin),
    "lso_lag" -> (L + txnSql +
      s"""SELECT topic, part, log_end,
        |  first_undecided, n_open_txns,
        |  COALESCE(first_undecided, log_end) AS lso,
        |  log_end - COALESCE(first_undecided, log_end) AS lso_lag
        |FROM (
        |  SELECT topic, part, MAX(offs) + 1 AS log_end,
        |    MIN(CASE WHEN (${fateSql("txn_id")}) = 'ONGOING'
        |      THEN offs END) AS first_undecided,
        |    CAST(COUNT(DISTINCT CASE WHEN (${fateSql("txn_id")}) = 'ONGOING'
        |      THEN txn_id END) AS BIGINT) AS n_open_txns
        |  FROM txn GROUP BY topic, part)""".stripMargin),
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
    "txn_expire" -> (L + txnSql +
      """, inst AS (
        |  SELECT txn_id, (tms // 86400000) * 86400000 AS day_ms,
        |    MIN(tms) AS first_ms, MAX(tms) AS last_ms, COUNT(*) AS n_records
        |  FROM txn GROUP BY txn_id, (tms // 86400000) * 86400000),
        |flagged AS (
        |  SELECT *, CASE WHEN last_ms - first_ms > 14400000 THEN 1 ELSE 0 END
        |    AS timed_out
        |  FROM inst)
        |SELECT txn_id, COUNT(*) AS n_instances,
        |  CAST(SUM(timed_out) AS BIGINT) AS n_timed_out,
        |  MAX(last_ms - first_ms) AS max_duration_ms
        |FROM flagged GROUP BY txn_id""".stripMargin),
    "producer_gaps" -> (L +
      """seqd AS (
        |  SELECT CAST(k AS BIGINT) % 16 AS producer_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY CAST(k AS BIGINT) % 16
        |      ORDER BY event_id) - 1 AS seq
        |  FROM log),
        |delivered AS (
        |  SELECT * FROM seqd
        |  WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) <> 'f'),
        |gaps AS (
        |  SELECT producer_id, seq,
        |    seq - COALESCE(LAG(seq) OVER (PARTITION BY producer_id
        |      ORDER BY seq), -1) - 1 AS gap
        |  FROM delivered)
        |SELECT producer_id, COUNT(*) AS n_delivered,
        |  CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  CAST(SUM(gap) AS BIGINT) AS n_missing, MAX(gap) AS max_gap
        |FROM gaps GROUP BY producer_id""".stripMargin),
    "txn_log_replay" -> (L + txnSql +
      s""", pt AS (
        |  SELECT txn_id,
        |    CAST(COUNT(DISTINCT topic || '#' || CAST(part AS VARCHAR))
        |      AS BIGINT) AS n_partitions
        |  FROM txn GROUP BY txn_id),
        |d AS (
        |  SELECT txn_id, n_partitions,
        |    (${fateSql("txn_id")}) AS fate,
        |    ${graft.functions.Parity.md5LongSql(
             "'txph#' || CAST(txn_id AS VARCHAR)")} % 3 = 0
        |      AS crashed_at_prepare,
        |    CAST(CASE WHEN ${graft.functions.Parity.md5LongSql(
             "'txdel#' || CAST(txn_id AS VARCHAR)")} % 8 = 0
        |      THEN 1 ELSE 0 END AS BIGINT) AS tombstoned
        |  FROM pt),
        |e AS (
        |  SELECT *,
        |    CASE WHEN fate = 'ONGOING' THEN 'Ongoing'
        |         WHEN fate = 'COMMITTED' THEN
        |           CASE WHEN crashed_at_prepare THEN 'PrepareCommit'
        |             ELSE 'CompleteCommit' END
        |         ELSE CASE WHEN crashed_at_prepare THEN 'PrepareAbort'
        |             ELSE 'CompleteAbort' END END AS loaded_state
        |  FROM d),
        |f AS (
        |  SELECT *,
        |    CASE WHEN tombstoned = 1 THEN 'NONE'
        |         WHEN loaded_state = 'PrepareCommit' THEN 'COMMIT'
        |         WHEN loaded_state = 'PrepareAbort' THEN 'ABORT'
        |         ELSE 'NONE' END AS recovery_marker
        |  FROM e)
        |SELECT ${graft.functions.Parity.md5LongSql(
             "'t' || CAST(txn_id AS VARCHAR)")} % 50 AS meta_partition,
        |  txn_id, n_partitions, loaded_state, tombstoned,
        |  CAST(1 - tombstoned AS BIGINT) AS loaded, recovery_marker,
        |  CAST(CASE WHEN recovery_marker <> 'NONE' THEN n_partitions
        |    ELSE 0 END AS BIGINT) AS n_marker_partitions,
        |  CAST(1 + n_partitions +
        |    CASE WHEN loaded_state LIKE 'Prepare%' THEN 1
        |         WHEN loaded_state LIKE 'Complete%' THEN 2
        |         ELSE 0 END + tombstoned AS BIGINT) AS n_log_records
        |FROM f""".stripMargin),
    "txn_state" -> (L + txnSql +
      """SELECT txn_id,
        |  MAX(CASE WHEN aborted = 1 THEN 'ABORTED' ELSE 'COMMITTED' END) AS state,
        |  COUNT(*) AS n_records,
        |  CAST(COUNT(DISTINCT topic || '#' || CAST(part AS VARCHAR)) AS BIGINT) AS n_partitions,
        |  MIN(tms) AS first_ms, MAX(tms) AS last_ms
        |FROM txn GROUP BY txn_id""".stripMargin))
}
