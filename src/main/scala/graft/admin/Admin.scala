package graft.admin

import graft.functions.Parity.md5LongSql
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
    // dense offsets: log_end = COUNT(*) per partition, so the offset
    // window is pure waste (oracle spelling MAX(offs)+1 is value-equal)
    LogOps.logBase(spark, dir)
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n"),
        count(lit(1)).as("log_end"),
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
    LogOps.logBase(spark, dir).agg(
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
    LogOps.logBase(spark, dir)
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
    LogOps.logBase(spark, dir)
      .select("topic", "part").distinct()
      .select(
        col("topic"), col("part"),
        concat(lit("persistent://public/default/"), col("topic"),
          lit("-partition-"), col("part").cast("string")).as("pulsar_name"))
      .withColumn("kafka_name",
        regexp_extract(col("pulsar_name"), "^persistent://[^/]+/[^/]+/(.+)-partition-[0-9]+$", 1))

  /** [[topicNameMap]]'s round trip with the isPartitioned split
    * (utils/KopTopic.java:120 — TopicName.isPartitioned is a
    * `-partition-N` suffix test, and getPartitionName appends the suffix
    * ONLY for partitioned topics; tests/KafkaNonPartitionedTopicTest
    * .java pins produce/consume against a topic that keeps its bare
    * name). An md5 coin marks a quarter of the topic universe
    * non-partitioned: those map to the suffix-FREE Pulsar name, report
    * partition count 1, collapse their 8 hash slices into one row, and
    * the repartition_map consumer SKIPS them (a non-partitioned topic
    * has no partition map to grow, so n_repartition_moved = 0); the
    * partitioned rest keep topic_name_map's exact per-partition mapping
    * and carry their repartition-move counts. kafka_name round-trips
    * from pulsar_name by the same suffix test KopTopic applies.
    *
    * Scale: one scan partial-aggregated to (topic, part) grain, an
    * in-row md5 coin, and a second metadata-sized aggregate that merges
    * the non-partitioned slices; the partition count is a window over
    * the |topics|·|parts| frame.
    */
  def nonpartitionedTopics(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    import org.apache.spark.sql.expressions.Window
    LogOps.logBase(spark, dir)
      .withColumn("part12", pmod(col("k").cast("long"), lit(12L)))
      .groupBy("topic", "part")
      .agg(count(lit(1)).as("n"),
        sum(when(col("part") =!= col("part12"), 1L).otherwise(0L)).as("mv"))
      .withColumn("is_partitioned",
        pmod(md5Long(concat(lit("np#"), col("topic"))), lit(4L)) =!= 0L)
      .groupBy(col("topic"), col("is_partitioned"),
        when(col("is_partitioned"), col("part")).otherwise(lit(0L))
          .as("part"))
      .agg(sum("n").cast("long").as("n_records"),
        sum("mv").cast("long").as("mv"))
      .withColumn("n_partitions",
        count(lit(1)).over(Window.partitionBy("topic")))
      .select(
        col("topic"), col("part"), col("is_partitioned"),
        when(col("is_partitioned"),
          concat(lit("persistent://public/default/"), col("topic"),
            lit("-partition-"), col("part").cast("string")))
          .otherwise(concat(lit("persistent://public/default/"),
            col("topic"))).as("pulsar_name"),
        col("n_partitions"), col("n_records"),
        when(col("is_partitioned"), col("mv")).otherwise(0L)
          .as("n_repartition_moved"))
      .withColumn("kafka_name",
        when(col("is_partitioned"),
          regexp_extract(col("pulsar_name"),
            "^persistent://[^/]+/[^/]+/(.+)-partition-[0-9]+$", 1))
          .otherwise(regexp_extract(col("pulsar_name"),
            "^persistent://[^/]+/[^/]+/(.+)$", 1)))
  }

  /** Per-topic Kafka->KoP migration status with the offset fence
    * (/root/reference/kafka-impl/.../migration/metadata/MigrationMetadata.java:29,
    * migrationStatus at :42; phases from MigrationStatus.java —
    * NOT_STARTED / STARTED / DONE). Each topic's phase is an md5 hash coin;
    * the cutover fence for an in-flight migration sits at the midpoint of
    * the topic's time range, and per partition the fence offset is the
    * count of records at or before it (offsets below the fence live in the
    * source cluster, the rest are KoP-native). NOT_STARTED topics fence at
    * 0, DONE topics at the log end — the per-phase request-routing view the
    * MigrationMetadataManager keeps.
    *
    * Scale: the fence count is one map-side-combinable conditional
    * aggregate over the (topic, part) partitioning every log op reuses.
    */
  def migrationStatus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    // The per-topic midpoint fence comes from a partial-aggregated
    // bounds frame BROADCAST back into the fact scan — NOT a window
    // partitioned by the |topics|-cardinality key, which would collapse
    // the whole fact onto a handful of tasks at 1000x. Offsets are
    // dense per partition, so log_end = max(offs)+1 needs no window
    // either (the raw events scan suffices; same values, same oracle).
    val bounds = graft.Tables.t(spark, dir, "events")
      .select(col("event_type").as("topic"), expr("ts div 1000000").as("tms"))
      .groupBy("topic")
      .agg(min("tms").as("mn"), max("tms").as("mx"))
      .withColumn("mid_ts", expr("mn + (mx - mn) div 2"))
      .withColumn("phase_id",
        pmod(md5Long(concat(col("topic"), lit("#mig"))), lit(3L)))
      .select("topic", "mid_ts", "phase_id")
    val statused = LogOps.log(spark, dir).join(broadcast(bounds), "topic")
    statused
      .groupBy("topic", "part", "phase_id")
      .agg(
        (max("offs") + 1L).as("log_end"),
        sum(when(col("tms") <= col("mid_ts"), 1L).otherwise(0L)).cast("long")
          .as("n_before_mid"))
      .select(
        col("topic"), col("part"),
        when(col("phase_id") === 0L, "NOT_STARTED")
          .when(col("phase_id") === 1L, "STARTED")
          .otherwise("DONE").as("migration_status"),
        concat(lit("kafka-src-"), col("phase_id").cast("string"))
          .as("kafka_cluster_address"),
        col("log_end"),
        when(col("phase_id") === 0L, 0L)
          .when(col("phase_id") === 1L, col("n_before_mid"))
          .otherwise(col("log_end")).as("fence_offset"))
      .withColumn("n_pending", col("log_end") - col("fence_offset"))
  }

  /** The migration HTTP request lifecycle over the per-topic fence view —
    * the three processors of /root/reference/kafka-impl/.../migration/
    * processor/: CreateTopicWithMigrationProcessor ("/migration/createTopic",
    * POST), StartMigrationProcessor ("/migration/start", POST) and
    * MigrationStatusProcessor ("/migration/status", GET), each a row per
    * topic with its request count and phase-dependent outcome
    * ([[migrationStatus]]'s NOT_STARTED/STARTED/DONE coin — a start request
    * is only acceptable from NOT_STARTED), plus the outstanding proxied
    * request count the ManagedLedgerPropertiesMigrationMetadataManager
    * tracks per topic while a migration is in flight (startProxyRequest /
    * finishProxyRequest: records past the fence of a STARTED topic are
    * requests KoP proxies to the source Kafka cluster). Status-poll volume
    * is data-derived (one GET per active hour of the topic).
    *
    * Scale: rides [[migrationStatus]]'s fence rollup (|topics|·|parts|
    * rows) plus one partial-aggregated per-topic poll count; the 3-way
    * request fan-out happens on the |topics|-sized frame in-row.
    */
  def migrationRequests(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val fence = migrationStatus(spark, dir)
      .groupBy("topic", "migration_status")
      .agg(sum(when(col("migration_status") === "STARTED", col("n_pending"))
        .otherwise(0L)).cast("long").as("n_outstanding_proxy"))
    val polls = LogOps.logBase(spark, dir).groupBy("topic")
      .agg(countDistinct(expr("tms div 3600000")).as("n_status_polls"))
    fence.join(polls, "topic")
      .withColumn("dup", pmod(
        md5Long(concat(lit("migreq#"), col("topic"))), lit(2L)))
      .select(col("topic"), col("migration_status"),
        col("n_outstanding_proxy"),
        explode(array(
          struct(lit("POST").as("method"),
            lit("/migration/createTopic").as("path"),
            (lit(1L) + col("dup")).as("n_requests"),
            col("dup").as("n_rejected"),
            lit("CREATED").as("outcome")),
          struct(lit("POST").as("method"),
            lit("/migration/start").as("path"),
            lit(1L).as("n_requests"), lit(0L).as("n_rejected"),
            when(col("migration_status") === "NOT_STARTED", "ACCEPTED")
              .when(col("migration_status") === "STARTED",
                "ALREADY_STARTED")
              .otherwise("ALREADY_DONE").as("outcome")),
          struct(lit("GET").as("method"),
            lit("/migration/status").as("path"),
            col("n_status_polls").cast("long").as("n_requests"),
            lit(0L).as("n_rejected"),
            lit("OK").as("outcome")))).as("r"))
      .select(col("topic"), col("r.method"), col("r.path"),
        col("r.n_requests"), col("r.n_rejected"), col("r.outcome"),
        col("migration_status"), col("n_outstanding_proxy"))
  }

  /** Advertised-listener parse + validation — the endpoint table every
    * broker advertises and every client resolves against
    * (/root/reference/kafka-impl/.../AdvertisedListener.java:28 — the
    * `^(.*)://\[?([0-9a-zA-Z\-%._:]*)\]?:(-?[0-9]+)` pattern, :53 the
    * 0..65535 port check, :57-60 the empty-hostname fallback to the
    * local canonical hostname; EndPoint.java is the config-side twin).
    * Listener strings are md5-drawn per (broker, slot) INCLUDING
    * out-of-range ports and empty hostnames, then parsed back with the
    * reference's own regex — the round trip pins the parse path, and
    * the outcome column is the checkState the reference throws.
    *
    * Scale: a |brokers|·|slots| metadata frame, in-row regex work.
    */
  def advertisedListeners(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val rx = "^(.*)://\\[?([0-9a-zA-Z\\-%._:]*)\\]?:(-?[0-9]+)"
    // brokers are the 4-broker universe every placement op uses; the
    // events table is only touched to keep the frame data-anchored
    // (a tenantless cluster with zero topics advertises nothing).
    val live = LogOps.logBase(spark, dir).select("topic").distinct().limit(1)
    spark.range(0, 4, 1, 1).select(col("id").as("broker"))
      .crossJoin(live.select(lit(1).as("one"))).drop("one")
      .crossJoin(spark.range(0, 3, 1, 1).select(col("id").as("slot")))
      .withColumn("proto",
        element_at(array(lit("PLAINTEXT"), lit("SSL"),
          lit("SASL_PLAINTEXT"), lit("SASL_SSL")),
          (pmod(md5Long(concat_ws("#", lit("proto"), col("broker"),
            col("slot"))), lit(4L)) + 1L).cast("int")))
      .withColumn("host_coin", pmod(md5Long(concat_ws("#", lit("lhost"),
        col("broker"), col("slot"))), lit(4L)))
      .withColumn("host",
        when(col("host_coin") === 0L, "")
          .when(col("host_coin") === 1L,
            concat(lit("broker-"), col("broker"), lit(".cluster.local")))
          .when(col("host_coin") === 2L,
            concat(lit("10.0.0."), col("broker")))
          .otherwise(concat(lit("broker-"), col("broker"))))
      .withColumn("port",
        when(pmod(md5Long(concat_ws("#", lit("lport"), col("broker"),
          col("slot"))), lit(8L)) === 0L, lit(70000L))
          .otherwise(lit(9092L) + col("slot")))
      .withColumn("original_listener",
        concat(col("proto"), lit("://"), col("host"), lit(":"),
          col("port").cast("string")))
      .withColumn("listener_name",
        regexp_extract(col("original_listener"), rx, 1))
      .withColumn("parsed_host",
        regexp_extract(col("original_listener"), rx, 2))
      .withColumn("parsed_port",
        regexp_extract(col("original_listener"), rx, 3).cast("long"))
      .withColumn("hostname",
        when(col("parsed_host") === "", "localhost")
          .otherwise(col("parsed_host")))
      .withColumn("outcome",
        when(col("parsed_port") < 0L || col("parsed_port") > 65535L,
          "INVALID_PORT").otherwise("OK"))
      .select(col("broker"), col("slot"), col("original_listener"),
        col("listener_name"), col("hostname"), col("parsed_port"),
        col("outcome"))
  }

  /** System metadata-topic provisioning audit — MetadataUtils
    * .createKafkaMetadataIfMissing (/root/reference/kafka-impl/.../utils/
    * MetadataUtils.java:84-107,122-125: per tenant the __consumer_offsets
    * and __transaction_state partitioned topics plus the schema-registry
    * topic are created if missing, and "if the offset topic exists but
    * some partitions are missing, the missing partitions will be
    * created"). Per (tenant, system topic): the full pulsar name, the
    * configured partition count (50/50/1 —
    * KafkaServiceConfiguration.java:56,59), an md5-drawn pre-existing
    * partition count, and the resulting action (CREATED /
    * PARTITIONS_ADDED / NONE) with how many partitions the call adds.
    *
    * Scale: |tenants|·3 metadata rows; the only data touch is the
    * tenant universe draw.
    */
  def metadataTopics(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val tenants = LogOps.logBase(spark, dir).select("topic").distinct()
      .select(tenantCol(col("topic")).as("tenant")).distinct()
    val sys = spark.range(0, 3, 1, 1).select(
      element_at(array(lit("__consumer_offsets"),
        lit("__transaction_state"), lit("__schema_registry")),
        (col("id") + 1L).cast("int")).as("system_topic"),
      element_at(array(lit(50L), lit(50L), lit(1L)),
        (col("id") + 1L).cast("int")).as("n_partitions"))
    tenants.crossJoin(broadcast(sys))
      .withColumn("pulsar_name",
        concat(lit("persistent://"), col("tenant"), lit("/__kafka/"),
          col("system_topic")))
      .withColumn("n_existing",
        pmod(md5Long(concat_ws("#", lit("sysparts"), col("tenant"),
          col("system_topic"))), col("n_partitions") + 1L))
      .withColumn("n_created", col("n_partitions") - col("n_existing"))
      .withColumn("action",
        when(col("n_existing") === 0L, "CREATED")
          .when(col("n_existing") < col("n_partitions"),
            "PARTITIONS_ADDED")
          .otherwise("NONE"))
      .select(col("tenant"), col("system_topic"), col("pulsar_name"),
        col("n_partitions"), col("n_existing"), col("n_created"),
        col("action"))
  }

  /** Single-threaded KopEventManager queue accounting
    * (/root/reference/kafka-impl/.../KopEventManager.java:108-156 — one
    * KopEventThread drains a LinkedBlockingQueue; :123
    * registerEventQueuedLatency measures exactly the time an event waits
    * behind its predecessors; DeleteTopicsEvent :285 scans every group's
    * offsets per deleted topic, BrokersChangeEvent :362 refreshes the
    * broker list). Events are data-derived: one delete_topics event per
    * topic (arriving a minute after its last record; cost grows with the
    * group-offset rows to clean, 1 + 4·partitions ms) and one
    * brokers_change event per active hour (5 ms). The sequential queue
    * is the classic recurrence finish_i = max(arrival_i, finish_{i-1}) +
    * cost_i, computed in CLOSED FORM as two windows — finish_i = C_i +
    * max_{j<=i}(arrival_j − C_{j-1}) over the cumulative cost C — so the
    * "inherently sequential" simulation is one pass over the
    * metadata-sized event frame, exact in both engines (the global-order
    * window is fine because the frame is |topics| + |hours| rows, never
    * data-sized).
    */
  def kopEventQueue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dels = LogOps.logBase(spark, dir).groupBy("topic")
      .agg(max("tms").as("last_ms"), countDistinct("part").as("np"))
      .select(lit("delete_topics").as("event_class"),
        col("topic").as("event_key"),
        (col("last_ms") + 60000L).as("arrival_ms"),
        (lit(1L) + lit(4L) * col("np")).as("cost_ms"))
    val brokers = LogOps.logBase(spark, dir)
      .select(expr("tms div 3600000").as("h")).distinct()
      .select(lit("brokers_change").as("event_class"),
        concat(lit("h"), col("h").cast("string")).as("event_key"),
        (col("h") * 3600000L).as("arrival_ms"),
        lit(5L).as("cost_ms"))
    val w = Window.orderBy("arrival_ms", "event_class", "event_key")
      .rowsBetween(Window.unboundedPreceding, 0)
    dels.unionByName(brokers)
      .withColumn("c", sum("cost_ms").over(w).cast("long"))
      .withColumn("finish_ms",
        col("c") + max(col("arrival_ms") - col("c") + col("cost_ms")).over(w))
      .withColumn("start_ms", col("finish_ms") - col("cost_ms"))
      .withColumn("queued_ms", col("start_ms") - col("arrival_ms"))
      .select(col("event_class"), col("event_key"), col("arrival_ms"),
        col("cost_ms"), col("start_ms"), col("finish_ms"), col("queued_ms"))
  }

  /** Per-tenant rollup of the topic/partition/byte surface — the
    * reference keys group and transaction coordinators PER TENANT
    * (/root/reference/kafka-impl/.../TenantContextManager.java:30,38 —
    * getGroupCoordinator(tenant) / getTransactionCoordinator(tenant)
    * bootstrap one coordinator pair per tenant), and every topic lives at
    * persistent://tenant/namespace/topic (utils/KopTopic.java:34). Tenant
    * and namespace are md5 coins over the topic name (the
    * [[topicNameMap]] universe given a multi-tenant dimension); the
    * summary is what a per-tenant capacity/billing view reads.
    *
    * Scale: one partial-aggregated (topic, part) rollup (the
    * [[topicMetadata]] shape), then a |topics|-row re-aggregation.
    */
  /** The tenant draw over a topic name — ONE spelling shared by
    * [[tenantSummary]] and the streaming per-tenant throughput monitor
    * (the KopTopic persistent://tenant/... discipline).
    */
  private[graft] def tenantCol(topic: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import graft.functions.Parity.md5Long
    concat(lit("t"),
      pmod(md5Long(concat(lit("tenant#"), topic)), lit(3L)).cast("string"))
  }

  def tenantSummary(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    LogOps.logBase(spark, dir)
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("v")) + length(col("k"))).cast("long").as("bytes"),
        min("tms").as("mn"), max("tms").as("mx"))
      .withColumn("tenant", tenantCol(col("topic")))
      .withColumn("ns", concat(col("tenant"), lit("/ns"),
        pmod(md5Long(concat(lit("ns#"), col("topic"))), lit(2L))
          .cast("string")))
      .groupBy("tenant")
      .agg(
        countDistinct("ns").as("n_namespaces"),
        countDistinct("topic").as("n_topics"),
        count(lit(1)).as("n_partitions"),
        sum("n").cast("long").as("n_records"),
        sum("bytes").cast("long").as("approx_bytes"),
        min("mn").as("earliest_ms"),
        max("mx").as("latest_ms"))
      .withColumn("group_coordinator", concat(lit("gc-"), col("tenant")))
      .withColumn("txn_coordinator", concat(lit("tc-"), col("tenant")))
  }

  /** Delayed topic/partition-creation purgatory accounting
    * (/root/reference/kafka-impl/.../DelayedCreateTopics.java — tryComplete
    * fires when numTopics hits 0, onExpiration after delayMs;
    * DelayedCreatePartitions.java is the per-partition twin). A topic's
    * create request is submitted at its first record; the operation
    * completes when the last of its partitions sees ITS first record.
    * Per topic: partitions awaited, submit/complete times, and whether the
    * purgatory entry completed within the 1h delay or timed out.
    * Fetch_wait's mold applied to the creation purgatory.
    *
    * The 1h purgatory delay is a MODELING choice, not the reference's
    * default (its request-level timeout is the client's, typically 30s):
    * the synthetic log spreads first-records over hours, so a
    * realistically short delay would mark every topic TimedOut and the
    * Completed branch would be dead code. 1h keeps both outcomes
    * populated at every SF.
    */
  def delayedCreate(spark: SparkSession, dir: String): DataFrame =
    LogOps.logBase(spark, dir)
      .groupBy("topic", "part")
      .agg(min("tms").as("part_create_ms"))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_partitions"),
        min("part_create_ms").as("request_ms"),
        max("part_create_ms").as("complete_ms"))
      .withColumn("wait_ms", col("complete_ms") - col("request_ms"))
      .withColumn("outcome",
        when(col("wait_ms") <= 3600000L, "Completed").otherwise("TimedOut"))

  /** DeleteTopics impact (KafkaRequestHandler.handleDeleteTopics;
    * AdminManager's topic deletion): per topic, everything deletion
    * destroys — partitions, records, bytes, rolled segments, and the
    * consumer groups whose committed offsets are orphaned (purged with
    * the topic). [[graft.coordinator.Groups.deleteGroups]]'s destructive
    * sibling at topic grain; a what-if view over every topic, the row an
    * operator reads before confirming the request.
    */
  def deleteTopics(spark: SparkSession, dir: String): DataFrame = {
    val segs = graft.log.BrokerOps.logSegments(spark, dir)
      .groupBy("topic").agg(count(lit(1)).as("n_segments"))
    val offs = Groups.commits(spark, dir).groupBy("topic")
      .agg(
        countDistinct("group_id").as("n_groups_affected"),
        count(lit(1)).as("n_offsets_purged"))
    topicMetadata(spark, dir)
      .join(segs, Seq("topic")).join(offs, Seq("topic"))
      .select("topic", "n_partitions", "n_records", "approx_bytes",
        "n_segments", "n_groups_affected", "n_offsets_purged")
  }

  /** Cache/PartitionLog invalidation per topic deletion — the `whenDelete`
    * sibling of [[graft.log.BrokerOps.bundleUnloadInvalidation]]
    * (/root/reference/kafka-impl/.../KafkaProtocolHandler.java:267-299 —
    * the TopicOwnershipListener handles DELETE with the same
    * invalidateBundleCache + invalidatePartitionLog pair as UNLOAD, and
    * BOTH helpers double-deReference a NON-partitioned topic name: the
    * bare name AND its `-partition-0` alias, because produce may have
    * cached either spelling; tests/CacheInvalidatorTest.java deletes the
    * topics and asserts both maps drain). A what-if view over
    * [[deleteTopics]]' universe (every topic), COMPOSING
    * [[nonpartitionedTopics]]' md5 coin so the three views agree on which
    * topics are partitioned: a partitioned topic's deletion fires one
    * whenDelete per `-partition-N` name (each already partitioned — one
    * deref each), a non-partitioned topic fires ONE bare-name event that
    * derefs TWO entries (bare + `-partition-0`) in the lookup cache and
    * removes TWO PartitionLog keys. Orphaned committed offsets ride
    * along from delete_topics' group-side accounting.
    *
    * Scale: one scan partial-aggregated to (topic, part), then
    * metadata-sized topic rollups; the commits side is the offsets-topic
    * scan delete_topics already prices.
    */
  def topicDeleteInvalidation(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    val base = LogOps.logBase(spark, dir)
      .groupBy("topic", "part")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_partitioned",
        pmod(md5Long(concat(lit("np#"), col("topic"))), lit(4L)) =!= 0L)
      .groupBy("topic", "is_partitioned")
      .agg(countDistinct("part").as("raw_parts"),
        sum("n").cast("long").as("n_records"))
      .withColumn("n_partitions",
        when(col("is_partitioned"), col("raw_parts")).otherwise(1L))
    val offs = Groups.commits(spark, dir).groupBy("topic")
      .agg(
        countDistinct("group_id").as("n_groups_affected"),
        count(lit(1)).as("n_offsets_purged"))
    base.join(offs, Seq("topic"), "left")
      .select(
        col("topic"), col("is_partitioned"), col("n_partitions"),
        col("n_records"),
        when(col("is_partitioned"), col("n_partitions")).otherwise(1L)
          .as("n_whendelete_events"),
        when(col("is_partitioned"), col("n_partitions")).otherwise(2L)
          .as("n_cache_derefs"),
        when(col("is_partitioned"), col("n_partitions")).otherwise(2L)
          .as("n_plog_removals"),
        coalesce(col("n_groups_affected"), lit(0L)).as("n_groups_affected"),
        coalesce(col("n_offsets_purged"), lit(0L)).as("n_offsets_purged"))
  }

  /** The parked-close window [[authFailureDelay]] models occupancy and
    * absorption on. The reference constant is 300 ms
    * (KafkaServiceConfiguration.java:270) and the COST columns price
    * exactly that; but the synthetic events stream's per-connection
    * arrival gaps have a 5th percentile above 400 s even at sf0.01, so a
    * 300 ms occupancy/absorption window would be all-ones/all-zeros at
    * every test SF (the delayed_create 1h-purgatory precedent: model
    * windows at data-visible scale, price at reference scale).
    */
  private[graft] val AuthParkWindowMs = 3600000L

  /** failedAuthenticationDelayMs accounting — the delayed close on
    * authentication failure (KafkaRequestHandler.java:478
    * `maybeDelayCloseOnAuthenticationFailure` parks the channel on the
    * event-loop timer for failedAuthenticationDelayMs (default 300,
    * KafkaServiceConfiguration.java:270) before
    * completeCloseOnAuthenticationFailure sends the failure response and
    * closes; tests/DelayAuthorizationFailedCloseTest.java asserts the
    * close lands delayed, not immediate). Universe: [[saslFlow]]'s
    * FAILED connections (same md5 mechanism/auth coins, so the views
    * cannot disagree about who fails); every record of a failing
    * connection is one failed authenticate attempt. Per connection:
    *  - attempts ADMITTED to the authenticator vs ABSORBED — an attempt
    *    arriving while its connection is still parked never reaches
    *    authenticate() (the channel is closing); admission is the
    *    [[AuthParkWindowMs]]-bucket first-arrival, the deterministic
    *    form of the greedy park process;
    *  - the parked-close ledger at the reference's 300 ms per admitted
    *    failure;
    *  - peak concurrent parked connections (occupancy at each park's
    *    start instant, counted across ALL failing connections — the
    *    event-loop timer load the delay concentrates);
    *  - the retry-storm damping vs an undelayed close, where every
    *    attempt would hit the authenticator: damped_pct = share of
    *    attempts the park absorbs.
    *
    * Scale: one scan partial-aggregated to (conn, bucket) — the park
    * frame is |failing conns| x |active windows|, metadata-sized; the
    * occupancy self-join rides adjacent buckets only (bounded fan), and
    * the 32-row connection universe broadcasts into the scan.
    */
  def authFailureDelay(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan, filter-early. The failing-conn set is a pure function of
    // the md5 coins on the 32-conn universe ([[saslDecide]]'s one coin
    // spelling — no data needed), and saslFlow's events-presence condition
    // is enforced by the attempts join itself: parks' conn key is
    // pmod(k, 32) over the SAME events table saslFlow derives its universe
    // from, so a coin-failing conn with no events rows joins to nothing.
    // The static 32-row frame lands as a LOCAL RELATION and
    // broadcast-filters the attempts scan BEFORE the aggregate (lazy it
    // re-pays the scan per consumer job; the tempting
    // aggregate-everything-single-scan shape is SLOWER — 91s vs 37s at
    // 1000x: the partial aggregate then hashes all 32 conns' rows instead
    // of the ~5 failing conns').
    import spark.implicits._
    val fails = saslDecide(
        (0L until 32L).toDF("conn_id")
          .withColumn("conn", concat(lit("conn"), col("conn_id"))))
      .filter(col("auth_outcome") === "SASL_AUTHENTICATION_FAILED")
      .select("conn", "mechanism")
    // The park ledger is |failing conns (≤32)| x |active 1h windows| —
    // metadata-sized at every scale (a year of data is ~9k windows). A
    // localCheckpoint here materialized it distributed and the downstream
    // occupancy self-join + two aggregations then ran as 6+ scheduled
    // jobs of 32-task stages over a handful of rows; collecting the
    // bounded frame (exact longs/strings, the nation_revenue_rollup
    // discipline) makes everything after the one data-sized scan a local
    // plan. Results are bit-identical: same rows, same types.
    val parkRows = LogOps.logBase(spark, dir)
      .select(concat(lit("conn"),
        pmod(col("k").cast("long"), lit(32L))).as("conn"), col("tms"))
      .join(broadcast(fails), "conn")
      .withColumn("bkt", expr(s"tms div $AuthParkWindowMs"))
      .groupBy("conn", "mechanism", "bkt")
      .agg(min("tms").as("park_start"), count(lit(1)).as("n_in_bkt"))
      .collect()
    val parks = parkRows.toSeq.map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .toDF("conn", "mechanism", "bkt", "park_start", "n_in_bkt")
    // The "b parked when a starts" candidate set is b.bkt in {a.bkt-1,
    // a.bkt}; spelled as a range condition Spark can only nested-loop it
    // (quadratic in parks), so EXPAND b to its two reachable buckets and
    // hash-equi-join on the bucket — 2 rows per park, bounded fan.
    val reach = parks
      .select(explode(array(col("bkt"), col("bkt") + 1L)).as("bkt"),
        col("park_start").as("b_start"))
    val occ = parks.as("a")
      .join(reach,
        Seq("bkt"))
      .filter(col("b_start") <= col("park_start") &&
        col("b_start") + AuthParkWindowMs > col("park_start"))
      .groupBy(col("conn"), col("bkt"))
      .agg(count(lit(1)).as("occ"))
    parks.join(occ, Seq("conn", "bkt"))
      .groupBy("conn", "mechanism")
      .agg(
        sum("n_in_bkt").cast("long").as("n_attempts"),
        count(lit(1)).as("n_admitted"),
        max("occ").as("max_concurrent_parked"))
      .withColumn("n_absorbed", col("n_attempts") - col("n_admitted"))
      .withColumn("parked_close_ms", col("n_admitted") * 300L)
      .withColumn("damped_pct",
        expr("(100 * n_absorbed) div n_attempts"))
  }

  /** CreatePartitions decision table — the partition-count increase path
    * (/root/reference/kafka-impl/.../KafkaRequestHandler.java:2910
    * `handleCreatePartitions` -> AdminManager.createPartitionsAsync:312 ->
    * handleUpdatePartitionsAsync). Per requested topic, the reference's
    * check order: an ALTER-unauthorized topic answers
    * TOPIC_AUTHORIZATION_FAILED before any admin work
    * (KafkaRequestHandler.java:2970-2984); then inside the admin path a
    * negative requested count answers INVALID_PARTITIONS
    * (AdminManager.java:343-346 "is negative"), a request carrying manual
    * replica assignments answers INVALID_REQUEST (:349-359 — the broker
    * doesn't support assignment sets), a topic with no partitioned
    * metadata answers UNKNOWN_TOPIC_OR_PARTITION (NotFoundException
    * mapping), and a count BELOW the current one answers
    * INVALID_PARTITIONS ("higher than the requested") — growth and
    * equal-count requests pass through to the metadata update (NONE,
    * `applied_partitions` = requested). `n_entries` = 2 marks topics the
    * request listed twice: the parse loop marks the duplicate
    * INVALID_REQUEST transiently, but the first entry stays in
    * validTopics and `result.putAll(validResult)` OVERWRITES the parse
    * error with the processed outcome (KafkaRequestHandler.java:
    * 2919-2928 vs :2944-2947) — so the final outcome is the processed
    * one, a faithful reference quirk. Requested counts, duplicate /
    * assignment / authorization draws are deterministic md5 coins on the
    * topic (the topicConfigs modeling discipline); two ghost topics
    * exercise the not-found branch. (Pulsar-side name-legality failures
    * are out of scope — the KoPTopicException branch needs Pulsar's
    * validator.)
    *
    * Scale: one (topic, part)-then-topic rollup of the log (the
    * topic_metadata shape), then a |topics|-row decision frame.
    */
  def createPartitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def digit(tag: String) =
      substring(md5(concat_ws("#", lit(tag), col("topic"))), 1, 1)
    def dig(tag: String) = conv(digit(tag), 16, 10).cast("long")
    val existing = topicMetadata(spark, dir)
      .select(col("topic"), col("n_partitions"), lit(1L).as("existed"))
    val ghosts = Seq(("ghost0", 0L, 0L), ("ghost1", 0L, 0L))
      .toDF("topic", "n_partitions", "existed")
    existing.unionByName(ghosts)
      .withColumn("delta", expr(
        "element_at(array(-2L, -1L, 0L, 1L, 2L, 4L), " +
          "CAST(conv(substring(md5(concat_ws('#', 'cpdelta', topic)), 1, 1)," +
          " 16, 10) % 6 + 1 AS INT))"))
      .withColumn("req_partitions",
        when(digit("cpneg").isin("0", "1"), lit(-1L))
          .when(col("existed") === 0L, lit(1L) + pmod(dig("cpdelta"), lit(4L)))
          .otherwise(col("n_partitions") + col("delta")))
      .withColumn("n_entries",
        when(digit("cpdup").isin("0", "1", "2"), 2L).otherwise(1L))
      .withColumn("manual_assignment",
        when(digit("cpasg") === "0", 1L).otherwise(0L))
      .withColumn("authorized",
        when(digit("cpauth").isin("0", "1"), 0L).otherwise(1L))
      .withColumn("outcome",
        when(col("authorized") === 0L, "TOPIC_AUTHORIZATION_FAILED")
          .when(col("req_partitions") < 0L, "INVALID_PARTITIONS")
          .when(col("manual_assignment") === 1L, "INVALID_REQUEST")
          .when(col("existed") === 0L, "UNKNOWN_TOPIC_OR_PARTITION")
          .when(col("n_partitions") > col("req_partitions"),
            "INVALID_PARTITIONS")
          .otherwise("NONE"))
      .select(
        col("topic"), col("n_partitions").as("old_partitions"),
        col("req_partitions"), col("n_entries"), col("manual_assignment"),
        col("authorized"), col("outcome"),
        when(col("outcome") === "NONE", col("req_partitions"))
          .otherwise(col("n_partitions")).as("applied_partitions"))
  }

  /** CreateTopics decision table — the creation path next to
    * [[delayedCreate]]'s purgatory timing
    * (/root/reference/kafka-impl/.../KafkaRequestHandler.java:2188
    * `handleCreateTopics` -> AdminManager.createTopicsAsync:105-180). Per
    * requested topic in the reference's order: CREATE-unauthorized
    * topics answer TOPIC_AUTHORIZATION_FAILED before the admin path
    * (KafkaRequestHandler.java:2250-2266); a NO_NUM_PARTITIONS sentinel
    * (-1) falls back to the broker default (AdminManager.java:128-130,
    * Pulsar ServiceConfiguration#defaultNumPartitions = 1); a negative
    * explicit count answers INVALID_REQUEST — note the asymmetry with
    * [[createPartitions]], which maps the same check to
    * INVALID_PARTITIONS (InvalidRequestException at AdminManager.java:
    * 132-135 vs InvalidPartitionsException at :343-346); an existing
    * partitioned topic answers TOPIC_ALREADY_EXISTS (the
    * ConflictException mapping, :168-170); else NONE and the topic is
    * created at the effective count. `n_entries` = 2 marks the same
    * duplicate-entry parse quirk as create_partitions (the transient
    * INVALID_REQUEST is overwritten by the processed outcome,
    * KafkaRequestHandler.java:2196-2204 vs :2219-2222).
    *
    * Scale: the request universe is existing topics + a fixed fresh-name
    * frame; one topic-distinct rollup of the log, then |topics|-row
    * decisions.
    */
  def createTopics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def digit(tag: String) =
      substring(md5(concat_ws("#", lit(tag), col("topic"))), 1, 1)
    def dig(tag: String) = conv(digit(tag), 16, 10).cast("long")
    val existing = LogOps.logBase(spark, dir).select("topic").distinct()
      .withColumn("existed", lit(1L))
    val fresh = (0 until 8).map(i => (s"newtopic$i", 0L))
      .toDF("topic", "existed")
    existing.unionByName(fresh)
      .withColumn("req_partitions",
        when(digit("ctdefault").isin("0", "1", "2", "3"), lit(-1L))
          .when(digit("ctneg3") === "0", lit(-3L))
          .otherwise(lit(1L) + pmod(dig("ctnum"), lit(6L))))
      .withColumn("effective_partitions",
        when(col("req_partitions") === -1L, lit(1L))
          .otherwise(col("req_partitions")))
      .withColumn("n_entries",
        when(digit("ctdup").isin("0", "1", "2"), 2L).otherwise(1L))
      .withColumn("authorized",
        when(digit("ctauth").isin("0", "1"), 0L).otherwise(1L))
      .withColumn("outcome",
        when(col("authorized") === 0L, "TOPIC_AUTHORIZATION_FAILED")
          .when(col("effective_partitions") < 0L, "INVALID_REQUEST")
          .when(col("existed") === 1L, "TOPIC_ALREADY_EXISTS")
          .otherwise("NONE"))
      .select(
        col("topic"), col("existed"), col("req_partitions"),
        col("effective_partitions"), col("n_entries"), col("authorized"),
        col("outcome"),
        when(col("outcome") === "NONE", col("effective_partitions"))
          .otherwise(0L).as("created_partitions"))
  }

  /** The broker's default log-config surface
    * (/root/reference/kafka-impl/.../KafkaLogConfig.java:34-59 — the
    * LogConfig port DescribeConfigs answers from; cleanup.policy defaults
    * to "compact" there, KafkaLogConfig.java:49-51). One (key, default)
    * row per config the views below consume.
    */
  private val configDefaults = Seq(
    ("retention.ms", "604800000"),
    ("retention.bytes", "-1"),
    ("segment.bytes", "1073741824"),
    ("segment.ms", "604800000"),
    ("cleanup.policy", "compact"),
    ("min.insync.replicas", "1"),
    ("max.message.bytes", "1000012"),
    ("min.cleanable.dirty.ratio", "0.5"))

  /** DescribeConfigs for every topic
    * (/root/reference/kafka-impl/.../KafkaRequestHandler.java:2300
    * `handleDescribeConfigs` -> AdminManager.describeConfigsAsync, answering
    * from the KafkaLogConfig defaults): per (topic, config key) the
    * effective value with override provenance — Kafka's ConfigSource
    * vocabulary (DYNAMIC_TOPIC_CONFIG for a per-topic override,
    * STATIC_BROKER_CONFIG for the broker default). Which topics override
    * which keys is a deterministic md5 coin on (topic, key) — the same
    * engine-portable modeling discipline as Groups.protocolSelect — and the
    * override VALUE derives from the next hash digit, so the whole config
    * universe is reproducible from the topic list alone.
    *
    * Scale: one distinct on topic (partial-aggregated) cross a broadcast
    * 8-row key frame; everything downstream is metadata-sized.
    */
  def topicConfigs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val defaults = broadcast(configDefaults.toDF("config_key", "default_value"))
    val h = md5(concat_ws("#", lit("cfg"), col("topic"), col("config_key")))
    LogOps.logBase(spark, dir).select("topic").distinct()
      .crossJoin(defaults)
      .withColumn("coin", substring(h, 1, 1))
      .withColumn("d", conv(substring(h, 2, 1), 16, 10).cast("long"))
      .withColumn("override_value",
        when(!col("coin").isin("0", "1", "2", "3"), lit(null).cast("string"))
          .otherwise(
            when(col("config_key") === "retention.ms",
              ((col("d") + 1L) * 86400000L).cast("string"))
            .when(col("config_key") === "retention.bytes",
              ((col("d") + 1L) * 1073741824L).cast("string"))
            .when(col("config_key") === "segment.bytes",
              ((col("d") + 1L) * 67108864L).cast("string"))
            .when(col("config_key") === "segment.ms",
              ((col("d") + 1L) * 3600000L).cast("string"))
            .when(col("config_key") === "cleanup.policy",
              when(col("d") < 8L, "delete").otherwise("compact,delete"))
            .when(col("config_key") === "min.insync.replicas",
              (pmod(col("d"), lit(3L)) + 1L).cast("string"))
            .when(col("config_key") === "max.message.bytes",
              ((col("d") + 1L) * 131072L).cast("string"))
            .otherwise(concat(lit("0."),
              (pmod(col("d"), lit(9L)) + 1L).cast("string")))))
      .withColumn("effective_value",
        coalesce(col("override_value"), col("default_value")))
      .withColumn("source",
        when(col("override_value").isNotNull, "DYNAMIC_TOPIC_CONFIG")
          .otherwise("STATIC_BROKER_CONFIG"))
      .select("topic", "config_key", "default_value", "override_value",
        "effective_value", "source")
  }

  /** AlterConfigs impact view
    * (/root/reference/kafka-impl/.../KafkaRequestHandler.java:2272
    * `handleAlterConfigs` — the reference acks each (resource, key, value)
    * entry; the validation ranges mirror the LogConfig surface its
    * defaults come from, KafkaLogConfig.java:34-59): the WRITE half of
    * [[topicConfigs]]. Half the (topic, config key) surface submits a
    * proposed value (md5 coin on ("alter", topic, key), the same
    * deterministic universe discipline), drawn from a spread that
    * deliberately straddles the key's valid range — retention.ms must be
    * positive, retention.bytes >= -1, segment.bytes >= 14, segment.ms
    * >= 1, cleanup.policy one of the three policy spellings,
    * min.insync.replicas >= 1, max.message.bytes >= 0, the dirty ratio
    * in [0, 1] — so both outcomes (OK / INVALID_CONFIG) stay populated
    * at every SF. An accepted proposal becomes the new effective value; a
    * rejected one leaves the old value standing. For retention.ms the
    * view also reports the cutoff shift (old - new retention) a consumer
    * of [[retentionByConfig]] would observe after the change — positive
    * means the cutoff moves later and data expires.
    *
    * Scale: built on the topic_configs frame (topic-cardinality x 8
    * keys); everything added is in-row md5 arithmetic — no new shuffle.
    */
  def alterConfigs(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat_ws("#", lit("alter"), col("topic"), col("config_key")))
    topicConfigs(spark, dir)
      .withColumn("acoin", substring(h, 1, 1))
      .withColumn("ad", conv(substring(h, 2, 1), 16, 10).cast("long"))
      .filter(col("acoin").isin("0", "1", "2", "3", "4", "5", "6", "7"))
      .withColumn("proposed_value",
        when(col("config_key") === "retention.ms",
          ((col("ad") - 2L) * 43200000L).cast("string"))
        .when(col("config_key") === "retention.bytes",
          ((col("ad") - 1L) * 536870912L).cast("string"))
        .when(col("config_key") === "segment.bytes",
          ((col("ad") - 1L) * 33554432L).cast("string"))
        .when(col("config_key") === "segment.ms",
          ((col("ad") - 1L) * 1800000L).cast("string"))
        .when(col("config_key") === "cleanup.policy",
          when(col("ad") < 5L, "delete").when(col("ad") < 10L, "compact")
            .when(col("ad") < 13L, "compact,delete").otherwise("purge"))
        .when(col("config_key") === "min.insync.replicas",
          pmod(col("ad"), lit(5L)).cast("string"))
        .when(col("config_key") === "max.message.bytes",
          ((col("ad") - 1L) * 262144L).cast("string"))
        .otherwise(
          when(col("ad") < 10L, concat(lit("0."), col("ad").cast("string")))
            .otherwise(concat(lit("1."), (col("ad") - 10L).cast("string")))))
      .withColumn("valid",
        when(col("config_key") === "retention.ms",
          col("proposed_value").cast("long") > 0L)
        .when(col("config_key") === "retention.bytes",
          col("proposed_value").cast("long") >= -1L)
        .when(col("config_key") === "segment.bytes",
          col("proposed_value").cast("long") >= 14L)
        .when(col("config_key") === "segment.ms",
          col("proposed_value").cast("long") >= 1L)
        .when(col("config_key") === "cleanup.policy",
          col("proposed_value").isin("delete", "compact", "compact,delete"))
        .when(col("config_key") === "min.insync.replicas",
          col("proposed_value").cast("long") >= 1L)
        .when(col("config_key") === "max.message.bytes",
          col("proposed_value").cast("long") >= 0L)
        .otherwise(col("proposed_value").cast("double") <= 1.0d))
      .withColumn("outcome",
        when(col("valid"), "OK").otherwise("INVALID_CONFIG"))
      .withColumn("new_effective",
        when(col("valid"), col("proposed_value"))
          .otherwise(col("effective_value")))
      .withColumn("cutoff_shift_ms",
        when(col("config_key") === "retention.ms" && col("valid"),
          col("effective_value").cast("long")
            - col("proposed_value").cast("long"))
          .otherwise(lit(null).cast("long")))
      .select(col("topic"), col("config_key"),
        col("effective_value").as("old_effective"),
        col("proposed_value"), col("outcome"), col("new_effective"),
        col("cutoff_shift_ms"))
  }

  /** Time retention driven by the config view: each topic's cutoff is
    * `now - retention.ms(effective)` — the broker's LogManager reading its
    * policy from the DescribeConfigs surface instead of a constant ([[
    * topicConfigs]] is the producer; "now" is the log's newest timestamp,
    * the deterministic stand-in for wall clock). Reports the surviving
    * range per partition, like LogOps.retention.
    *
    * Scale: the per-topic policy frame is broadcast (topic-cardinality
    * rows); the scan filters map-side and the rollup partial-aggregates on
    * the log's own (topic, part) key — no new wide exchange.
    */
  def retentionByConfig(spark: SparkSession, dir: String): DataFrame = {
    val policy = topicConfigs(spark, dir)
      .filter(col("config_key") === "retention.ms")
      .select(col("topic"),
        col("effective_value").cast("long").as("retention_ms"))
    val nowF = LogOps.logBase(spark, dir).agg(max("tms").as("now_ms"))
    LogOps.log(spark, dir)
      .join(broadcast(policy), Seq("topic"))
      .crossJoin(broadcast(nowF))
      .filter(col("tms") >= col("now_ms") - col("retention_ms"))
      .groupBy("topic", "part", "retention_ms")
      .agg(
        count(lit(1)).as("n_survive"),
        min("offs").as("new_earliest"),
        sum(length(col("v")) + length(col("k"))).cast("long")
          .as("bytes_survive"))
  }

  /** ACL authorization audit — the decision table the reference's
    * SimpleAclAuthorizer resolves per request
    * (security/auth/SimpleAclAuthorizer.java:52 authorize,
    * :64 authorizeTopicPermission, :113 authoriseTopicOverNamespacePolicies):
    * super-user / tenant-admin short-circuits, then namespace-level role
    * grants, then topic-level role grants, else deny. Principals, grants
    * and admin bits form a deterministic md5-coin universe (the
    * topic_configs discipline); requests are the distinct (topic, role,
    * action) combinations the event stream implies, with request counts.
    *
    * Scale: one partial-aggregated shuffle on (topic, role, action); every
    * decision is in-row md5 arithmetic on the metadata-sized rollup — no
    * grant table is ever materialized or joined.
    */
  def aclCheck(spark: SparkSession, dir: String): DataFrame = {
    def coin(parts: org.apache.spark.sql.Column*) =
      substring(md5(concat_ws("#", parts: _*)), 1, 1)
    graft.Tables.t(spark, dir, "events")
      .select(col("event_type").as("topic"),
        concat(lit("role"), pmod(col("user_id"), lit(8L))).as("role"),
        when(pmod(col("event_id"), lit(2L)) === 0, "produce")
          .otherwise("consume").as("action"))
      .groupBy("topic", "role", "action")
      .agg(count(lit(1)).as("n_requests"))
      .withColumn("ns", concat(lit("ns"), pmod(
        conv(coin(lit("ns"), col("topic")), 16, 10).cast("long"), lit(2L))))
      .withColumn("is_super", coin(lit("super"), col("role")).isin("0", "1"))
      .withColumn("is_admin",
        coin(lit("admin"), col("ns"), col("role")).isin("0", "1"))
      .withColumn("ns_grant",
        coin(lit("nsgrant"), col("ns"), col("role"), col("action"))
          .isin("0", "1", "2", "3"))
      .withColumn("t_grant",
        coin(lit("tgrant"), col("topic"), col("role"), col("action"))
          .isin("0", "1", "2"))
      .withColumn("via",
        when(col("is_super") || col("is_admin"), "SUPER")
          .when(col("ns_grant"), "NAMESPACE")
          .when(col("t_grant"), "TOPIC")
          .otherwise("-"))
      .withColumn("decision",
        when(col("via") =!= "-", "ALLOW").otherwise("DENY"))
      .select("topic", "ns", "role", "action", "n_requests", "decision", "via")
  }

  /** The ACL view's first consumer (the retention_by_config mold): the
    * fetch surface per consumer role — every topic the role's consume
    * requests touched, gated by [[aclCheck]]'s decision; per role how
    * many topics and bytes it may actually fetch vs what it asked for,
    * plus the denied request volume an auditor alerts on. Both inputs
    * are metadata-sized rollups of data-sized scans; the topic-stats
    * side broadcasts into the 40-row ACL frame.
    */
  def fetchAuthorized(spark: SparkSession, dir: String): DataFrame = {
    val consume = aclCheck(spark, dir).filter(col("action") === "consume")
    val meta = topicMetadata(spark, dir)
      .select("topic", "n_records", "approx_bytes")
    consume.join(broadcast(meta), "topic")
      .groupBy("role")
      .agg(count(lit(1)).as("n_topics_asked"),
        sum(when(col("decision") === "ALLOW", 1L).otherwise(0L)).cast("long")
          .as("n_topics_allowed"),
        sum(when(col("decision") === "ALLOW", col("n_records")).otherwise(0L))
          .cast("long").as("fetchable_records"),
        sum(when(col("decision") === "ALLOW", col("approx_bytes")).otherwise(0L))
          .cast("long").as("fetchable_bytes"),
        sum(when(col("decision") === "DENY", col("n_requests")).otherwise(0L))
          .cast("long").as("denied_requests"))
  }

  /** The broker's advertised version range per API, one row per ApiKeys
    * entry (KafkaRequestHandler.java:508 overloadDefaultApiVersionsResponse
    * walks ApiKeys.values() at (oldestVersion, latestVersion);
    * ApiVersion.java carries the triple; LIST_OFFSETS' min is forced to 0
    * so librdkafka's v0 probes keep working,
    * KafkaRequestHandler.java:516-519). Ids and latest versions follow the
    * public Kafka protocol tables; the handful of non-zero mins (FETCH,
    * OFFSET_COMMIT, FIND_COORDINATOR, JOIN_GROUP, CREATE_TOPICS) are a
    * MODELING choice in delayed_create's spirit — with every min at 0 the
    * UNSUPPORTED_VERSION branch would be dead code at every SF.
    */
  private[graft] val apiRanges: Seq[(Long, Long, String, Long, Long)] = Seq(
    (0L, 0L, "PRODUCE", 0L, 9L),
    (1L, 1L, "FETCH", 4L, 13L),
    (2L, 2L, "LIST_OFFSETS", 0L, 7L),
    (3L, 3L, "METADATA", 0L, 12L),
    (4L, 8L, "OFFSET_COMMIT", 2L, 8L),
    (5L, 9L, "OFFSET_FETCH", 0L, 8L),
    (6L, 10L, "FIND_COORDINATOR", 1L, 4L),
    (7L, 11L, "JOIN_GROUP", 2L, 9L),
    (8L, 12L, "HEARTBEAT", 0L, 4L),
    (9L, 13L, "LEAVE_GROUP", 0L, 5L),
    (10L, 14L, "SYNC_GROUP", 0L, 5L),
    (11L, 15L, "DESCRIBE_GROUPS", 0L, 5L),
    (12L, 16L, "LIST_GROUPS", 0L, 4L),
    (13L, 17L, "SASL_HANDSHAKE", 0L, 1L),
    (14L, 18L, "API_VERSIONS", 0L, 3L),
    (15L, 19L, "CREATE_TOPICS", 2L, 7L),
    (16L, 20L, "DELETE_TOPICS", 0L, 6L),
    (17L, 21L, "DELETE_RECORDS", 0L, 2L),
    (18L, 22L, "INIT_PRODUCER_ID", 0L, 4L),
    (19L, 24L, "ADD_PARTITIONS_TO_TXN", 0L, 3L),
    (20L, 25L, "ADD_OFFSETS_TO_TXN", 0L, 3L),
    (21L, 26L, "END_TXN", 0L, 3L),
    (22L, 28L, "TXN_OFFSET_COMMIT", 0L, 3L),
    (23L, 32L, "DESCRIBE_CONFIGS", 0L, 4L),
    (24L, 33L, "ALTER_CONFIGS", 0L, 2L),
    (25L, 36L, "SASL_AUTHENTICATE", 0L, 2L))

  /** ApiVersions negotiation audit (KafkaRequestHandler.java:496
    * handleApiVersionsRequest): every client advertises the highest
    * version it can speak per API (md5 draw in [0, broker_max+3]); a
    * client that saw the ApiVersions response sends
    * least(client_max, broker_max), which the broker accepts unless the
    * client's ceiling sits BELOW the broker's floor — the
    * UNSUPPORTED_VERSION path of KafkaCommandDecoder/the handshake's
    * hasUnsupportedRequestVersion. Per (client, api): the advertised
    * range, the client ceiling, the version actually used (null when
    * unsupported), the outcome, and the request volume riding on it.
    *
    * Scale: one partial-aggregated events scan to <=16 clients x 26 apis,
    * then a broadcast join against the 26-row literal range table and
    * in-row draws — no data-sized shuffle beyond the rollup.
    */
  def apiVersions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val apis = broadcast(apiRanges.toDF(
      "api_idx", "api_key", "api_name", "broker_min", "broker_max"))
    graft.Tables.t(spark, dir, "events")
      .select(
        concat(lit("client"), pmod(col("user_id"), lit(16L))).as("client"),
        pmod(col("event_id"), lit(26L)).as("api_idx"))
      .groupBy("client", "api_idx")
      .agg(count(lit(1)).as("n_requests"))
      .join(apis, "api_idx")
      .withColumn("client_max", pmod(
        graft.functions.Parity.md5Long(
          concat_ws("#", lit("ver"), col("client"), col("api_name"))),
        col("broker_max") + lit(4L)))
      .withColumn("outcome",
        when(col("client_max") < col("broker_min"), "UNSUPPORTED_VERSION")
          .otherwise("OK"))
      .withColumn("used_version",
        when(col("outcome") === "OK",
          least(col("client_max"), col("broker_max"))).cast("long"))
      .select(col("client"), col("api_key"), col("api_name"),
        col("broker_min"), col("broker_max"), col("client_max"),
        col("used_version"), col("outcome"), col("n_requests"))
  }

  /** SASL handshake + authenticate audit (security/SaslAuthenticator.java:
    * the HANDSHAKE_OR_VERSIONS_REQUEST -> HANDSHAKE_REQUEST ->
    * AUTHENTICATE -> COMPLETE state machine at :95-100; createSaslServer
    * at :302-314 accepts only PLAIN and OAUTHBEARER and throws
    * UnsupportedSaslMechanismException otherwise; handleHandshakeRequest
    * at :584-628 answers UNSUPPORTED_SASL_MECHANISM with the allowed
    * list; PlainSaslServer / KopOAuthBearerSaslServer then accept or fail
    * the credentials). One row per connection: the mechanism the client
    * chose (md5 draw weighted toward PLAIN), the handshake outcome, the
    * authenticate outcome (bad password / expired token draws), the final
    * state, and — on COMPLETE — the authenticated principal, which is
    * exactly the role universe [[aclCheck]] authorizes, so the two views
    * compose into an end-to-end authn+authz audit.
    *
    * Scale: one partial-aggregated events scan to 32 connection rows,
    * every decision an in-row hash draw — nothing data-sized after the
    * rollup.
    */
  /** The SASL mechanism/auth decision columns appended to any frame
    * carrying a `conn` column — the ONE spelling of the md5 coins,
    * shared by [[saslFlow]] and [[authFailureDelay]] so the two views
    * cannot disagree about which connections fail.
    */
  private def saslDecide(df: DataFrame): DataFrame = {
    def coin(parts: org.apache.spark.sql.Column*) =
      substring(md5(concat_ws("#", parts: _*)), 1, 1)
    df
      .withColumn("mech_coin", coin(lit("mech"), col("conn")))
      .withColumn("mechanism",
        when(col("mech_coin").isin("0", "1", "2", "3", "4", "5", "6"),
          "PLAIN")
          .when(col("mech_coin").isin("7", "8", "9", "a", "b"),
            "OAUTHBEARER")
          .when(col("mech_coin").isin("c", "d"), "SCRAM-SHA-256")
          .otherwise("GSSAPI"))
      .withColumn("handshake_outcome",
        when(col("mechanism").isin("PLAIN", "OAUTHBEARER"), "NONE")
          .otherwise("UNSUPPORTED_SASL_MECHANISM"))
      .withColumn("auth_coin", coin(lit("auth"), col("conn"),
        col("mechanism")))
      .withColumn("auth_outcome",
        when(col("handshake_outcome") =!= "NONE", lit(null).cast("string"))
          .when(col("mechanism") === "PLAIN" && col("auth_coin") === "0",
            "SASL_AUTHENTICATION_FAILED")
          .when(col("mechanism") === "OAUTHBEARER" &&
            col("auth_coin").isin("0", "1"), "SASL_AUTHENTICATION_FAILED")
          .otherwise("NONE"))
  }

  def saslFlow(spark: SparkSession, dir: String): DataFrame = {
    saslDecide(graft.Tables.t(spark, dir, "events")
      .select(pmod(col("user_id"), lit(32L)).as("conn_id"))
      .groupBy("conn_id")
      .agg(count(lit(1)).as("n_requests"))
      .withColumn("conn", concat(lit("conn"), col("conn_id"))))
      .withColumn("final_state",
        when(col("auth_outcome") === "NONE", "COMPLETE").otherwise("FAILED"))
      .withColumn("principal",
        when(col("final_state") === "COMPLETE",
          concat(lit("role"), pmod(col("conn_id"), lit(8L)))))
      .select(col("conn"), col("mechanism"), col("handshake_outcome"),
        col("auth_outcome"), col("final_state"), col("principal"),
        col("n_requests"))
  }

  /** OAuth bearer-token validation for the OAUTHBEARER connections of
    * [[saslFlow]] (same mechanism coin, so the two views agree on which
    * connections carry tokens): the raw token's tenant split —
    * OAuthTokenDecoder.decode (/root/reference/kafka-impl/.../security/
    * oauth/OAuthTokenDecoder.java:29: `tenant + "__with_tenant_" + token`,
    * tenant null when the delimiter is absent) — then the unsecured-JWS
    * claim checks of KopOAuthBearerUnsecuredValidatorCallbackHandler
    * (:127-134, in validator order): principal claim existence, then
    * expiration against the validation instant with the allowable clock
    * skew. Token issue time is the connection's first event, validation
    * happens at its last event, and lifetime/claim presence are md5
    * coins — so short-lived tokens on long-lived connections EXPIRE,
    * which is the operational signal this view exists for.
    *
    * Scale: one partial-aggregated pass to the 32-row connection frame;
    * every coin and claim check is in-row arithmetic there.
    */
  def tokenValidation(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    def coin(parts: org.apache.spark.sql.Column*) =
      substring(md5(concat_ws("#", parts: _*)), 1, 1)
    graft.Tables.t(spark, dir, "events")
      .select(pmod(col("user_id"), lit(32L)).as("conn_id"),
        expr("ts div 1000000").as("tms"))
      .groupBy("conn_id")
      .agg(min("tms").as("iat_ms"), max("tms").as("validated_at_ms"))
      .withColumn("conn", concat(lit("conn"), col("conn_id")))
      .withColumn("mech_coin", coin(lit("mech"), col("conn")))
      .filter(col("mech_coin").isin("7", "8", "9", "a", "b")) // OAUTHBEARER
      .withColumn("tenant",
        when(pmod(md5Long(concat(lit("tok#"), col("conn"))), lit(2L))
          === 1L,
          concat(lit("t"), pmod(md5Long(concat(lit("tenant#tok#"),
            col("conn"))), lit(3L)).cast("string"))))
      .withColumn("sub_present",
        pmod(md5Long(concat(lit("sub#"), col("conn"))), lit(8L)) =!= 0L)
      .withColumn("lifetime_ms",
        element_at(array(lit(300000L), lit(900000L), lit(3600000L),
          lit(86400000L)),
          (pmod(md5Long(concat(lit("exp#"), col("conn"))), lit(4L)) + 1L)
            .cast("int")))
      .withColumn("exp_ms", col("iat_ms") + col("lifetime_ms"))
      .withColumn("outcome",
        when(!col("sub_present"), "INVALID_CLAIM")
          .when(col("exp_ms") + lit(30000L) <= col("validated_at_ms"),
            "EXPIRED")
          .otherwise("VALID"))
      .withColumn("principal",
        when(col("sub_present"),
          concat(lit("role"), pmod(col("conn_id"), lit(8L)))))
      .select(col("conn"), col("tenant"), col("principal"), col("iat_ms"),
        col("exp_ms"), col("validated_at_ms"), col("outcome"))
  }

  /** Idle-connection reaping audit (KafkaChannelInitializer.java:116-121
    * installs an IdleStateHandler at connectionMaxIdleMs on every channel;
    * KafkaCommandDecoder.java:93-105 closes the channel on the idle event;
    * KafkaServiceConfiguration.java:262 defaults the window to 10 min).
    * Clients are the sasl_flow universe (user_id % 32); requests are the
    * client's events at ms grain. Every gap between consecutive request
    * instants exceeding the 1-hour window closes the channel, and the
    * next request opens a NEW connection (Kafka clients reconnect
    * transparently) — so a client's request history splits into idle-close
    * sessions, and the view reports the churn: idle closes paid, the
    * longest session, the widest gap. The modeled window is
    * [[IdleWindowMs]] (1 h), deliberately wider than the reference's
    * 10-min default: the synthetic events are SPARSE per client (median
    * inter-request gap ~574 s at sf0.1), so a 10-min window would close
    * nearly every gap and the session split degenerates to
    * one-session-per-instant — 1 h keeps both STABLE and IDLE_CYCLED
    * populated, which is the behavior the view exists to audit.
    *
    * Scale: one partial-aggregated scan to (client, instant) grain, one
    * lag + running-sum window pair per client, 32-row rollup.
    */

  /** The ONE spelling of the modeled connectionMaxIdleMs window, shared
    * by [[idleConnections]], its oracle SQL, and the pinning spec.
    */
  private[graft] val IdleWindowMs = 3600000L

  def idleConnections(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byConn = Window.partitionBy("conn_id").orderBy("tms")
      .rowsBetween(Window.unboundedPreceding, 0)
    graft.Tables.t(spark, dir, "events")
      .select(pmod(col("user_id"), lit(32L)).as("conn_id"),
        graft.functions.Parity.nsToMs("ts").as("tms"))
      .groupBy("conn_id", "tms")
      .agg(count(lit(1)).as("n_at_tick"))
      .withColumn("gap_ms",
        col("tms") - lag("tms", 1).over(
          Window.partitionBy("conn_id").orderBy("tms")))
      // the closing gap is carried by the FIRST instant of the new
      // session, so per-session MAX(gap_ms) includes it
      .withColumn("sess",
        sum(when(col("gap_ms") > IdleWindowMs, 1L).otherwise(0L))
          .over(byConn))
      .groupBy("conn_id", "sess")
      .agg(sum("n_at_tick").cast("long").as("sess_requests"),
        count(lit(1)).as("sess_instants"),
        (max("tms") - min("tms")).as("sess_span_ms"),
        coalesce(max("gap_ms"), lit(0L)).as("sess_max_gap"))
      .groupBy("conn_id")
      .agg(
        sum("sess_requests").cast("long").as("n_requests"),
        sum("sess_instants").cast("long").as("n_instants"),
        (count(lit(1)) - 1L).as("n_idle_closes"),
        max("sess_max_gap").as("max_gap_ms"),
        max("sess_requests").as("max_session_requests"),
        max("sess_span_ms").as("max_session_span_ms"))
      .select(concat(lit("conn"), col("conn_id")).as("conn"),
        col("n_requests"), col("n_instants"), col("n_idle_closes"),
        when(col("n_idle_closes") === 0L, "STABLE").otherwise("IDLE_CYCLED")
          .as("verdict"),
        col("max_gap_ms"), col("max_session_requests"),
        col("max_session_span_ms"))
  }

  /** Publish-buffer throttle ledger (KafkaRequestHandler.java:835-845
    * startSendOperationForThrottling adds the record size to pendingBytes
    * and pauses the channel — setAutoRead(false) — once it reaches
    * maxPendingBytes; :853-864 completeSendOperationForThrottling
    * subtracts and resumes below the half threshold; :381-382 sets
    * resumeThreshold = maxPendingBytes / 2). Declarative re-expression:
    * per connection the broker drains a 32 KiB budget per send slot in
    * arrival order, so the pending ledger is the classic
    * backlog = (S_k - B*k) - min over prefixes (Lindley's recursion
    * solved as a prefix-sum minus running-min — two windows, no
    * sequential fold). Record sizes are an md5 draw over
    * {256, 4 KiB, 32 KiB, 256 KiB} (the codec-draw universe); pause at
    * pending >= 256 KiB, resume below 128 KiB, with the hysteresis
    * carried by a last-non-null window over the H/L classifications.
    *
    * Scale: one scan, all state from windows over (conn, arrival order) —
    * the same one sort per connection serves the sum, rank, min, and
    * both state windows; 32-row rollup.
    */
  def publishBufferThrottle(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    import org.apache.spark.sql.expressions.Window
    val byConn = Window.partitionBy("conn_id").orderBy("tms", "event_id")
    val run = byConn.rowsBetween(Window.unboundedPreceding, 0)
    val prior = byConn.rowsBetween(Window.unboundedPreceding, -1)
    graft.Tables.t(spark, dir, "events")
      .select(col("event_id"),
        pmod(col("user_id"), lit(32L)).as("conn_id"),
        graft.functions.Parity.nsToMs("ts").as("tms"))
      .withColumn("sz_coin",
        pmod(md5Long(concat(lit("psize#"), col("event_id"))), lit(16L)))
      .withColumn("rec_bytes",
        when(col("sz_coin") <= 9L, 256L)
          .when(col("sz_coin") <= 12L, 4096L)
          .when(col("sz_coin") <= 14L, 32768L)
          .otherwise(262144L))
      .withColumn("rn", row_number().over(byConn).cast("long"))
      .withColumn("x", sum("rec_bytes").over(run) - lit(32768L) * col("rn"))
      .withColumn("pending", col("x") - least(lit(0L), min("x").over(run)))
      .withColumn("cls",
        when(col("pending") >= 262144L, 1L)
          .when(col("pending") < 131072L, 0L))
      .withColumn("state_after",
        coalesce(last("cls", ignoreNulls = true).over(run), lit(0L)))
      .withColumn("state_before",
        coalesce(last("cls", ignoreNulls = true).over(prior), lit(0L)))
      .groupBy("conn_id")
      .agg(
        count(lit(1)).as("n_sends"),
        sum("rec_bytes").cast("long").as("total_bytes"),
        max("pending").as("peak_pending"),
        sum(when(col("state_after") === 1L && col("state_before") === 0L,
          1L).otherwise(0L)).cast("long").as("n_pause_episodes"),
        sum(when(col("state_before") === 1L, 1L).otherwise(0L)).cast("long")
          .as("n_sends_while_paused"),
        expr("max_by(state_after, rn)").as("final_cls"))
      .select(concat(lit("conn"), col("conn_id")).as("conn"),
        col("n_sends"), col("total_bytes"), col("peak_pending"),
        col("n_pause_episodes"), col("n_sends_while_paused"),
        when(col("final_cls") === 1L, "PAUSED").otherwise("OPEN")
          .as("final_state"))
  }

  /** Precise per-(topic, second) publish-rate throttle ledger
    * (storage/PartitionLog.java:948-963 checkAndRecordPublishQuota:
    * preciseTopicPublishRateLimiterEnable asks the topic's
    * PublishRateLimiter whether THIS batch's msgs/bytes exceed the
    * per-second rate and disables channel auto-read when it does;
    * tests/MessagePublishThrottlingTest.java sets
    * publishThrottlingRateInByte per topic/namespace and
    * PreciselyMessagePublishThrottlingTest.java pins the exact-pause
    * variant). Record sizes are publish_buffer_throttle's EXACT psize#
    * md5 draw — the two throttle views read the same bytes, so their
    * ledgers cannot disagree. Per topic an md5 coin draws the configured
    * byte rate (2-8 KiB/s) and msg rate (2-8 msg/s); per (topic, second)
    * the ledger reports msgs/bytes vs the rates, and the precise-limiter
    * pause is integer token replenishment: a second that publishes
    * n_bytes pre-pays (n_bytes - 1) div byte_rate FULL extra seconds of
    * budget (0 when within rate), likewise for msgs, and the producer
    * sits paused for the max of the two. The throttle-vs-buffer
    * interaction: bytes over the second's rate wait in the connection's
    * publish buffer while auto-read is off, so any second whose overflow
    * alone reaches publish_buffer_throttle's 128 KiB RESUME threshold
    * holds the channel paused through the buffer's hysteresis window —
    * the buffer cannot resume below half-threshold while the rate
    * limiter is still draining this second's overflow (n_buffer_holds).
    *
    * Scale: one scan partial-aggregated to (topic, second) grain —
    * map-side combinable counts/sums with the in-row size draw — then a
    * |topics|-row rollup; the per-topic config is an in-row md5 coin, no
    * join anywhere.
    */
  def publishRateThrottle(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("event_type").as("topic"),
        graft.functions.Parity.nsToMs("ts").as("tms"))
      .withColumn("sz_coin",
        pmod(md5Long(concat(lit("psize#"), col("event_id"))), lit(16L)))
      .withColumn("rec_bytes",
        when(col("sz_coin") <= 9L, 256L)
          .when(col("sz_coin") <= 12L, 4096L)
          .when(col("sz_coin") <= 14L, 32768L)
          .otherwise(262144L))
      .withColumn("sec", expr("tms div 1000"))
      .groupBy("topic", "sec")
      .agg(count(lit(1)).as("n_msgs"),
        sum("rec_bytes").cast("long").as("n_bytes"))
      .withColumn("byte_rate",
        (pmod(md5Long(concat(lit("brate#"), col("topic"))), lit(4L)) + 1L)
          * 2048L)
      .withColumn("msg_rate",
        (pmod(md5Long(concat(lit("mrate#"), col("topic"))), lit(4L)) + 1L)
          * 2L)
      .withColumn("exceeded",
        when(col("n_bytes") > col("byte_rate") ||
          col("n_msgs") > col("msg_rate"), 1L).otherwise(0L))
      .withColumn("pause_secs",
        greatest(expr("(n_bytes - 1) div byte_rate"),
          expr("(n_msgs - 1) div msg_rate")))
      .withColumn("overflow_bytes",
        greatest(col("n_bytes") - col("byte_rate"), lit(0L)))
      .groupBy("topic", "byte_rate", "msg_rate")
      .agg(
        count(lit(1)).as("n_seconds"),
        sum("n_msgs").cast("long").as("n_msgs"),
        sum("n_bytes").cast("long").as("total_bytes"),
        max("n_bytes").as("peak_sec_bytes"),
        max("n_msgs").as("peak_sec_msgs"),
        sum("exceeded").cast("long").as("n_exceeded_secs"),
        sum("pause_secs").cast("long").as("pause_secs"),
        sum("overflow_bytes").cast("long").as("buffered_bytes"),
        sum(when(col("overflow_bytes") >= 131072L, 1L).otherwise(0L))
          .cast("long").as("n_buffer_holds"))
      .withColumn("verdict",
        when(col("n_exceeded_secs") > 0L, "THROTTLED")
          .otherwise("WITHIN_RATE"))
  }

  /** Inner-topic protection (storage/ReplicaManager.java:169 rejects a
    * client append when KopTopic.isInternalTopic — utils/KopTopic.java:125:
    * the topic lives in the metadata namespace AND its local name is
    * __consumer_offsets or __transaction_state; coordinator writes pass
    * because internalTopicsAllowed=true on that path; producing to the
    * Pulsar system topic __change_events fails as an invalid topic too,
    * while SAME-NAMED topics in a user namespace are ordinary topics —
    * tests/InnerTopicProtectionTest.java:116-136 pins all six shapes).
    * Each event is a produce attempt: an md5 coin redirects a slice onto
    * the six test shapes, a second coin marks the coordinator's own
    * writes to the metadata-namespace internals.
    *
    * Scale: one scan with in-row coins, partial-aggregated to the
    * ~15-row (namespace, topic, origin) decision table.
    */
  def innerTopicProtection(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.md5Long
    graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("coin",
        pmod(md5Long(concat(lit("inner#"), col("event_id"))), lit(64L)))
      .withColumn("ns",
        when(col("coin").isin(56L, 57L, 58L, 59L), "__kafka")
          .otherwise("default"))
      .withColumn("topic",
        when(col("coin").isin(56L, 57L, 61L), "__consumer_offsets")
          .when(col("coin").isin(58L, 59L, 62L), "__transaction_state")
          .when(col("coin") === 60L, "__change_events")
          .otherwise(col("event_type")))
      .withColumn("origin",
        when(col("ns") === "__kafka" &&
          pmod(md5Long(concat(lit("origin#"), col("event_id"))), lit(4L))
            === 0L, "COORDINATOR")
          .otherwise("CLIENT"))
      .withColumn("internal",
        (col("ns") === "__kafka" &&
          col("topic").isin("__consumer_offsets", "__transaction_state"))
          .cast("long"))
      .withColumn("verdict",
        when(col("internal") === 1L && col("origin") === "CLIENT",
          "INVALID_TOPIC")
          .when(col("topic") === "__change_events", "INVALID_TOPIC")
          .otherwise("ALLOWED"))
      .groupBy("ns", "topic", "origin", "internal", "verdict")
      .agg(count(lit(1)).as("n_attempts"))
      .withColumn("n_rejected",
        when(col("verdict") === "INVALID_TOPIC", col("n_attempts"))
          .otherwise(0L))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "acl_check" -> aclCheck,
    "idle_connections" -> idleConnections,
    "publish_buffer_throttle" -> publishBufferThrottle,
    "publish_rate_throttle" -> publishRateThrottle,
    "nonpartitioned_topics" -> nonpartitionedTopics,
    "inner_topic_protection" -> innerTopicProtection,
    "api_versions" -> apiVersions,
    "sasl_flow" -> saslFlow,
    "fetch_authorized" -> fetchAuthorized,
    "topic_configs" -> topicConfigs,
    "alter_configs" -> alterConfigs,
    "retention_by_config" -> retentionByConfig,
    "delete_topics" -> deleteTopics,
    "topic_delete_invalidation" -> topicDeleteInvalidation,
    "auth_failure_delay" -> authFailureDelay,
    "create_partitions" -> createPartitions,
    "create_topics" -> createTopics,
    "migration_status" -> migrationStatus,
    "delayed_create" -> delayedCreate,
    "topic_metadata" -> topicMetadata,
    "list_groups" -> listGroups,
    "cluster_summary" -> clusterSummary,
    "repartition_map" -> repartitionMap,
    "migration_requests" -> migrationRequests,
    "tenant_summary" -> tenantSummary,
    "kop_event_queue" -> kopEventQueue,
    "advertised_listeners" -> advertisedListeners,
    "metadata_topics" -> metadataTopics,
    "token_validation" -> tokenValidation,
    "topic_name_map" -> topicNameMap)

  private val L = LogOps.logSqlCte

  // One source of truth for the commit-log model: Groups owns the SQL.
  private val commitsSql: String = Groups.commitsSql

  /** The sasl_flow failing-connection universe as a CTE chain (no WITH;
    * ends with `fails(conn, mechanism)`) — the same md5 mechanism/auth
    * coins as the sasl_flow oracle, shared so auth_failure_delay cannot
    * disagree with it about who fails.
    */
  private val saslFailsSql: String =
    """flc AS (
      |  SELECT DISTINCT user_id % 32 AS conn_id FROM events),
      |flm AS (
      |  SELECT conn_id, 'conn' || conn_id AS conn,
      |    substring(md5(concat_ws('#', 'mech', 'conn' || conn_id)), 1, 1)
      |      AS mech_coin
      |  FROM flc),
      |flmm AS (
      |  SELECT *,
      |    CASE WHEN mech_coin IN ('0','1','2','3','4','5','6')
      |      THEN 'PLAIN'
      |    WHEN mech_coin IN ('7','8','9','a','b') THEN 'OAUTHBEARER'
      |    WHEN mech_coin IN ('c','d') THEN 'SCRAM-SHA-256'
      |    ELSE 'GSSAPI' END AS mechanism
      |  FROM flm),
      |fla AS (
      |  SELECT *,
      |    substring(md5(concat_ws('#', 'auth', conn, mechanism)), 1, 1)
      |      AS auth_coin
      |  FROM flmm),
      |fails AS (
      |  SELECT conn, mechanism FROM fla
      |  WHERE (mechanism = 'PLAIN' AND auth_coin = '0')
      |     OR (mechanism = 'OAUTHBEARER' AND auth_coin IN ('0', '1')))
      |""".stripMargin

  /** DuckDB mirror of [[topicConfigs]] (continues the log CTE; ends with
    * `cfg(topic, config_key, default_value, override_value,
    * effective_value, source)`).
    */
  private val configsSql: String =
    """cfgu AS (
      |  SELECT * FROM (VALUES
      |    ('retention.ms', '604800000'), ('retention.bytes', '-1'),
      |    ('segment.bytes', '1073741824'), ('segment.ms', '604800000'),
      |    ('cleanup.policy', 'compact'), ('min.insync.replicas', '1'),
      |    ('max.message.bytes', '1000012'),
      |    ('min.cleanable.dirty.ratio', '0.5'))
      |    c(config_key, default_value)),
      |cfg0 AS (
      |  SELECT topic, config_key, default_value,
      |    substring(md5('cfg#' || topic || '#' || config_key), 1, 1) AS coin,
      |    ('0x' || substring(md5('cfg#' || topic || '#' || config_key), 2, 1))
      |      ::BIGINT AS d
      |  FROM (SELECT DISTINCT topic FROM log) CROSS JOIN cfgu),
      |cfg1 AS (
      |  SELECT topic, config_key, default_value,
      |    CASE WHEN coin NOT IN ('0','1','2','3') THEN NULL
      |      WHEN config_key = 'retention.ms'
      |        THEN CAST((d + 1) * 86400000 AS VARCHAR)
      |      WHEN config_key = 'retention.bytes'
      |        THEN CAST((d + 1) * 1073741824 AS VARCHAR)
      |      WHEN config_key = 'segment.bytes'
      |        THEN CAST((d + 1) * 67108864 AS VARCHAR)
      |      WHEN config_key = 'segment.ms'
      |        THEN CAST((d + 1) * 3600000 AS VARCHAR)
      |      WHEN config_key = 'cleanup.policy'
      |        THEN CASE WHEN d < 8 THEN 'delete' ELSE 'compact,delete' END
      |      WHEN config_key = 'min.insync.replicas'
      |        THEN CAST(d % 3 + 1 AS VARCHAR)
      |      WHEN config_key = 'max.message.bytes'
      |        THEN CAST((d + 1) * 131072 AS VARCHAR)
      |      ELSE '0.' || CAST(d % 9 + 1 AS VARCHAR) END AS override_value
      |  FROM cfg0),
      |cfg AS (
      |  SELECT topic, config_key, default_value, override_value,
      |    COALESCE(override_value, default_value) AS effective_value,
      |    CASE WHEN override_value IS NOT NULL THEN 'DYNAMIC_TOPIC_CONFIG'
      |      ELSE 'STATIC_BROKER_CONFIG' END AS source
      |  FROM cfg1)
      |""".stripMargin

  /** Per-(topic, part) -> per-topic size rollup (the delete_topics `tm`
    * shape; topic_metadata's adds log_end_sum on the same byte
    * accounting — keep the two in sync when the accounting changes).
    */
  private val topicRollupSql: String =
    """(SELECT topic, COUNT(*) AS n_partitions,
      |    CAST(SUM(n) AS BIGINT) AS n_records,
      |    CAST(SUM(bytes) AS BIGINT) AS approx_bytes
      |  FROM (
      |    SELECT topic, part, COUNT(*) AS n,
      |      CAST(SUM(length(v) + length(k)) AS BIGINT) AS bytes
      |    FROM log GROUP BY topic, part)
      |  GROUP BY topic)""".stripMargin

  /** DuckDB mirror of [[aclCheck]] as a WITH-continuation (ends with
    * `acl(topic, ns, role, action, n_requests, decision, via)`); CTE
    * names are a-prefixed so it composes after the log CTE.
    */
  private val aclSql: String =
    """areq AS (
      |  SELECT event_type AS topic,
      |    'role' || (user_id % 8) AS role,
      |    CASE WHEN event_id % 2 = 0 THEN 'produce' ELSE 'consume' END
      |      AS action,
      |    COUNT(*) AS n_requests
      |  FROM events GROUP BY 1, 2, 3),
      |ad AS (
      |  SELECT topic, role, action, n_requests,
      |    'ns' || (CAST('0x' ||
      |      substring(md5(concat_ws('#', 'ns', topic)), 1, 1) AS BIGINT)
      |      % 2) AS ns
      |  FROM areq),
      |ae AS (
      |  SELECT *,
      |    substring(md5(concat_ws('#', 'super', role)), 1, 1)
      |      IN ('0', '1') AS is_super,
      |    substring(md5(concat_ws('#', 'admin', ns, role)), 1, 1)
      |      IN ('0', '1') AS is_admin,
      |    substring(md5(concat_ws('#', 'nsgrant', ns, role, action)), 1, 1)
      |      IN ('0', '1', '2', '3') AS ns_grant,
      |    substring(md5(concat_ws('#', 'tgrant', topic, role, action)), 1, 1)
      |      IN ('0', '1', '2') AS t_grant
      |  FROM ad),
      |acl AS (
      |  SELECT topic, ns, role, action, n_requests,
      |    CASE WHEN is_super OR is_admin OR ns_grant OR t_grant
      |      THEN 'ALLOW' ELSE 'DENY' END AS decision,
      |    CASE WHEN is_super OR is_admin THEN 'SUPER'
      |         WHEN ns_grant THEN 'NAMESPACE'
      |         WHEN t_grant THEN 'TOPIC' ELSE '-' END AS via
      |  FROM ae)
      |""".stripMargin

  /** The ONE spelling of the broker version-range table in SQL — derived
    * from [[apiRanges]] so the Spark literal frame and the oracle can
    * never drift.
    */
  private val apiValuesSql: String = apiRanges
    .map { case (i, k, n, mn, mx) => s"($i, $k, '$n', $mn, $mx)" }
    .mkString(", ")

  val oracles: Map[String, String] = Map(
    "idle_connections" ->
      s"""WITH ticks AS (
        |  SELECT user_id % 32 AS conn_id, epoch_ms(ts) AS tms,
        |    COUNT(*) AS n_at_tick
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT *,
        |    tms - lag(tms) OVER (PARTITION BY conn_id ORDER BY tms)
        |      AS gap_ms
        |  FROM ticks),
        |s AS (
        |  SELECT *,
        |    SUM(CASE WHEN gap_ms > $IdleWindowMs THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY conn_id ORDER BY tms
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM g),
        |per_sess AS (
        |  SELECT conn_id, sess,
        |    CAST(SUM(n_at_tick) AS BIGINT) AS sess_requests,
        |    COUNT(*) AS sess_instants,
        |    MAX(tms) - MIN(tms) AS sess_span_ms,
        |    coalesce(CAST(MAX(gap_ms) AS BIGINT), 0) AS sess_max_gap
        |  FROM s GROUP BY conn_id, sess)
        |SELECT 'conn' || conn_id AS conn,
        |  CAST(SUM(sess_requests) AS BIGINT) AS n_requests,
        |  CAST(SUM(sess_instants) AS BIGINT) AS n_instants,
        |  COUNT(*) - 1 AS n_idle_closes,
        |  CASE WHEN COUNT(*) = 1 THEN 'STABLE'
        |    ELSE 'IDLE_CYCLED' END AS verdict,
        |  CAST(MAX(sess_max_gap) AS BIGINT) AS max_gap_ms,
        |  CAST(MAX(sess_requests) AS BIGINT) AS max_session_requests,
        |  CAST(MAX(sess_span_ms) AS BIGINT) AS max_session_span_ms
        |FROM per_sess GROUP BY conn_id""".stripMargin,
    "publish_buffer_throttle" ->
      (s"""WITH sends AS (
        |  SELECT event_id, user_id % 32 AS conn_id, epoch_ms(ts) AS tms,
        |    ${md5LongSql("('psize#' || event_id)")} % 16 AS sz_coin
        |  FROM events),
        |""".stripMargin +
      """sz AS (
        |  SELECT *, CASE WHEN sz_coin <= 9 THEN 256
        |    WHEN sz_coin <= 12 THEN 4096
        |    WHEN sz_coin <= 14 THEN 32768
        |    ELSE 262144 END AS rec_bytes
        |  FROM sends),
        |led AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER o AS rn,
        |    SUM(rec_bytes) OVER w
        |      - 32768 * ROW_NUMBER() OVER o AS x
        |  FROM sz
        |  WINDOW o AS (PARTITION BY conn_id ORDER BY tms, event_id),
        |    w AS (PARTITION BY conn_id ORDER BY tms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (
        |  SELECT *, x - least(0, MIN(x) OVER w) AS pending
        |  FROM led
        |  WINDOW w AS (PARTITION BY conn_id ORDER BY tms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT *, CASE WHEN pending >= 262144 THEN 1
        |    WHEN pending < 131072 THEN 0 END AS cls
        |  FROM p),
        |st AS (
        |  SELECT *,
        |    coalesce(last_value(cls IGNORE NULLS) OVER w, 0)
        |      AS state_after,
        |    coalesce(last_value(cls IGNORE NULLS) OVER pr, 0)
        |      AS state_before
        |  FROM c
        |  WINDOW w AS (PARTITION BY conn_id ORDER BY tms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    pr AS (PARTITION BY conn_id ORDER BY tms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT 'conn' || conn_id AS conn, COUNT(*) AS n_sends,
        |  CAST(SUM(rec_bytes) AS BIGINT) AS total_bytes,
        |  CAST(MAX(pending) AS BIGINT) AS peak_pending,
        |  CAST(SUM(CASE WHEN state_after = 1 AND state_before = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pause_episodes,
        |  CAST(SUM(CASE WHEN state_before = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_sends_while_paused,
        |  CASE WHEN max_by(state_after, rn) = 1 THEN 'PAUSED'
        |    ELSE 'OPEN' END AS final_state
        |FROM st GROUP BY conn_id""".stripMargin),
    "publish_rate_throttle" ->
      (s"""WITH sends AS (
        |  SELECT event_id, event_type AS topic, epoch_ms(ts) AS tms,
        |    ${md5LongSql("('psize#' || event_id)")} % 16 AS sz_coin
        |  FROM events),
        |""".stripMargin +
      s"""sz AS (
        |  SELECT *, CASE WHEN sz_coin <= 9 THEN 256
        |    WHEN sz_coin <= 12 THEN 4096
        |    WHEN sz_coin <= 14 THEN 32768
        |    ELSE 262144 END AS rec_bytes
        |  FROM sends),
        |per_sec AS (
        |  SELECT topic, tms // 1000 AS sec, COUNT(*) AS n_msgs,
        |    CAST(SUM(rec_bytes) AS BIGINT) AS n_bytes
        |  FROM sz GROUP BY 1, 2),
        |cfg AS (
        |  SELECT *,
        |    (${md5LongSql("('brate#' || topic)")} % 4 + 1) * 2048
        |      AS byte_rate,
        |    (${md5LongSql("('mrate#' || topic)")} % 4 + 1) * 2
        |      AS msg_rate
        |  FROM per_sec),
        |led AS (
        |  SELECT *,
        |    CASE WHEN n_bytes > byte_rate OR n_msgs > msg_rate
        |      THEN 1 ELSE 0 END AS exceeded,
        |    greatest((n_bytes - 1) // byte_rate,
        |      (n_msgs - 1) // msg_rate) AS pause_secs,
        |    greatest(n_bytes - byte_rate, 0) AS overflow_bytes
        |  FROM cfg)
        |SELECT topic, byte_rate, msg_rate, COUNT(*) AS n_seconds,
        |  CAST(SUM(n_msgs) AS BIGINT) AS n_msgs,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(MAX(n_bytes) AS BIGINT) AS peak_sec_bytes,
        |  CAST(MAX(n_msgs) AS BIGINT) AS peak_sec_msgs,
        |  CAST(SUM(exceeded) AS BIGINT) AS n_exceeded_secs,
        |  CAST(SUM(pause_secs) AS BIGINT) AS pause_secs,
        |  CAST(SUM(overflow_bytes) AS BIGINT) AS buffered_bytes,
        |  CAST(SUM(CASE WHEN overflow_bytes >= 131072 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_buffer_holds,
        |  CASE WHEN SUM(exceeded) > 0 THEN 'THROTTLED'
        |    ELSE 'WITHIN_RATE' END AS verdict
        |FROM led GROUP BY topic, byte_rate, msg_rate""".stripMargin),
    "nonpartitioned_topics" ->
      (s"""WITH pp AS (
        |  SELECT event_type AS topic, user_id % 8 AS part, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN user_id % 8 <> user_id % 12
        |      THEN 1 ELSE 0 END) AS BIGINT) AS mv
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT *, ${md5LongSql("('np#' || topic)")} % 4 <> 0
        |    AS is_partitioned
        |  FROM pp),
        |""".stripMargin +
      """g AS (
        |  SELECT topic, is_partitioned,
        |    CASE WHEN is_partitioned THEN part ELSE 0 END AS part,
        |    CAST(SUM(n) AS BIGINT) AS n_records,
        |    CAST(SUM(mv) AS BIGINT) AS mv
        |  FROM f GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT *,
        |    COUNT(*) OVER (PARTITION BY topic) AS n_partitions,
        |    CASE WHEN is_partitioned
        |      THEN 'persistent://public/default/' || topic ||
        |        '-partition-' || CAST(part AS VARCHAR)
        |      ELSE 'persistent://public/default/' || topic
        |    END AS pulsar_name
        |  FROM g)
        |SELECT topic, part, is_partitioned, pulsar_name, n_partitions,
        |  n_records,
        |  CASE WHEN is_partitioned THEN mv ELSE 0 END
        |    AS n_repartition_moved,
        |  CASE WHEN is_partitioned THEN regexp_extract(pulsar_name,
        |      '^persistent://[^/]+/[^/]+/(.+)-partition-[0-9]+$', 1)
        |    ELSE regexp_extract(pulsar_name,
        |      '^persistent://[^/]+/[^/]+/(.+)$', 1) END AS kafka_name
        |FROM w""".stripMargin),
    "inner_topic_protection" ->
      (s"""WITH att AS (
        |  SELECT event_id, event_type,
        |    ${md5LongSql("('inner#' || event_id)")} % 64 AS coin,
        |    ${md5LongSql("('origin#' || event_id)")} % 4 AS ocoin
        |  FROM events),
        |""".stripMargin +
      """shaped AS (
        |  SELECT *,
        |    CASE WHEN coin IN (56, 57, 58, 59) THEN '__kafka'
        |      ELSE 'default' END AS ns,
        |    CASE WHEN coin IN (56, 57, 61) THEN '__consumer_offsets'
        |      WHEN coin IN (58, 59, 62) THEN '__transaction_state'
        |      WHEN coin = 60 THEN '__change_events'
        |      ELSE event_type END AS topic
        |  FROM att),
        |o AS (
        |  SELECT *,
        |    CASE WHEN ns = '__kafka' AND ocoin = 0 THEN 'COORDINATOR'
        |      ELSE 'CLIENT' END AS origin,
        |    CASE WHEN ns = '__kafka' AND topic IN
        |      ('__consumer_offsets', '__transaction_state')
        |      THEN 1 ELSE 0 END AS internal
        |  FROM shaped),
        |v AS (
        |  SELECT *,
        |    CASE WHEN internal = 1 AND origin = 'CLIENT'
        |        THEN 'INVALID_TOPIC'
        |      WHEN topic = '__change_events' THEN 'INVALID_TOPIC'
        |      ELSE 'ALLOWED' END AS verdict
        |  FROM o)
        |SELECT ns, topic, origin, CAST(internal AS BIGINT) AS internal,
        |  verdict, COUNT(*) AS n_attempts,
        |  CAST(CASE WHEN verdict = 'INVALID_TOPIC' THEN COUNT(*)
        |    ELSE 0 END AS BIGINT) AS n_rejected
        |FROM v GROUP BY ns, topic, origin, internal, verdict""".stripMargin),
    "api_versions" ->
      (s"""WITH api(api_idx, api_key, api_name, broker_min, broker_max) AS (
        |  VALUES $apiValuesSql),
        |""".stripMargin +
      """req AS (
        |  SELECT 'client' || (user_id % 16) AS client,
        |    event_id % 26 AS api_idx, COUNT(*) AS n_requests
        |  FROM events GROUP BY 1, 2),
        |v AS (
        |  SELECT *,
        |    ('0x' || substring(md5(
        |      concat_ws('#', 'ver', client, api_name)), 1, 14))::BIGINT
        |      % (broker_max + 4) AS client_max
        |  FROM req JOIN api USING (api_idx))
        |SELECT client, CAST(api_key AS BIGINT) AS api_key, api_name,
        |  CAST(broker_min AS BIGINT) AS broker_min,
        |  CAST(broker_max AS BIGINT) AS broker_max,
        |  CAST(client_max AS BIGINT) AS client_max,
        |  CAST(CASE WHEN client_max >= broker_min
        |    THEN least(client_max, broker_max) END AS BIGINT)
        |    AS used_version,
        |  CASE WHEN client_max < broker_min THEN 'UNSUPPORTED_VERSION'
        |    ELSE 'OK' END AS outcome,
        |  n_requests
        |FROM v""".stripMargin),
    "sasl_flow" ->
      """WITH conns AS (
        |  SELECT user_id % 32 AS conn_id, COUNT(*) AS n_requests
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT conn_id, n_requests, 'conn' || conn_id AS conn,
        |    substring(md5(concat_ws('#', 'mech', 'conn' || conn_id)), 1, 1)
        |      AS mech_coin
        |  FROM conns),
        |mm AS (
        |  SELECT *,
        |    CASE WHEN mech_coin IN ('0','1','2','3','4','5','6')
        |      THEN 'PLAIN'
        |    WHEN mech_coin IN ('7','8','9','a','b') THEN 'OAUTHBEARER'
        |    WHEN mech_coin IN ('c','d') THEN 'SCRAM-SHA-256'
        |    ELSE 'GSSAPI' END AS mechanism
        |  FROM m),
        |h AS (
        |  SELECT *,
        |    CASE WHEN mechanism IN ('PLAIN', 'OAUTHBEARER') THEN 'NONE'
        |      ELSE 'UNSUPPORTED_SASL_MECHANISM' END AS handshake_outcome,
        |    substring(md5(concat_ws('#', 'auth', 'conn' || conn_id,
        |      mechanism)), 1, 1) AS auth_coin
        |  FROM mm),
        |a AS (
        |  SELECT *,
        |    CASE WHEN handshake_outcome <> 'NONE' THEN NULL
        |      WHEN mechanism = 'PLAIN' AND auth_coin = '0'
        |        THEN 'SASL_AUTHENTICATION_FAILED'
        |      WHEN mechanism = 'OAUTHBEARER' AND auth_coin IN ('0', '1')
        |        THEN 'SASL_AUTHENTICATION_FAILED'
        |      ELSE 'NONE' END AS auth_outcome
        |  FROM h)
        |SELECT conn, mechanism, handshake_outcome, auth_outcome,
        |  CASE WHEN auth_outcome = 'NONE' THEN 'COMPLETE'
        |    ELSE 'FAILED' END AS final_state,
        |  CASE WHEN auth_outcome = 'NONE'
        |    THEN 'role' || (conn_id % 8) END AS principal,
        |  n_requests
        |FROM a""".stripMargin,
    "acl_check" -> ("WITH " + aclSql +
      "SELECT topic, ns, role, action, n_requests, decision, via FROM acl"),
    "fetch_authorized" -> (L + aclSql.stripSuffix("\n") + ",\n" +
      """pp AS (
        |  SELECT topic, part, COUNT(*) AS n,
        |    CAST(SUM(length(v) + length(k)) AS BIGINT) AS bytes
        |  FROM log GROUP BY topic, part),
        |meta AS (
        |  SELECT topic, CAST(SUM(n) AS BIGINT) AS n_records,
        |    CAST(SUM(bytes) AS BIGINT) AS approx_bytes
        |  FROM pp GROUP BY topic)
        |SELECT role, COUNT(*) AS n_topics_asked,
        |  CAST(SUM(CASE WHEN decision = 'ALLOW' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_topics_allowed,
        |  CAST(SUM(CASE WHEN decision = 'ALLOW' THEN meta.n_records
        |    ELSE 0 END) AS BIGINT) AS fetchable_records,
        |  CAST(SUM(CASE WHEN decision = 'ALLOW' THEN meta.approx_bytes
        |    ELSE 0 END) AS BIGINT) AS fetchable_bytes,
        |  CAST(SUM(CASE WHEN decision = 'DENY' THEN acl.n_requests
        |    ELSE 0 END) AS BIGINT) AS denied_requests
        |FROM acl JOIN meta USING (topic)
        |WHERE acl.action = 'consume'
        |GROUP BY role""".stripMargin),
    "topic_configs" -> (L + configsSql +
      """SELECT topic, config_key, default_value, override_value,
        |  effective_value, source
        |FROM cfg""".stripMargin),
    "alter_configs" -> (L + configsSql +
      """, alt0 AS (
        |  SELECT topic, config_key, effective_value,
        |    substring(md5('alter#' || topic || '#' || config_key), 1, 1)
        |      AS acoin,
        |    ('0x' || substring(md5('alter#' || topic || '#' || config_key),
        |      2, 1))::BIGINT AS ad
        |  FROM cfg),
        |alt1 AS (
        |  SELECT topic, config_key, effective_value, ad,
        |    CASE config_key
        |      WHEN 'retention.ms' THEN CAST((ad - 2) * 43200000 AS VARCHAR)
        |      WHEN 'retention.bytes'
        |        THEN CAST((ad - 1) * 536870912 AS VARCHAR)
        |      WHEN 'segment.bytes' THEN CAST((ad - 1) * 33554432 AS VARCHAR)
        |      WHEN 'segment.ms' THEN CAST((ad - 1) * 1800000 AS VARCHAR)
        |      WHEN 'cleanup.policy' THEN CASE WHEN ad < 5 THEN 'delete'
        |        WHEN ad < 10 THEN 'compact'
        |        WHEN ad < 13 THEN 'compact,delete' ELSE 'purge' END
        |      WHEN 'min.insync.replicas' THEN CAST(ad % 5 AS VARCHAR)
        |      WHEN 'max.message.bytes' THEN CAST((ad - 1) * 262144 AS VARCHAR)
        |      ELSE CASE WHEN ad < 10 THEN '0.' || CAST(ad AS VARCHAR)
        |        ELSE '1.' || CAST(ad - 10 AS VARCHAR) END END
        |      AS proposed_value
        |  FROM alt0 WHERE acoin IN ('0','1','2','3','4','5','6','7')),
        |alt AS (
        |  SELECT *, CASE config_key
        |      WHEN 'retention.ms' THEN CAST(proposed_value AS BIGINT) > 0
        |      WHEN 'retention.bytes' THEN CAST(proposed_value AS BIGINT) >= -1
        |      WHEN 'segment.bytes' THEN CAST(proposed_value AS BIGINT) >= 14
        |      WHEN 'segment.ms' THEN CAST(proposed_value AS BIGINT) >= 1
        |      WHEN 'cleanup.policy'
        |        THEN proposed_value IN ('delete', 'compact', 'compact,delete')
        |      WHEN 'min.insync.replicas'
        |        THEN CAST(proposed_value AS BIGINT) >= 1
        |      WHEN 'max.message.bytes'
        |        THEN CAST(proposed_value AS BIGINT) >= 0
        |      ELSE CAST(proposed_value AS DOUBLE) <= 1.0 END AS valid
        |  FROM alt1)
        |SELECT topic, config_key, effective_value AS old_effective,
        |  proposed_value,
        |  CASE WHEN valid THEN 'OK' ELSE 'INVALID_CONFIG' END AS outcome,
        |  CASE WHEN valid THEN proposed_value ELSE effective_value END
        |    AS new_effective,
        |  CASE WHEN config_key = 'retention.ms' AND valid
        |    THEN CAST(effective_value AS BIGINT)
        |      - CAST(proposed_value AS BIGINT)
        |    ELSE NULL END AS cutoff_shift_ms
        |FROM alt""".stripMargin),
    "retention_by_config" -> (L + configsSql +
      """, ret AS (
        |  SELECT topic, CAST(effective_value AS BIGINT) AS retention_ms
        |  FROM cfg WHERE config_key = 'retention.ms'),
        |now_f AS (SELECT MAX(tms) AS now_ms FROM log)
        |SELECT topic, part, retention_ms, COUNT(*) AS n_survive,
        |  MIN(offs) AS new_earliest,
        |  CAST(SUM(length(v) + length(k)) AS BIGINT) AS bytes_survive
        |FROM log JOIN ret USING (topic) CROSS JOIN now_f
        |WHERE tms >= now_ms - retention_ms
        |GROUP BY topic, part, retention_ms""".stripMargin),
    "delete_topics" -> (L + commitsSql +
      s""", tm AS (
        |  SELECT * FROM $topicRollupSql t),
        |${graft.log.BrokerOps.sizedSegSql},
        |segn AS (
        |  SELECT topic, COUNT(*) AS n_segments FROM (
        |    SELECT DISTINCT topic, part, seg_id FROM sized)
        |  GROUP BY topic),
        |og AS (
        |  SELECT topic,
        |    CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups_affected,
        |    COUNT(*) AS n_offsets_purged
        |  FROM commits GROUP BY topic)
        |SELECT topic, n_partitions, n_records, approx_bytes, n_segments,
        |  n_groups_affected, n_offsets_purged
        |FROM tm JOIN segn USING (topic) JOIN og USING (topic)""".stripMargin),
    "topic_delete_invalidation" -> (L + commitsSql +
      s""", pp AS (
        |  SELECT topic, part, COUNT(*) AS n FROM log GROUP BY 1, 2),
        |f AS (
        |  SELECT *, ${md5LongSql("('np#' || topic)")} % 4 <> 0
        |    AS is_partitioned
        |  FROM pp),
        |tt AS (
        |  SELECT topic, is_partitioned,
        |    CAST(COUNT(DISTINCT part) AS BIGINT) AS raw_parts,
        |    CAST(SUM(n) AS BIGINT) AS n_records
        |  FROM f GROUP BY 1, 2),
        |tp AS (
        |  SELECT topic, is_partitioned,
        |    CASE WHEN is_partitioned THEN raw_parts
        |      ELSE CAST(1 AS BIGINT) END AS n_partitions,
        |    n_records
        |  FROM tt),
        |og AS (
        |  SELECT topic,
        |    CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups_affected,
        |    COUNT(*) AS n_offsets_purged
        |  FROM commits GROUP BY topic)
        |SELECT topic, is_partitioned, n_partitions, n_records,
        |  CASE WHEN is_partitioned THEN n_partitions
        |    ELSE CAST(1 AS BIGINT) END AS n_whendelete_events,
        |  CASE WHEN is_partitioned THEN n_partitions
        |    ELSE CAST(2 AS BIGINT) END AS n_cache_derefs,
        |  CASE WHEN is_partitioned THEN n_partitions
        |    ELSE CAST(2 AS BIGINT) END AS n_plog_removals,
        |  COALESCE(n_groups_affected, 0) AS n_groups_affected,
        |  COALESCE(n_offsets_purged, 0) AS n_offsets_purged
        |FROM tp LEFT JOIN og USING (topic)""".stripMargin),
    "auth_failure_delay" -> ("WITH " + saslFailsSql.stripSuffix("\n") + ",\n" +
      s"""att AS (
        |  SELECT 'conn' || (user_id % 32) AS conn, epoch_ms(ts) AS tms
        |  FROM events),
        |fa AS (
        |  SELECT att.conn, mechanism, tms, tms // $AuthParkWindowMs AS bkt
        |  FROM att JOIN fails USING (conn)),
        |parks AS (
        |  SELECT conn, mechanism, bkt, MIN(tms) AS park_start,
        |    COUNT(*) AS n_in_bkt
        |  FROM fa GROUP BY 1, 2, 3),
        |occ AS (
        |  SELECT a.conn, a.bkt, COUNT(*) AS occ
        |  FROM parks a JOIN parks b
        |    ON b.bkt >= a.bkt - 1 AND b.bkt <= a.bkt
        |   AND b.park_start <= a.park_start
        |   AND b.park_start + $AuthParkWindowMs > a.park_start
        |  GROUP BY 1, 2),
        |per AS (
        |  SELECT p.conn, p.mechanism,
        |    CAST(SUM(p.n_in_bkt) AS BIGINT) AS n_attempts,
        |    COUNT(*) AS n_admitted,
        |    CAST(MAX(o.occ) AS BIGINT) AS max_concurrent_parked
        |  FROM parks p JOIN occ o ON o.conn = p.conn AND o.bkt = p.bkt
        |  GROUP BY 1, 2)
        |SELECT conn, mechanism, n_attempts, n_admitted,
        |  max_concurrent_parked,
        |  n_attempts - n_admitted AS n_absorbed,
        |  n_admitted * 300 AS parked_close_ms,
        |  (100 * (n_attempts - n_admitted)) // n_attempts AS damped_pct
        |FROM per""".stripMargin),
    "migration_requests" -> (L +
      s"""st AS (
        |  SELECT *, ${md5LongSql("topic || '#mig'")} % 3 AS phase_id,
        |    MIN(tms) OVER (PARTITION BY topic) +
        |      (MAX(tms) OVER (PARTITION BY topic)
        |       - MIN(tms) OVER (PARTITION BY topic)) // 2 AS mid_ts
        |  FROM log),
        |pp AS (
        |  SELECT topic, part, phase_id, MAX(offs) + 1 AS log_end,
        |    CAST(SUM(CASE WHEN tms <= mid_ts THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_before_mid
        |  FROM st GROUP BY topic, part, phase_id),
        |tf AS (
        |  SELECT topic,
        |    CASE phase_id WHEN 0 THEN 'NOT_STARTED' WHEN 1 THEN 'STARTED'
        |      ELSE 'DONE' END AS migration_status,
        |    CAST(SUM(CASE WHEN phase_id = 1 THEN log_end - n_before_mid
        |      ELSE 0 END) AS BIGINT) AS n_outstanding_proxy
        |  FROM pp GROUP BY topic, phase_id),
        |po AS (
        |  SELECT topic, COUNT(DISTINCT tms // 3600000) AS n_status_polls
        |  FROM log GROUP BY topic),
        |base AS (
        |  SELECT tf.*, po.n_status_polls,
        |    ${md5LongSql("'migreq#' || topic")} % 2 AS dup
        |  FROM tf JOIN po USING (topic))
        |SELECT topic, method, path, n_requests, n_rejected, outcome,
        |  migration_status, n_outstanding_proxy FROM (
        |  SELECT topic, 'POST' AS method,
        |    '/migration/createTopic' AS path,
        |    CAST(1 + dup AS BIGINT) AS n_requests,
        |    CAST(dup AS BIGINT) AS n_rejected, 'CREATED' AS outcome,
        |    migration_status, n_outstanding_proxy FROM base
        |  UNION ALL
        |  SELECT topic, 'POST', '/migration/start', CAST(1 AS BIGINT),
        |    CAST(0 AS BIGINT),
        |    CASE migration_status WHEN 'NOT_STARTED' THEN 'ACCEPTED'
        |      WHEN 'STARTED' THEN 'ALREADY_STARTED'
        |      ELSE 'ALREADY_DONE' END,
        |    migration_status, n_outstanding_proxy FROM base
        |  UNION ALL
        |  SELECT topic, 'GET', '/migration/status',
        |    CAST(n_status_polls AS BIGINT), CAST(0 AS BIGINT), 'OK',
        |    migration_status, n_outstanding_proxy FROM base)""".stripMargin),
    "advertised_listeners" ->
      // NOT `SELECT DISTINCT ... LIMIT 1` comma-joined: DuckDB 1.0.0
      // plans that CTE nondeterministically in a comma cross join (it
      // returned 0 rows on ~2/5 executions, measured), silently zeroing
      // the whole result. The aggregate+HAVING anchor keeps the same
      // "a tenantless cluster advertises nothing" semantics — exactly
      // one row iff events is non-empty — through a stable plan.
      s"""WITH live AS (SELECT 1 AS one FROM events HAVING COUNT(*) > 0),
        |bs AS (
        |  SELECT bb.broker, ss.slot FROM
        |    (SELECT CAST(g AS BIGINT) AS broker
        |     FROM generate_series(0, 3) t(g)) bb,
        |    (SELECT CAST(g AS BIGINT) AS slot
        |     FROM generate_series(0, 2) u(g)) ss, live),
        |d AS (
        |  SELECT broker, slot,
        |    CASE ${md5LongSql("concat_ws('#', 'proto', broker, slot)")} % 4
        |      WHEN 0 THEN 'PLAINTEXT' WHEN 1 THEN 'SSL'
        |      WHEN 2 THEN 'SASL_PLAINTEXT' ELSE 'SASL_SSL' END AS proto,
        |    ${md5LongSql("concat_ws('#', 'lhost', broker, slot)")} % 4
        |      AS host_coin,
        |    CASE WHEN ${md5LongSql(
             "concat_ws('#', 'lport', broker, slot)")} % 8 = 0
        |      THEN 70000 ELSE 9092 + slot END AS port
        |  FROM bs),
        |h AS (
        |  SELECT *,
        |    CASE host_coin WHEN 0 THEN ''
        |      WHEN 1 THEN 'broker-' || broker || '.cluster.local'
        |      WHEN 2 THEN '10.0.0.' || broker
        |      ELSE 'broker-' || broker END AS host
        |  FROM d),
        |ol AS (
        |  SELECT broker, slot,
        |    proto || '://' || host || ':' || CAST(port AS VARCHAR)
        |      AS original_listener
        |  FROM h),
        |px AS (
        |  SELECT *,
        |    regexp_extract(original_listener,
        |      '^(.*)://\\[?([0-9a-zA-Z\\-%._:]*)\\]?:(-?[0-9]+)', 1)
        |      AS listener_name,
        |    regexp_extract(original_listener,
        |      '^(.*)://\\[?([0-9a-zA-Z\\-%._:]*)\\]?:(-?[0-9]+)', 2)
        |      AS parsed_host,
        |    CAST(regexp_extract(original_listener,
        |      '^(.*)://\\[?([0-9a-zA-Z\\-%._:]*)\\]?:(-?[0-9]+)', 3)
        |      AS BIGINT) AS parsed_port
        |  FROM ol)
        |SELECT broker, slot, original_listener, listener_name,
        |  CASE WHEN parsed_host = '' THEN 'localhost'
        |    ELSE parsed_host END AS hostname,
        |  parsed_port,
        |  CASE WHEN parsed_port < 0 OR parsed_port > 65535
        |    THEN 'INVALID_PORT' ELSE 'OK' END AS outcome
        |FROM px""".stripMargin,
    "metadata_topics" -> (L +
      s"""tn AS (
        |  SELECT DISTINCT 't' || CAST(${md5LongSql(
             "'tenant#' || topic")} % 3 AS VARCHAR) AS tenant
        |  FROM (SELECT DISTINCT topic FROM log)),
        |sys AS (
        |  SELECT * FROM (VALUES
        |    ('__consumer_offsets', CAST(50 AS BIGINT)),
        |    ('__transaction_state', CAST(50 AS BIGINT)),
        |    ('__schema_registry', CAST(1 AS BIGINT)))
        |    s(system_topic, n_partitions)),
        |d AS (
        |  SELECT tenant, system_topic, n_partitions,
        |    'persistent://' || tenant || '/__kafka/' || system_topic
        |      AS pulsar_name,
        |    ${md5LongSql(
             "concat_ws('#', 'sysparts', tenant, system_topic)")}
        |      % (n_partitions + 1) AS n_existing
        |  FROM tn CROSS JOIN sys)
        |SELECT tenant, system_topic, pulsar_name, n_partitions,
        |  n_existing, n_partitions - n_existing AS n_created,
        |  CASE WHEN n_existing = 0 THEN 'CREATED'
        |    WHEN n_existing < n_partitions THEN 'PARTITIONS_ADDED'
        |    ELSE 'NONE' END AS action
        |FROM d""".stripMargin),
    "kop_event_queue" -> (L +
      """ev AS (
        |  SELECT 'delete_topics' AS event_class, topic AS event_key,
        |    MAX(tms) + 60000 AS arrival_ms,
        |    1 + 4 * COUNT(DISTINCT part) AS cost_ms
        |  FROM log GROUP BY topic
        |  UNION ALL
        |  SELECT 'brokers_change', 'h' || CAST(h AS VARCHAR),
        |    h * 3600000, 5
        |  FROM (SELECT DISTINCT tms // 3600000 AS h FROM log)),
        |qc AS (
        |  SELECT *, CAST(SUM(cost_ms) OVER w AS BIGINT) AS c
        |  FROM ev
        |  WINDOW w AS (ORDER BY arrival_ms, event_class, event_key
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |qd AS (
        |  SELECT *, MAX(arrival_ms - c + cost_ms) OVER w2 AS d
        |  FROM qc
        |  WINDOW w2 AS (ORDER BY arrival_ms, event_class, event_key
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_class, event_key, arrival_ms, cost_ms,
        |  CAST(c + d - cost_ms AS BIGINT) AS start_ms,
        |  CAST(c + d AS BIGINT) AS finish_ms,
        |  CAST(c + d - cost_ms - arrival_ms AS BIGINT) AS queued_ms
        |FROM qd""".stripMargin),
    "tenant_summary" -> (L +
      s"""pp AS (
        |  SELECT topic, part, COUNT(*) AS n,
        |    CAST(SUM(length(v) + length(k)) AS BIGINT) AS bytes,
        |    MIN(tms) AS mn, MAX(tms) AS mx
        |  FROM log GROUP BY topic, part),
        |tn AS (
        |  SELECT *,
        |    't' || CAST(${md5LongSql("'tenant#' || topic")} % 3 AS VARCHAR)
        |      AS tenant,
        |    't' || CAST(${md5LongSql("'tenant#' || topic")} % 3 AS VARCHAR)
        |      || '/ns'
        |      || CAST(${md5LongSql("'ns#' || topic")} % 2 AS VARCHAR) AS ns
        |  FROM pp)
        |SELECT tenant, COUNT(DISTINCT ns) AS n_namespaces,
        |  COUNT(DISTINCT topic) AS n_topics, COUNT(*) AS n_partitions,
        |  CAST(SUM(n) AS BIGINT) AS n_records,
        |  CAST(SUM(bytes) AS BIGINT) AS approx_bytes,
        |  MIN(mn) AS earliest_ms, MAX(mx) AS latest_ms,
        |  'gc-' || tenant AS group_coordinator,
        |  'tc-' || tenant AS txn_coordinator
        |FROM tn GROUP BY tenant""".stripMargin),
    "token_validation" ->
      s"""WITH conns AS (
        |  SELECT user_id % 32 AS conn_id, MIN(epoch_ms(ts)) AS iat_ms,
        |    MAX(epoch_ms(ts)) AS validated_at_ms
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT conn_id, iat_ms, validated_at_ms,
        |    'conn' || conn_id AS conn,
        |    substring(md5(concat_ws('#', 'mech', 'conn' || conn_id)), 1, 1)
        |      AS mech_coin
        |  FROM conns),
        |d AS (
        |  SELECT *,
        |    CASE WHEN ${md5LongSql("'tok#' || conn")} % 2 = 1
        |      THEN 't' || CAST(${md5LongSql("'tenant#tok#' || conn")} % 3
        |        AS VARCHAR) END AS tenant,
        |    ${md5LongSql("'sub#' || conn")} % 8 <> 0 AS sub_present,
        |    CASE ${md5LongSql("'exp#' || conn")} % 4
        |      WHEN 0 THEN 300000 WHEN 1 THEN 900000 WHEN 2 THEN 3600000
        |      ELSE 86400000 END AS lifetime_ms
        |  FROM m WHERE mech_coin IN ('7', '8', '9', 'a', 'b'))
        |SELECT conn, tenant,
        |  CASE WHEN sub_present
        |    THEN 'role' || CAST(conn_id % 8 AS VARCHAR) END AS principal,
        |  iat_ms, iat_ms + lifetime_ms AS exp_ms, validated_at_ms,
        |  CASE WHEN NOT sub_present THEN 'INVALID_CLAIM'
        |    WHEN iat_ms + lifetime_ms + 30000 <= validated_at_ms
        |      THEN 'EXPIRED'
        |    ELSE 'VALID' END AS outcome
        |FROM d""".stripMargin,
    "migration_status" -> (L +
      s"""st AS (
        |  SELECT *, ${md5LongSql("topic || '#mig'")} % 3 AS phase_id,
        |    MIN(tms) OVER (PARTITION BY topic) +
        |      (MAX(tms) OVER (PARTITION BY topic)
        |       - MIN(tms) OVER (PARTITION BY topic)) // 2 AS mid_ts
        |  FROM log),
        |pp AS (
        |  SELECT topic, part, phase_id, MAX(offs) + 1 AS log_end,
        |    CAST(SUM(CASE WHEN tms <= mid_ts THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_before_mid
        |  FROM st GROUP BY topic, part, phase_id)
        |SELECT topic, part,
        |  CASE phase_id WHEN 0 THEN 'NOT_STARTED' WHEN 1 THEN 'STARTED'
        |    ELSE 'DONE' END AS migration_status,
        |  'kafka-src-' || CAST(phase_id AS VARCHAR) AS kafka_cluster_address,
        |  log_end,
        |  CASE phase_id WHEN 0 THEN 0 WHEN 1 THEN n_before_mid
        |    ELSE log_end END AS fence_offset,
        |  log_end - (CASE phase_id WHEN 0 THEN 0 WHEN 1 THEN n_before_mid
        |    ELSE log_end END) AS n_pending
        |FROM pp""".stripMargin),
    "delayed_create" -> (L +
      """pc AS (
        |  SELECT topic, part, MIN(tms) AS part_create_ms
        |  FROM log GROUP BY topic, part)
        |SELECT topic, COUNT(*) AS n_partitions,
        |  MIN(part_create_ms) AS request_ms,
        |  MAX(part_create_ms) AS complete_ms,
        |  MAX(part_create_ms) - MIN(part_create_ms) AS wait_ms,
        |  CASE WHEN MAX(part_create_ms) - MIN(part_create_ms) <= 3600000
        |    THEN 'Completed' ELSE 'TimedOut' END AS outcome
        |FROM pc GROUP BY topic""".stripMargin),
    "create_topics" -> (L +
      """tm AS (
        |  SELECT topic, 1 AS existed FROM log GROUP BY topic
        |  UNION ALL
        |  SELECT 'newtopic' || CAST(i AS VARCHAR), 0
        |  FROM generate_series(0, 7) t(i)),
        |d AS (
        |  SELECT topic, CAST(existed AS BIGINT) AS existed,
        |    substring(md5('ctdefault#' || topic), 1, 1) AS cdef,
        |    substring(md5('ctneg3#' || topic), 1, 1) AS cneg,
        |    ('0x' || substring(md5('ctnum#' || topic), 1, 1))::BIGINT AS dnum,
        |    substring(md5('ctdup#' || topic), 1, 1) AS cdup,
        |    substring(md5('ctauth#' || topic), 1, 1) AS cauth
        |  FROM tm),
        |e AS (
        |  SELECT *,
        |    CASE WHEN cdef IN ('0', '1', '2', '3') THEN CAST(-1 AS BIGINT)
        |         WHEN cneg = '0' THEN -3
        |         ELSE 1 + dnum % 6 END AS req_partitions,
        |    CASE WHEN cdup IN ('0', '1', '2') THEN 2 ELSE 1 END AS n_entries,
        |    CASE WHEN cauth IN ('0', '1') THEN 0 ELSE 1 END AS authorized
        |  FROM d),
        |f AS (
        |  SELECT *,
        |    CASE WHEN req_partitions = -1 THEN CAST(1 AS BIGINT)
        |      ELSE req_partitions END AS effective_partitions
        |  FROM e),
        |h AS (
        |  SELECT *,
        |    CASE WHEN authorized = 0 THEN 'TOPIC_AUTHORIZATION_FAILED'
        |         WHEN effective_partitions < 0 THEN 'INVALID_REQUEST'
        |         WHEN existed = 1 THEN 'TOPIC_ALREADY_EXISTS'
        |         ELSE 'NONE' END AS outcome
        |  FROM f)
        |SELECT topic, existed, req_partitions, effective_partitions,
        |  CAST(n_entries AS BIGINT) AS n_entries,
        |  CAST(authorized AS BIGINT) AS authorized, outcome,
        |  CASE WHEN outcome = 'NONE' THEN effective_partitions
        |    ELSE CAST(0 AS BIGINT) END AS created_partitions
        |FROM h""".stripMargin),
    "create_partitions" -> (L +
      """pp AS (
        |  SELECT topic, part FROM log GROUP BY topic, part),
        |tm AS (
        |  SELECT topic, COUNT(*) AS n_partitions, 1 AS existed
        |  FROM pp GROUP BY topic
        |  UNION ALL SELECT * FROM (VALUES ('ghost0', 0, 0), ('ghost1', 0, 0))
        |    g(topic, n_partitions, existed)),
        |d AS (
        |  SELECT topic, CAST(n_partitions AS BIGINT) AS n_partitions,
        |    CAST(existed AS BIGINT) AS existed,
        |    ('0x' || substring(md5('cpdelta#' || topic), 1, 1))::BIGINT
        |      AS ddelta,
        |    substring(md5('cpneg#' || topic), 1, 1) AS cneg,
        |    substring(md5('cpdup#' || topic), 1, 1) AS cdup,
        |    substring(md5('cpasg#' || topic), 1, 1) AS casg,
        |    substring(md5('cpauth#' || topic), 1, 1) AS cauth
        |  FROM tm),
        |e AS (
        |  SELECT *,
        |    CASE WHEN cneg IN ('0', '1') THEN CAST(-1 AS BIGINT)
        |         WHEN existed = 0 THEN 1 + ddelta % 4
        |         ELSE n_partitions +
        |           list_extract([-2, -1, 0, 1, 2, 4],
        |             CAST(ddelta % 6 + 1 AS INT)) END AS req_partitions,
        |    CASE WHEN cdup IN ('0', '1', '2') THEN 2 ELSE 1 END AS n_entries,
        |    CASE WHEN casg = '0' THEN 1 ELSE 0 END AS manual_assignment,
        |    CASE WHEN cauth IN ('0', '1') THEN 0 ELSE 1 END AS authorized
        |  FROM d),
        |h AS (
        |  SELECT *,
        |    CASE WHEN authorized = 0 THEN 'TOPIC_AUTHORIZATION_FAILED'
        |         WHEN req_partitions < 0 THEN 'INVALID_PARTITIONS'
        |         WHEN manual_assignment = 1 THEN 'INVALID_REQUEST'
        |         WHEN existed = 0 THEN 'UNKNOWN_TOPIC_OR_PARTITION'
        |         WHEN n_partitions > req_partitions THEN 'INVALID_PARTITIONS'
        |         ELSE 'NONE' END AS outcome
        |  FROM e)
        |SELECT topic, n_partitions AS old_partitions, req_partitions,
        |  CAST(n_entries AS BIGINT) AS n_entries,
        |  CAST(manual_assignment AS BIGINT) AS manual_assignment,
        |  CAST(authorized AS BIGINT) AS authorized, outcome,
        |  CASE WHEN outcome = 'NONE' THEN req_partitions
        |    ELSE n_partitions END AS applied_partitions
        |FROM h""".stripMargin),
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
