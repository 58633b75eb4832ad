package graft.log

import graft.Tables.t
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's partitioned-log model, re-expressed declaratively.
  *
  * The events table is mapped onto a Kafka-style log (SURVEY.md §3):
  * topic = event_type, partition = pmod(user_id, 8), key = user_id,
  * value = props, offset = dense append order per (topic, partition).
  * Offset assignment is the reference's PartitionLog.appendRecords
  * (/root/reference/kafka-impl/.../storage/PartitionLog.java) turned into a
  * single window: one shuffle on (topic, part), and every downstream log
  * operator reuses that partitioning (no further wide exchanges).
  *
  * Scale: at 100 TB the source would be written bucketed/partitioned by
  * (topic, part); the window then runs partition-local. All operators here
  * aggregate with map-side-combinable functions (min/max/count/sum).
  */
object LogOps {

  /** Canonical log view: offset assignment over the event stream. Offsets
    * follow ARRIVAL order (event_id — the broker assigns offsets as records
    * append, not by event time), which is why event time inside a partition
    * is out of order (watermark_lateness / offsets_for_max_ts measure it).
    */
  def log(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("topic", "part").orderBy("event_id")
    logBase(spark, dir)
      .withColumn("offs", row_number().over(w).cast("long") - 1L)
  }

  /** [[log]] WITHOUT the offset window — the one shared projection, for
    * consumers that only need per-partition aggregates (offsets are a
    * dense row_number, so log_end = COUNT(*) and no sort is needed).
    */
  private[graft] def logBase(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        nsToMs("ts").as("tms"),
        col("event_type").as("topic"),
        pmod(col("user_id"), lit(8L)).as("part"),
        col("user_id").cast("string").as("k"),
        col("props").as("v"),
        col("value").as("val"))

  /** DuckDB mirror of [[log]] for every oracle below. */
  val logSql: String =
    """WITH log AS (
      |  SELECT event_id, epoch_ms(ts) AS tms, event_type AS topic,
      |    user_id % 8 AS part, CAST(user_id AS VARCHAR) AS k, props AS v,
      |    "value" AS val,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, user_id % 8
      |                       ORDER BY event_id) - 1 AS offs
      |  FROM events)
      |""".stripMargin

  /** [[logSql]] as a continuable CTE prefix (trailing comma) for oracles
    * that chain more CTEs — single definition so the concatenation shape
    * can't drift between modules.
    */
  val logSqlCte: String = logSql.stripSuffix("\n") + ",\n"

  private val cols = Seq("topic", "part", "offs", "event_id", "tms", "k", "v")

  def logView(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir).select(cols.map(col): _*)

  /** Bounded range read per partition: FetchRequest semantics
    * (/root/reference/kafka-impl/.../MessageFetchContext.java).
    */
  def fetch(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .filter(col("topic") === "click" && col("offs") >= 100L && col("offs") < 200L)
      .select(cols.map(col): _*)

  /** Earliest / log-end offsets + timestamp bounds per partition
    * (ListOffsets EARLIEST/LATEST; /root/reference/.../utils/OffsetFinder.java).
    */
  def listOffsets(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir).groupBy("topic", "part").agg(
      min("offs").as("earliest"),
      (max("offs") + 1L).as("log_end"),
      count(lit(1)).as("n"),
      min("tms").as("earliest_ms"),
      max("tms").as("latest_ms"))

  /** First offset with timestamp >= target per partition (ListOffsets by
    * time; OffsetFinder's interpolation search becomes min-over-filter).
    * The time predicate cannot push below the offset window (offsets depend
    * on every row); at scale the trim comes from the store's (topic, day)
    * partition pruning, not this filter.
    */
  def offsetsForTimes(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .filter(col("tms") >= lit(TimesTargetMs)) // 2024-01-15 00:00 UTC
      .groupBy("topic", "part")
      .agg(min("offs").as("offs"), min("tms").as("tms"))

  /** The ListOffsets time target shared by [[offsetsForTimes]] and
    * [[offsetsForPublishTime]] — 2024-01-15 00:00 UTC.
    */
  private[graft] val TimesTargetMs = 1705276800000L

  /** ListOffsets against the PUBLISH time — the broker-arrival timestamp
    * sibling of [[offsetsForTimes]]. The reference resolves a
    * time->offset lookup against the entry's Pulsar publish_time, NOT
    * the producer's event timestamp (utils/MessageMetadataUtils.java:
    * 57-93 getPublishTime reads the broker-stamped field;
    * utils/OffsetFinder.java seeks by it; tests/EntryPublishTimeTest
    * .java pins the lookup). Here each record's publish time is a
    * deterministic md5 jitter ON TOP of its event time (0..1 h late —
    * the broker stamps on arrival, never before the event happened; the
    * window is sized to the synthetic stream's per-partition density,
    * ~3 h median inter-arrival at sf0.01, so the straddle set is
    * populated), and
    * per partition the view reports BOTH answers — first offset with
    * event ts >= target vs first offset with publish ts >= target — plus
    * how many records straddle the target (publish crossed it, event
    * time did not: exactly the out-of-orderness watermark_lateness
    * measures) and whether the two lookups disagree.
    *
    * Scale: conditional min/sum aggregates over the (topic, part)
    * partitioning every log op reuses — all map-side combinable.
    */
  def offsetsForPublishTime(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .withColumn("pub_ms", col("tms") +
        pmod(md5Long(concat(lit("pub#"), col("event_id").cast("string"))),
          lit(3600000L)))
      .groupBy("topic", "part")
      .agg(
        min(when(col("tms") >= TimesTargetMs, col("offs")))
          .as("offs_event_time"),
        min(when(col("pub_ms") >= TimesTargetMs, col("offs")))
          .as("offs_publish_time"),
        min(when(col("pub_ms") >= TimesTargetMs, col("pub_ms")))
          .as("first_pub_ms"),
        sum(when(col("pub_ms") >= TimesTargetMs &&
          col("tms") < TimesTargetMs, 1L).otherwise(0L)).cast("long")
          .as("n_pub_only"))
      .withColumn("differs",
        when(coalesce(col("offs_event_time"), lit(-1L)) =!=
          coalesce(col("offs_publish_time"), lit(-1L)), 1L).otherwise(0L))

  /** ListOffsets MAX_TIMESTAMP (-3): the offset holding each partition's
    * maximum event time — distinct from the log-end offset because the log
    * is not time-ordered (watermark_lateness quantifies exactly that).
    * Kafka returns the earliest offset among max-timestamp records.
    */
  def offsetsForMaxTs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("topic", "part")
      .orderBy(col("tms").desc, col("offs").asc)
    log(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("topic"), col("part"), col("offs"), col("tms").as("max_tms"))
  }

  /** Log compaction: latest record per (topic, partition, key). */
  def compact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("topic", "part", "k")
      .orderBy(col("tms").desc, col("event_id").desc)
    log(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("topic"), col("part"), col("k"), col("offs"), col("v"),
        col("tms"))
  }

  /** Combined time + size retention: drop records older than the cutoff or
    * beyond the newest 500 per partition; report the surviving range.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val fromEnd = Window.partitionBy("topic", "part").orderBy(col("offs").desc)
    log(spark, dir)
      .withColumn("rn_end", row_number().over(fromEnd))
      .filter(col("tms") >= lit(RetentionCutoffMs) &&
        col("rn_end") <= RetentionMaxRecords)
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n_survive"),
        min("offs").as("new_earliest"),
        sum(length(col("v")) + length(col("k"))).cast("long").as("bytes"))
  }

  /** Per-record validation rollup: KopLogValidator semantics
    * (/root/reference/.../utils/KopLogValidator.java) — null value, value
    * range, timestamp-in-range checks, counted per topic.
    */
  def validateRecords(spark: SparkSession, dir: String): DataFrame = {
    val tsOk = col("tms") >= lit(1704067200000L) && col("tms") < lit(1706400000000L)
    val valOk = col("val") >= 0.05 && col("v").isNotNull
    log(spark, dir).groupBy("topic").agg(
      count(lit(1)).as("n_total"),
      sum(when(tsOk && valOk, 1L).otherwise(0L)).as("n_valid"),
      sum(when(!tsOk, 1L).otherwise(0L)).as("n_invalid_ts"),
      sum(when(tsOk && !valOk, 1L).otherwise(0L)).as("n_invalid_val"))
  }

  /** Kafka offset <-> Pulsar MessageId translation
    * (/root/reference/kafka-impl/.../utils/MessageMetadataUtils.java): the
    * reference maps continuous offsets onto (ledger, entry) coordinates;
    * modeled as 1000-record ledgers of 10 batch-entries x 100 records.
    */
  def offsetTranslate(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .filter(col("topic") === "purchase")
      .select(col("topic"), col("part"), col("offs"),
        expr("offs div 1000").as("ledger_id"),
        expr("(offs div 100) % 10").as("entry_id"),
        (col("offs") % 100L).as("batch_idx"))

  /** Multi-ledger fetch accounting — fetch x offset_translate
    * (tests/MultiLedgerTest.java:66 configures
    * managedLedgerMaxEntriesPerLedger=5 so a 50-message produce spans
    * many ledgers, then :84 consumes across them;
    * utils/MessageMetadataUtils.java is the offset->ledger/entry
    * resolution each boundary crossing re-pays via a new ledger handle).
    * The ledger geometry here is the TEST's: 5 entries per ledger, each
    * entry one 10-record batch — 50 records per ledger (offset_translate
    * keeps the production 1000-record model; at the synthetic stream's
    * ~250 records per partition that model never crosses a boundary, so
    * this view adopts the reference test's small-ledger conf, the same
    * reason the test sets it). Fetches are successive 30-record windows
    * (30 does not divide 50, so the crossing pattern cycles). Per fetch:
    * records, offset bounds, entries and ledgers touched, and the
    * boundary-crossing count — each crossing is one extra ledger open
    * the reader pays; per partition: the crossing rate across its
    * fetches (basis points, integer arithmetic for oracle parity).
    *
    * Scale: one scan partial-aggregated to (topic, part, fetch_id) —
    * the same keys the log view already partitions by, no extra
    * exchange; the per-partition rollup is metadata-sized.
    */
  def multiLedgerFetch(spark: SparkSession, dir: String): DataFrame = {
    val perFetch = log(spark, dir)
      .withColumn("fetch_id", expr("offs div 30"))
      .groupBy("topic", "part", "fetch_id")
      .agg(
        count(lit(1)).as("n_records"),
        min("offs").as("first_offs"),
        max("offs").as("last_offs"),
        countDistinct(expr("offs div 10")).as("n_entries"),
        countDistinct(expr("offs div 50")).as("n_ledgers"))
      .withColumn("n_crossings", col("n_ledgers") - 1L)
    val perPart = perFetch.groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n_fetches_part"),
        sum("n_crossings").cast("long").as("total_crossings_part"),
        sum(when(col("n_crossings") > 0L, 1L).otherwise(0L)).cast("long")
          .as("n_crossing_fetches"))
      .withColumn("crossing_rate_bp",
        expr("(10000 * n_crossing_fetches) div n_fetches_part"))
      .drop("n_crossing_fetches")
    perFetch.join(broadcast(perPart), Seq("topic", "part"))
  }

  /** Oracle-checkable guarantees of [[heavyHittersSketch]] — the sketch
    * SUMMARY is merge-order dependent (rows-only by design), but its
    * Misra-Gries GUARANTEES are deterministic for ANY merge order
    * (Misra & Gries 1982; merged-summary bound per Agarwal et al.,
    * "Mergeable Summaries"): with capacity k=64 over n records,
    * (a) every key with true count > n/64 is present, (b) no estimate
    * overcounts, (c) undercount is at most n/64. Per topic: the exact
    * record count, the n/64 error budget, the exact true-heavy-hitter
    * count, and the three violation counters — each provably zero, so
    * the DuckDB oracle CAN check this view even though it cannot
    * reproduce the sketch itself (integer-multiply comparisons, no
    * division rounding to disagree on).
    *
    * Two universes, tagged in a `universe` column: 'raw' audits the
    * sketch over [[heavyHittersSketch]]'s OWN key (user_id — uniform,
    * so presence is vacuous there, but the no-overcount and bound
    * checks run against the shipped sketch's actual universe), and
    * 'skewed' runs the same aggregator over a deterministically skewed
    * key — records with user_id % 3 == 0 collapse onto 8 hot keys
    * (each ~n/24 > n/64, guaranteed present) — so the presence
    * guarantee is also exercised with LIVE heavy hitters.
    *
    * Scale: the truth side is the same exact (topic, key) rollup
    * top_keys_per_topic already pays; the sketch side is <= 63 rows per
    * topic joined in broadcast-sized.
    */
  def heavyHittersGuarantees(spark: SparkSession, dir: String): DataFrame = {
    val mg = graft.functions.HeavyHitters.mgSketch(64)
    def branch(keyed: DataFrame, tag: String): DataFrame = {
      val sketch = keyed
        .groupBy("topic").agg(mg(col("hk")).as("sketch"))
        .select(col("topic"), explode(col("sketch")).as(Seq("hk", "est")))
      val truth = keyed
        .groupBy("topic", "hk").agg(count(lit(1)).as("n_true"))
      val tot = truth.groupBy("topic")
        .agg(sum("n_true").cast("long").as("n_records"))
      truth
        .join(broadcast(tot), "topic")
        .join(broadcast(sketch), Seq("topic", "hk"), "left")
        .groupBy("topic")
        .agg(
          max("n_records").as("n_records"),
          sum(when(col("n_true") * 64L > col("n_records"), 1L).otherwise(0L))
            .cast("long").as("n_true_heavy"),
          sum(when(col("n_true") * 64L > col("n_records") &&
            col("est").isNull, 1L).otherwise(0L))
            .cast("long").as("n_true_heavy_missing"),
          sum(when(col("est") > col("n_true"), 1L).otherwise(0L))
            .cast("long").as("n_overcount"),
          sum(when((col("n_true") - coalesce(col("est"), lit(0L))) * 64L >
            col("n_records"), 1L).otherwise(0L))
            .cast("long").as("n_bound_violations"))
        .withColumn("error_budget", expr("n_records div 64"))
        .withColumn("universe", lit(tag))
    }
    val base = log(spark, dir)
    // 'raw' audits the SHIPPED sketch's universe (heavy_hitters_sketch's
    // own key — presence is vacuous there but no-overcount/bound are
    // live); 'skewed' exercises presence with live heavy hitters.
    branch(base.withColumn("hk", col("k")), "raw")
      .unionByName(branch(base.withColumn("hk",
        when(pmod(col("k").cast("long"), lit(3L)) === 0L,
          concat(lit("hot"), pmod(col("k").cast("long"), lit(8L))))
          .otherwise(col("k"))), "skewed"))
  }

  /** DeleteRecords (/root/reference/kafka-impl/.../AdminManager.java):
    * truncate each partition before a requested offset; report the new
    * earliest offset and surviving count.
    */
  def deleteRecords(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .filter(col("offs") >= 50L)
      .groupBy("topic", "part")
      .agg(
        min("offs").as("new_earliest"),
        count(lit(1)).as("n_remaining"),
        (max("offs") + 1L).as("log_end"))

  /** Byte-bounded fetch: records from a start offset until the cumulative
    * response size exceeds maxBytes (FetchRequest max_bytes semantics —
    * the running sum is the declarative form of the reference's
    * DelayedFetch accumulation loop).
    */
  def fetchMaxBytes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("topic", "part").orderBy("offs")
      .rowsBetween(Window.unboundedPreceding, 0)
    log(spark, dir)
      .filter(col("offs") >= 10L)
      .withColumn("rec_bytes", length(col("v")) + length(col("k")) + lit(16))
      .withColumn("cum_bytes", sum("rec_bytes").over(w).cast("long"))
      // Kafka always returns at least the first record past the start
      // offset so consumers can make progress even past the byte cap.
      .filter(col("cum_bytes") <= 4096L || col("cum_bytes") === col("rec_bytes"))
      .select(col("topic"), col("part"), col("offs"), col("event_id"),
        col("rec_bytes").cast("long").as("rec_bytes"), col("cum_bytes"))
  }

  /** DelayedFetch purgatory accounting
    * (/root/reference/kafka-impl/.../DelayedFetch.java,
    * DelayedProduceAndFetch.java): a consumer polling each partition once
    * per second completes immediately when the interval delivered at least
    * fetch.min.bytes (1024), otherwise the request parks in the purgatory
    * and times out at fetch.max.wait. Per partition: poll intervals,
    * immediate completions, parked fetches, and the byte backlog profile.
    */
  def fetchWait(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .withColumn("sec", expr("tms div 1000"))
      .withColumn("rec_bytes",
        (length(col("v")) + length(col("k")) + lit(16)).cast("long"))
      .groupBy("topic", "part", "sec")
      .agg(sum("rec_bytes").cast("long").as("bytes"))
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n_polls"),
        sum(when(col("bytes") >= 1024L, 1L).otherwise(0L)).as("n_immediate"),
        sum(when(col("bytes") < 1024L, 1L).otherwise(0L)).as("n_parked"),
        max("bytes").as("max_interval_bytes"),
        sum("bytes").cast("long").as("total_bytes"))

  /** Produce-ack purgatory (DelayedProduceAndFetch.java — the produce
    * twin of [[fetchWait]]'s DelayedFetch): with acks=all, each produce
    * batch (the records of one (topic, part, second)) parks until both
    * followers ack; follower ack latency is a deterministic md5 draw
    * under 250 ms, the batch completes at the slower follower, and the
    * 200 ms request timeout expires stragglers (`onExpiration`). Per
    * partition: batches completed vs expired, the wait tail, and the
    * total parked time (waits capped at the timeout, as the purgatory
    * caps them).
    *
    * Scale: same shape as fetch_wait — one (topic, part, sec) partial
    * aggregate, then closed-form per-batch arithmetic.
    */
  /** Follower-ack latency draw of one produce batch (keyed by the batch's
    * (topic, part, sec) columns; `f` names the follower) — ONE spelling
    * shared by [[delayedProduce]] and BrokerOps.purgatoryWatchers so the
    * two purgatory views sample identical ack latencies.
    */
  private[log] def ackDraw(f: String): org.apache.spark.sql.Column =
    pmod(md5Long(concat_ws("#",
      col("topic"), col("part"), col("sec"), lit(f))), lit(250L))

  def delayedProduce(spark: SparkSession, dir: String): DataFrame = {
    def ack(f: String) = ackDraw(f)
    log(spark, dir)
      .withColumn("sec", expr("tms div 1000"))
      .groupBy("topic", "part", "sec")
      .agg(count(lit(1)).as("n_recs"))
      .withColumn("wait_ms", greatest(ack("1"), ack("2")))
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n_batches"),
        sum("n_recs").cast("long").as("n_records"),
        sum(when(col("wait_ms") <= 200L, 1L).otherwise(0L)).cast("long")
          .as("n_completed"),
        sum(when(col("wait_ms") > 200L, 1L).otherwise(0L)).cast("long")
          .as("n_expired"),
        max("wait_ms").as("max_wait_ms"),
        sum(least(col("wait_ms"), lit(200L))).cast("long").as("sum_wait_ms"))
  }

  /** Messages/bytes-in per topic per hour (the reference's RequestStats
    * throughput counters as a time-bucketed rollup).
    */
  def topicThroughput(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .withColumn("hour_ms", expr("(tms div 3600000) * 3600000"))
      .groupBy("topic", "hour_ms")
      .agg(
        count(lit(1)).as("n_msgs"),
        sum(length(col("v")) + length(col("k")) + lit(16)).cast("long")
          .as("bytes_in"),
        dsum(money(col("val"))).as("sum_val"))

  /** Per-topic value percentiles via the nearest-rank method (integer rank
    * selection, so results are exact and engine-identical — interpolating
    * percentile implementations differ in floating-point order). Models the
    * reference's latency histograms (stats/DataSketchesOpStatsLogger.java).
    *
    * Scale: count-compressed. The value at rank ceil(n*p) in value order is
    * the smallest value whose cumulative count reaches that rank, so the
    * full-data sort window is replaced by (a) a map-side-combinable
    * `(topic, val) → count` aggregate — the shuffle carries the compressed
    * distribution, not records — and (b) a running-sum rank over that tiny
    * frame. Identical output, but the per-topic sort now touches distinct
    * values only (parallelism no longer collapses to |topics| tasks each
    * sorting the full log at 100 TB).
    */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame = {
    val dist = log(spark, dir)
      .groupBy("topic", "val").agg(count(lit(1)).as("cnt"))
    val cw = Window.partitionBy("topic").orderBy("val")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = dist
      .withColumn("cum", sum("cnt").over(cw))
      .withColumn("n", sum("cnt").over(Window.partitionBy("topic")))
    def pick(p: Double) =
      min(when(col("cum") >= expr(s"CAST(ceil(n * $p) AS BIGINT)"), col("val")))
    ranked.groupBy("topic").agg(
      pick(0.5).as("p50"), pick(0.95).as("p95"), pick(0.99).as("p99"),
      max("val").as("p100"))
  }

  /** Encoded-size accounting under the reference's entry formats
    * (format/KafkaV1EntryFormatter.java vs format/PulsarEntryFormatter.java):
    * v1 pays per-record overhead, v2/pulsar amortizes a batch header.
    */
  def formatSizes(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .withColumn("payload", length(col("v")) + length(col("k")))
      .groupBy("topic", "part")
      .agg(
        count(lit(1)).as("n"),
        (sum(col("payload") + lit(34))).cast("long").as("bytes_v1"),
        (lit(61L) + sum(col("payload") + lit(12))).cast("long").as("bytes_v2"))

  /** Produce-path compression-codec accounting: per append batch (the
    * 100-record granularity [[offsetTranslate]] models), the producer's
    * source codec, the topic's broker compression config, the resulting
    * target codec, and the in-place vs re-compress decision with modeled
    * wire/stored sizes — KopLogValidator.validateMessagesAndAssignOffsets
    * (/root/reference/kafka-impl/.../utils/KopLogValidator.java:47-216:
    * `inPlaceAssignment = sourceCodec == targetCodec && toMagic > V0`,
    * with a record-magic mismatch forcing full re-encode) plus
    * getSourceCodec/getTargetCodec (:495-519 — a broker compression type
    * of 'none' KEEPS the producer codec; anything else re-targets) and
    * the per-batch codec sniff in storage/PartitionLog.java:1026-1061.
    * Codec/magic/config draws are md5 coins (the sasl_flow universe
    * discipline); compression ratios are fixed model constants (none
    * 100, snappy 62, lz4 57, gzip 45, zstd 38 pct), so every byte count
    * is integer-exact and oracle-checkable.
    *
    * Scale: the batch rollup shuffles on the SAME (topic, part) keys as
    * the offset window (co-keyed, no extra wide exchange); the codec
    * rollup then aggregates the |batches|-sized frame down to at most
    * |topics|·5·5 rows — partial-aggregated, no state growth.
    */
  def codecRecompress(spark: SparkSession, dir: String): DataFrame = {
    def codecName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c <= 4L, "none").when(c <= 6L, "snappy").when(c === 7L, "lz4")
        .when(c === 8L, "zstd").otherwise("gzip")
    def ratio(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(name === "none", 100L).when(name === "snappy", 62L)
        .when(name === "lz4", 57L).when(name === "gzip", 45L)
        .otherwise(38L)
    log(spark, dir)
      .withColumn("batch_id", expr("offs div 100"))
      .groupBy("topic", "part", "batch_id")
      .agg(
        count(lit(1)).as("n_recs"),
        sum(length(col("v")) + length(col("k")) + lit(12)).cast("long")
          .as("rec_bytes"))
      .withColumn("raw_bytes", col("rec_bytes") + lit(61L))
      .withColumn("source_codec", codecName(pmod(md5Long(concat_ws("#",
        lit("codec"), col("topic"), col("part"), col("batch_id"))),
        lit(10L))))
      .withColumn("conf_coin",
        pmod(md5Long(concat(lit("codecconf#"), col("topic"))), lit(5L)))
      .withColumn("broker_codec",
        when(col("conf_coin") <= 2L, "none")
          .when(col("conf_coin") === 3L, "zstd").otherwise("lz4"))
      .withColumn("target_codec",
        when(col("broker_codec") === "none", col("source_codec"))
          .otherwise(col("broker_codec")))
      .withColumn("magic",
        when(pmod(md5Long(concat_ws("#", lit("magic"), col("topic"),
          col("part"), col("batch_id"))), lit(10L)) === 0L, 0L)
          .when(pmod(md5Long(concat_ws("#", lit("magic"), col("topic"),
            col("part"), col("batch_id"))), lit(10L)) <= 2L, 1L)
          .otherwise(2L))
      .withColumn("in_place",
        col("source_codec") === col("target_codec") && col("magic") === 2L)
      .withColumn("src_ratio", ratio(col("source_codec")))
      .withColumn("tgt_ratio", ratio(col("target_codec")))
      .withColumn("wire_bytes", expr("(raw_bytes * src_ratio) div 100"))
      .withColumn("stored_bytes",
        when(col("in_place"), col("wire_bytes"))
          .otherwise(expr("(raw_bytes * tgt_ratio) div 100")))
      .groupBy("topic", "source_codec", "target_codec")
      .agg(
        count(lit(1)).as("n_batches"),
        sum("n_recs").cast("long").as("n_records"),
        sum(when(col("in_place"), 1L).otherwise(0L)).cast("long")
          .as("n_in_place"),
        sum(when(col("in_place"), 0L).otherwise(1L)).cast("long")
          .as("n_recompressed"),
        sum("wire_bytes").cast("long").as("wire_bytes"),
        sum("stored_bytes").cast("long").as("stored_bytes"))
  }

  /** Event-time out-of-orderness per topic: lateness of each record vs the
    * running event-time maximum in arrival order — the statistic that
    * justifies a streaming watermark delay (withWatermark("ets", X) is safe
    * iff X covers the observed lateness tail).
    */
  /* Scale notes for [[watermarkLateness]]:
   * - The arrival-order running max is a parallel prefix scan: running max
   *   within fixed event_id chunks (parallelism topics × chunks), then an
   *   exclusive running max over the tiny per-chunk maxima frame, broadcast
   *   back. Exact — max(in-chunk running max, max of all prior chunks) IS
   *   the global running max.
   * - The p95 is count-compressed nearest-rank (same discipline as
   *   [[valuePercentiles]]): aggregate `(topic, late_ms) → count` map-side,
   *   rank over running sums of the compressed lateness distribution.
   */
  def watermarkLateness(spark: SparkSession, dir: String): DataFrame = {
    val chunkSize = 8192L
    val base = log(spark, dir)
      .withColumn("chunk", expr(s"event_id div $chunkSize"))
    val inChunk = Window.partitionBy("topic", "chunk").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val chunkPrefix = Window.partitionBy("topic").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = base.groupBy("topic", "chunk").agg(max("tms").as("cmax"))
      .withColumn("prev_max", max("cmax").over(chunkPrefix))
      .select("topic", "chunk", "prev_max")
    val late = base
      .withColumn("local_max", max("tms").over(inChunk))
      .join(broadcast(prefix), Seq("topic", "chunk"))
      // greatest() ignores NULL (first chunk has no predecessor).
      .withColumn("late_ms", greatest(col("local_max"), col("prev_max")) - col("tms"))
    val dist = late.groupBy("topic", "late_ms").agg(count(lit(1)).as("cnt"))
    val cw = Window.partitionBy("topic").orderBy("late_ms")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = dist
      .withColumn("cum", sum("cnt").over(cw))
      .withColumn("n", sum("cnt").over(Window.partitionBy("topic")))
    ranked.groupBy("topic").agg(
      sum("cnt").cast("long").as("n_events"),
      sum(when(col("late_ms") > 0L, col("cnt")).otherwise(0L)).cast("long").as("n_late"),
      max("late_ms").as("max_late_ms"),
      min(when(col("cum") >= expr("CAST(ceil(n * 0.95) AS BIGINT)"), col("late_ms")))
        .as("p95_late_ms"))
  }

  /** Bounded-size heavy-hitter summary per topic via the Misra-Gries
    * aggregator (graft.functions.HeavyHitters): at most k-1 counters per
    * topic cross the shuffle regardless of key cardinality — the sketch
    * form of [[topKeysPerTopic]] for when the exact per-key groupBy is
    * itself the skew hazard. Rows-only check (summary contents depend on
    * merge order below the guarantee threshold); HeavyHitterSpec pins the
    * epsilon guarantee against exact counts.
    */
  def heavyHittersSketch(spark: SparkSession, dir: String): DataFrame = {
    val mg = graft.functions.HeavyHitters.mgSketch(64)
    log(spark, dir)
      .groupBy("topic").agg(mg(col("k")).as("sketch"))
      .select(col("topic"), explode(col("sketch")).as(Seq("k", "est")))
  }

  /** Change-data-capture view of the log: each record paired with the
    * key's previous value in offset order — the materialization a
    * Kafka-Connect CDC consumer builds from a compacted topic (op = I for
    * a key's first record, U after). One window on the same (topic, part)
    * partitioning the log view already has; the per-key ordering is a
    * sort within it, no extra exchange.
    * Ref: Kafka compacted-topic CDC semantics; storage/PartitionLog.java
    * append path (compact's ordering rule reused).
    */
  def cdcView(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("topic", "part", "k").orderBy("offs")
    log(spark, dir)
      .withColumn("prev_v", lag("v", 1).over(w))
      // op from the version rank, not prev_v nullability — a NULL value
      // (tombstone) must not make its successor look like an insert.
      .withColumn("op",
        when(row_number().over(w) === 1, "I").otherwise("U"))
      .select("topic", "part", "k", "offs", "v", "prev_v", "op")
  }

  /** Watermark policy simulation: for candidate watermark delays, the
    * records a streaming job would drop as too-late (lateness vs the
    * running event-time maximum in arrival order — the same statistic
    * watermark_lateness reports a tail for). The table that picks
    * `withWatermark`'s delay: the smallest delay whose drop count is
    * acceptable. One pass, three conditional sums.
    */
  def watermarkPolicy(spark: SparkSession, dir: String): DataFrame = {
    // The running event-time maximum is a per-topic PREFIX MAX in
    // arrival order; topics are few, so the naive window would funnel
    // each topic through one task. Prefix max decomposes over
    // order-preserving event_id-range buckets exactly like the seq_pack
    // prefix sum: per-bucket maxima rolled into a running max on the
    // 65536x-compressed bucket frame, then an in-bucket running max,
    // combined with greatest().
    val d = log(spark, dir).withColumn("bkt", expr("event_id div 65536"))
    val bmax = d.groupBy("topic", "bkt").agg(max("tms").as("bm"))
      .withColumn("pmax",
        max("bm").over(Window.partitionBy("topic").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("topic", "bkt", "pmax")
    val inBkt = Window.partitionBy("topic", "bkt").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.join(bmax, Seq("topic", "bkt"))
      .withColumn("rmax", greatest(
        coalesce(col("pmax"), col("tms")), max("tms").over(inBkt)))
      .withColumn("late_ms", col("rmax") - col("tms"))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_ms") > 300000L, 1L).otherwise(0L))
          .as("dropped_5m"),
        sum(when(col("late_ms") > 900000L, 1L).otherwise(0L))
          .as("dropped_15m"),
        sum(when(col("late_ms") > 3600000L, 1L).otherwise(0L))
          .as("dropped_1h"))
  }

  /** Heavy-hitter keys: top-5 keys by record count per topic. */
  def topKeysPerTopic(spark: SparkSession, dir: String): DataFrame = {
    val counts = log(spark, dir).groupBy("topic", "k").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("topic").orderBy(col("n").desc, col("k"))
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** Partition skew report: per-topic record-count imbalance across
    * partitions (max/avg skew factor) — the signal that triggers salting or
    * key redesign before a hot partition melts an executor at scale.
    */
  def partitionSkew(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .groupBy("topic", "part").agg(count(lit(1)).as("n"))
      .groupBy("topic")
      .agg(
        min("n").as("min_n"),
        max("n").as("max_n"),
        sum("n").cast("long").as("total"),
        count(lit(1)).as("n_parts"))
      .withColumn("skew",
        col("max_n") / (col("total") / col("n_parts")))

  /** Peak-rate minute per topic (ties kept via scalar-max equality). */
  def peakMinute(spark: SparkSession, dir: String): DataFrame = {
    // One scan: the per-topic max is a whole-partition window over the
    // (topic, minute) count frame (time-bounded metadata), replacing the
    // join shape that re-derived the count frame for the max side — the
    // plan had TWO scans + three exchanges; this has one scan and the
    // window's own metadata-frame exchange (guide §2.4).
    val perMin = logBase(spark, dir)
      .withColumn("minute_ms", expr("(tms div 60000) * 60000"))
      .groupBy("topic", "minute_ms").agg(count(lit(1)).as("n"))
    perMin
      .withColumn("best", max("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("topic")))
      .filter(col("n") === col("best"))
      .select("topic", "minute_ms", "n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "partition_skew" -> partitionSkew,
    "peak_minute" -> peakMinute,
    "watermark_lateness" -> watermarkLateness,
    "top_keys_per_topic" -> topKeysPerTopic,
    "value_percentiles" -> valuePercentiles,
    "format_sizes" -> formatSizes,
    "log_view" -> logView,
    "fetch" -> fetch,
    "list_offsets" -> listOffsets,
    "offsets_for_times" -> offsetsForTimes,
    "offsets_for_publish_time" -> offsetsForPublishTime,
    "offsets_for_max_ts" -> offsetsForMaxTs,
    "compact" -> compact,
    "retention" -> retention,
    "validate_records" -> validateRecords,
    "topic_throughput" -> topicThroughput,
    "offset_translate" -> offsetTranslate,
    "multi_ledger_fetch" -> multiLedgerFetch,
    "heavy_hitters_guarantees" -> heavyHittersGuarantees,
    "delete_records" -> deleteRecords,
    "fetch_max_bytes" -> fetchMaxBytes,
    "fetch_wait" -> fetchWait,
    "delayed_produce" -> delayedProduce,
    "cdc_view" -> cdcView,
    "watermark_policy" -> watermarkPolicy,
    "codec_recompress" -> codecRecompress,
    "heavy_hitters_sketch" -> heavyHittersSketch)

  /** The retention policy constants — shared by [[retention]] (Scala),
    * [[survivorsSql]] (SQL), and BrokerOps' segment views, so the window
    * cannot be tuned on one side of the engine/oracle boundary only.
    */
  private[graft] val RetentionCutoffMs = 1704672000000L // 2024-01-08
  private[graft] val RetentionMaxRecords = 500L

  /** The retention survivor set as a SQL derived table over `log` — the
    * ONE SQL-side spelling of the time+size retention policy (the Scala
    * sides compose [[retention]]; Groups' offset_reset oracle composes
    * this, so a policy change cannot update one side only).
    */
  private[graft] val survivorsSql: String =
    s"""(SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, part
      |      ORDER BY offs DESC) AS rn_end FROM log)
      |  WHERE tms >= $RetentionCutoffMs
      |    AND rn_end <= $RetentionMaxRecords)""".stripMargin

  val oracles: Map[String, String] = Map(
    "codec_recompress" -> (logSqlCte +
      s"""pb AS (
        |  SELECT topic, part, offs // 100 AS batch_id, COUNT(*) AS n_recs,
        |    CAST(SUM(length(v) + length(k) + 12) AS BIGINT) + 61
        |      AS raw_bytes
        |  FROM log GROUP BY topic, part, offs // 100),
        |coins AS (
        |  SELECT *,
        |    ${md5LongSql("'codec#' || topic || '#' || part || '#' || batch_id")} % 10 AS sc,
        |    ${md5LongSql("'codecconf#' || topic")} % 5 AS cc,
        |    ${md5LongSql("'magic#' || topic || '#' || part || '#' || batch_id")} % 10 AS mg
        |  FROM pb),
        |drawn AS (
        |  SELECT *,
        |    CASE WHEN sc <= 4 THEN 'none' WHEN sc <= 6 THEN 'snappy'
        |      WHEN sc = 7 THEN 'lz4' WHEN sc = 8 THEN 'zstd'
        |      ELSE 'gzip' END AS source_codec,
        |    CASE WHEN cc <= 2 THEN 'none' WHEN cc = 3 THEN 'zstd'
        |      ELSE 'lz4' END AS broker_codec,
        |    CASE WHEN mg = 0 THEN 0 WHEN mg <= 2 THEN 1 ELSE 2 END AS magic
        |  FROM coins),
        |sized AS (
        |  SELECT *,
        |    CASE WHEN broker_codec = 'none' THEN source_codec
        |      ELSE broker_codec END AS target_codec,
        |    (source_codec = CASE WHEN broker_codec = 'none'
        |        THEN source_codec ELSE broker_codec END
        |      AND magic = 2) AS in_place,
        |    CASE source_codec WHEN 'none' THEN 100 WHEN 'snappy' THEN 62
        |      WHEN 'lz4' THEN 57 WHEN 'gzip' THEN 45 ELSE 38 END
        |      AS src_ratio,
        |    CASE CASE WHEN broker_codec = 'none' THEN source_codec
        |        ELSE broker_codec END
        |      WHEN 'none' THEN 100 WHEN 'snappy' THEN 62 WHEN 'lz4' THEN 57
        |      WHEN 'gzip' THEN 45 ELSE 38 END AS tgt_ratio
        |  FROM drawn)
        |SELECT topic, source_codec, target_codec,
        |  COUNT(*) AS n_batches,
        |  CAST(SUM(n_recs) AS BIGINT) AS n_records,
        |  CAST(SUM(CASE WHEN in_place THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_in_place,
        |  CAST(SUM(CASE WHEN in_place THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_recompressed,
        |  CAST(SUM((raw_bytes * src_ratio) // 100) AS BIGINT) AS wire_bytes,
        |  CAST(SUM(CASE WHEN in_place THEN (raw_bytes * src_ratio) // 100
        |    ELSE (raw_bytes * tgt_ratio) // 100 END) AS BIGINT)
        |    AS stored_bytes
        |FROM sized GROUP BY topic, source_codec, target_codec""".stripMargin),
    "partition_skew" -> (logSql +
      """SELECT topic, min_n, max_n, total, n_parts,
        |  max_n / (total / n_parts) AS skew
        |FROM (
        |  SELECT topic, MIN(n) AS min_n, MAX(n) AS max_n,
        |    CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_parts
        |  FROM (SELECT topic, part, COUNT(*) AS n FROM log GROUP BY topic, part)
        |  GROUP BY topic)""".stripMargin),
    "peak_minute" -> (logSql +
      """, pm AS (
        |  SELECT topic, (tms // 60000) * 60000 AS minute_ms, COUNT(*) AS n
        |  FROM log GROUP BY topic, (tms // 60000) * 60000),
        |best AS (SELECT topic, MAX(n) AS best FROM pm GROUP BY topic)
        |SELECT pm.topic, minute_ms, n
        |FROM pm JOIN best ON pm.topic = best.topic AND pm.n = best.best""".stripMargin),
    "watermark_lateness" -> (logSql +
      """, late AS (
        |  SELECT topic, event_id,
        |    MAX(tms) OVER (PARTITION BY topic ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tms AS late_ms
        |  FROM log),
        |ranked AS (
        |  SELECT topic, late_ms,
        |    ROW_NUMBER() OVER (PARTITION BY topic ORDER BY late_ms, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY topic) AS n
        |  FROM late)
        |SELECT topic, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  MAX(late_ms) AS max_late_ms,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN late_ms END)
        |    AS p95_late_ms
        |FROM ranked GROUP BY topic""".stripMargin),
    "top_keys_per_topic" -> (logSql +
      """, counts AS (
        |  SELECT topic, k, COUNT(*) AS n FROM log GROUP BY topic, k)
        |SELECT topic, k, n, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY topic
        |    ORDER BY n DESC, k) AS rnk FROM counts)
        |WHERE rnk <= 5""".stripMargin),
    "value_percentiles" -> (logSql +
      """, ranked AS (
        |  SELECT topic, val,
        |    ROW_NUMBER() OVER (PARTITION BY topic ORDER BY val, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY topic) AS n
        |  FROM log)
        |SELECT topic,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN val END) AS p50,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN val END) AS p95,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN val END) AS p99,
        |  MAX(val) AS p100
        |FROM ranked GROUP BY topic""".stripMargin),
    "format_sizes" -> (logSql +
      """SELECT topic, part, COUNT(*) AS n,
        |  CAST(SUM(length(v) + length(k) + 34) AS BIGINT) AS bytes_v1,
        |  CAST(61 + SUM(length(v) + length(k) + 12) AS BIGINT) AS bytes_v2
        |FROM log GROUP BY topic, part""".stripMargin),
    "log_view" -> (logSql +
      "SELECT topic, part, offs, event_id, tms, k, v FROM log"),
    "fetch" -> (logSql +
      """SELECT topic, part, offs, event_id, tms, k, v FROM log
        |WHERE topic = 'click' AND offs >= 100 AND offs < 200""".stripMargin),
    "list_offsets" -> (logSql +
      """SELECT topic, part, MIN(offs) AS earliest, MAX(offs) + 1 AS log_end,
        |  COUNT(*) AS n, MIN(tms) AS earliest_ms, MAX(tms) AS latest_ms
        |FROM log GROUP BY topic, part""".stripMargin),
    "offsets_for_times" -> (logSql +
      """SELECT topic, part, MIN(offs) AS offs, MIN(tms) AS tms
        |FROM log WHERE tms >= 1705276800000 GROUP BY topic, part""".stripMargin),
    "offsets_for_publish_time" -> (logSqlCte +
      s"""pub AS (
        |  SELECT topic, part, offs, tms,
        |    tms + ${md5LongSql("('pub#' || event_id)")} % 3600000
        |      AS pub_ms
        |  FROM log)
        |SELECT topic, part,
        |  MIN(CASE WHEN tms >= $TimesTargetMs THEN offs END)
        |    AS offs_event_time,
        |  MIN(CASE WHEN pub_ms >= $TimesTargetMs THEN offs END)
        |    AS offs_publish_time,
        |  MIN(CASE WHEN pub_ms >= $TimesTargetMs THEN pub_ms END)
        |    AS first_pub_ms,
        |  CAST(SUM(CASE WHEN pub_ms >= $TimesTargetMs
        |    AND tms < $TimesTargetMs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pub_only,
        |  CAST(CASE WHEN COALESCE(MIN(CASE WHEN tms >= $TimesTargetMs
        |      THEN offs END), -1) <>
        |    COALESCE(MIN(CASE WHEN pub_ms >= $TimesTargetMs
        |      THEN offs END), -1) THEN 1 ELSE 0 END AS BIGINT) AS differs
        |FROM pub GROUP BY topic, part""".stripMargin),
    "offsets_for_max_ts" -> (logSql +
      """SELECT topic, part, offs, tms AS max_tms FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, part
        |    ORDER BY tms DESC, offs ASC) AS rn FROM log)
        |WHERE rn = 1""".stripMargin),
    "compact" -> (logSql +
      """SELECT topic, part, k, offs, v, tms FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, part, k
        |    ORDER BY tms DESC, event_id DESC) AS rn FROM log)
        |WHERE rn = 1""".stripMargin),
    "retention" -> (logSql +
      s"""SELECT topic, part, COUNT(*) AS n_survive, MIN(offs) AS new_earliest,
        |  CAST(SUM(length(v) + length(k)) AS BIGINT) AS bytes
        |FROM $survivorsSql survivors
        |GROUP BY topic, part""".stripMargin),
    "validate_records" -> (logSql +
      """SELECT topic, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN (tms >= 1704067200000 AND tms < 1706400000000)
        |        AND (val >= 0.05 AND v IS NOT NULL) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(SUM(CASE WHEN NOT (tms >= 1704067200000 AND tms < 1706400000000)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid_ts,
        |  CAST(SUM(CASE WHEN (tms >= 1704067200000 AND tms < 1706400000000)
        |        AND NOT (val >= 0.05 AND v IS NOT NULL) THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid_val
        |FROM log GROUP BY topic""".stripMargin),
    "offset_translate" -> (logSql +
      """SELECT topic, part, offs, offs // 1000 AS ledger_id,
        |  (offs // 100) % 10 AS entry_id, offs % 100 AS batch_idx
        |FROM log WHERE topic = 'purchase'""".stripMargin),
    "multi_ledger_fetch" -> (logSqlCte +
      """pf AS (
        |  SELECT topic, part, offs // 30 AS fetch_id, COUNT(*) AS n_records,
        |    MIN(offs) AS first_offs, MAX(offs) AS last_offs,
        |    CAST(COUNT(DISTINCT offs // 10) AS BIGINT) AS n_entries,
        |    CAST(COUNT(DISTINCT offs // 50) AS BIGINT) AS n_ledgers
        |  FROM log GROUP BY 1, 2, 3),
        |pp AS (
        |  SELECT topic, part, COUNT(*) AS n_fetches_part,
        |    CAST(SUM(n_ledgers - 1) AS BIGINT) AS total_crossings_part,
        |    CAST(SUM(CASE WHEN n_ledgers > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_crossing_fetches
        |  FROM pf GROUP BY 1, 2)
        |SELECT pf.topic, pf.part, fetch_id, n_records, first_offs,
        |  last_offs, n_entries, n_ledgers, n_ledgers - 1 AS n_crossings,
        |  n_fetches_part, total_crossings_part,
        |  (10000 * n_crossing_fetches) // n_fetches_part AS crossing_rate_bp
        |FROM pf JOIN pp USING (topic, part)""".stripMargin),
    "heavy_hitters_guarantees" -> (logSqlCte +
      """hklr AS (
        |  SELECT topic, k AS hk FROM log),
        |tkr AS (
        |  SELECT topic, hk, COUNT(*) AS n_true FROM hklr GROUP BY 1, 2),
        |ttr AS (
        |  SELECT topic, CAST(SUM(n_true) AS BIGINT) AS n_records
        |  FROM tkr GROUP BY 1),
        |hkls AS (
        |  SELECT topic,
        |    CASE WHEN CAST(k AS BIGINT) % 3 = 0
        |      THEN 'hot' || (CAST(k AS BIGINT) % 8)
        |      ELSE k END AS hk
        |  FROM log),
        |tks AS (
        |  SELECT topic, hk, COUNT(*) AS n_true FROM hkls GROUP BY 1, 2),
        |tts AS (
        |  SELECT topic, CAST(SUM(n_true) AS BIGINT) AS n_records
        |  FROM tks GROUP BY 1)
        |SELECT topic, n_records,
        |  CAST(SUM(CASE WHEN n_true * 64 > n_records THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_true_heavy,
        |  CAST(0 AS BIGINT) AS n_true_heavy_missing,
        |  CAST(0 AS BIGINT) AS n_overcount,
        |  CAST(0 AS BIGINT) AS n_bound_violations,
        |  n_records // 64 AS error_budget,
        |  'raw' AS universe
        |FROM tkr JOIN ttr USING (topic)
        |GROUP BY topic, n_records
        |UNION ALL
        |SELECT topic, n_records,
        |  CAST(SUM(CASE WHEN n_true * 64 > n_records THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_true_heavy,
        |  CAST(0 AS BIGINT) AS n_true_heavy_missing,
        |  CAST(0 AS BIGINT) AS n_overcount,
        |  CAST(0 AS BIGINT) AS n_bound_violations,
        |  n_records // 64 AS error_budget,
        |  'skewed' AS universe
        |FROM tks JOIN tts USING (topic)
        |GROUP BY topic, n_records""".stripMargin),
    "delete_records" -> (logSql +
      """SELECT topic, part, MIN(offs) AS new_earliest, COUNT(*) AS n_remaining,
        |  MAX(offs) + 1 AS log_end
        |FROM log WHERE offs >= 50 GROUP BY topic, part""".stripMargin),
    "delayed_produce" -> (logSqlCte +
      s"""batches AS (
        |  SELECT topic, part, tms // 1000 AS sec, COUNT(*) AS n_recs
        |  FROM log GROUP BY topic, part, tms // 1000),
        |waits AS (
        |  SELECT topic, part, n_recs,
        |    GREATEST(
        |      ${md5LongSql(
             "topic || '#' || CAST(part AS VARCHAR) || '#' || CAST(sec AS VARCHAR) || '#1'")} % 250,
        |      ${md5LongSql(
             "topic || '#' || CAST(part AS VARCHAR) || '#' || CAST(sec AS VARCHAR) || '#2'")} % 250)
        |      AS wait_ms
        |  FROM batches)
        |SELECT topic, part, COUNT(*) AS n_batches,
        |  CAST(SUM(n_recs) AS BIGINT) AS n_records,
        |  CAST(SUM(CASE WHEN wait_ms <= 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_completed,
        |  CAST(SUM(CASE WHEN wait_ms > 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_expired,
        |  MAX(wait_ms) AS max_wait_ms,
        |  CAST(SUM(LEAST(wait_ms, 200)) AS BIGINT) AS sum_wait_ms
        |FROM waits GROUP BY topic, part""".stripMargin),
    "fetch_max_bytes" -> (logSql +
      """SELECT topic, part, offs, event_id,
        |  CAST(rec_bytes AS BIGINT) AS rec_bytes, CAST(cum_bytes AS BIGINT) AS cum_bytes
        |FROM (
        |  SELECT topic, part, offs, event_id,
        |    length(v) + length(k) + 16 AS rec_bytes,
        |    SUM(length(v) + length(k) + 16) OVER (PARTITION BY topic, part
        |      ORDER BY offs ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bytes
        |  FROM log WHERE offs >= 10)
        |WHERE cum_bytes <= 4096 OR cum_bytes = rec_bytes""".stripMargin),
    "watermark_policy" -> (logSql +
      """, late AS (
        |  SELECT topic,
        |    MAX(tms) OVER (PARTITION BY topic ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tms AS late_ms
        |  FROM log)
        |SELECT topic, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN late_ms > 300000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_5m,
        |  CAST(SUM(CASE WHEN late_ms > 900000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_15m,
        |  CAST(SUM(CASE WHEN late_ms > 3600000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_1h
        |FROM late GROUP BY topic""".stripMargin),
    "cdc_view" -> (logSql +
      """SELECT topic, part, k, offs, v,
        |  LAG(v) OVER (PARTITION BY topic, part, k ORDER BY offs) AS prev_v,
        |  CASE WHEN ROW_NUMBER() OVER (PARTITION BY topic, part, k
        |    ORDER BY offs) = 1 THEN 'I' ELSE 'U' END AS op
        |FROM log""".stripMargin),
    "fetch_wait" -> (logSql +
      """SELECT topic, part, COUNT(*) AS n_polls,
        |  CAST(SUM(CASE WHEN bytes >= 1024 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_immediate,
        |  CAST(SUM(CASE WHEN bytes < 1024 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_parked,
        |  MAX(bytes) AS max_interval_bytes,
        |  CAST(SUM(bytes) AS BIGINT) AS total_bytes
        |FROM (
        |  SELECT topic, part, tms // 1000 AS sec,
        |    CAST(SUM(length(v) + length(k) + 16) AS BIGINT) AS bytes
        |  FROM log GROUP BY topic, part, tms // 1000)
        |GROUP BY topic, part""".stripMargin),
    "topic_throughput" -> (logSql +
      """SELECT topic, (tms // 3600000) * 3600000 AS hour_ms,
        |  COUNT(*) AS n_msgs,
        |  CAST(SUM(length(v) + length(k) + 16) AS BIGINT) AS bytes_in,
        |  CAST(SUM(CAST(val AS DECIMAL(10,2))) AS DOUBLE) AS sum_val
        |FROM log GROUP BY topic, (tms // 3600000) * 3600000""".stripMargin))
}
