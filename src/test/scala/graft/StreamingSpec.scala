package graft

import graft.log.LogOps
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming paths produce the same results as their batch equivalents. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  test("windowed agg: stream == batch") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.windowedAgg(stream).writeStream
      .outputMode("complete")
      .format("memory").queryName("graft_win_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_win_stream")
      .select(col("win_ms"), col("event_type"), col("n"), col("sum_val"))
    val want = Streams.streamWindowAgg(spark, dir)
      .select(col("win_ms"), col("event_type"), col("n"), col("sum_val"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("session windows: stream == batch") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.sessionAgg(stream).writeStream
      .outputMode("complete")
      .format("memory").queryName("graft_session_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_session_stream")
    val want = Streams.sessionAgg(Tables.t(spark, dir, "events"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming read_committed filter == batch aborted-txn predicate") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.readCommittedStream(stream)
      .select("event_id", "txn_id").writeStream
      .outputMode("append").format("memory").queryName("graft_rc_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_rc_stream")
    val want = Tables.t(spark, dir, "events")
      .withColumn("txn_id", pmod(col("event_id"), lit(64L)))
      .filter(!substring(md5(col("txn_id").cast("string")), 1, 1)
        .isin("0", "1", "2"))
      .select("event_id", "txn_id")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // and the kept count matches the batch readCommitted rollup
    val batchTotal = txn.Transactions.readCommitted(spark, dir)
      .agg(sum("n_committed")).head.getLong(0)
    assert(got.count() == batchTotal)
  }

  test("streaming exact dedup == batch distinct") {
    val stream = Streams.tableStream(spark, dir, "documents")
    val q = stream.select(col("doc_id"), md5(col("text")).as("h"))
      .dropDuplicates("h")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_dedup_stream").count()
    val want = Tables.t(spark, dir, "documents")
      .select(md5(col("text"))).distinct().count()
    assert(got == want)
  }

  test("streaming PII audit == batch pii_scrub") {
    val stream = Streams.tableStream(spark, dir, "documents")
    val q = Streams.piiScrubStream(stream).writeStream
      .outputMode("complete").format("memory").queryName("graft_pii_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_pii_stream")
    val want = llm.Curation.piiScrub(spark, dir)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("streaming contamination screen == batch decontaminate") {
    val stream = Streams.tableStream(spark, dir, "documents")
    val q = Streams.decontaminateStream(spark, dir, stream).writeStream
      .outputMode("complete").format("memory")
      .queryName("graft_decon_stream").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_decon_stream")
    val want = llm.Dedup.decontaminate(spark, dir)
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("streaming quality gate == batch corpus_filter per-reason counts") {
    val stream = Streams.tableStream(spark, dir, "documents")
    val q = Streams.qualityGateStream(stream).writeStream
      .outputMode("append").format("memory").queryName("graft_qgate_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_qgate_stream")
    // every doc gets exactly one verdict
    assert(got.count() == Tables.t(spark, dir, "documents").count())
    // duplicate texts share one quality verdict, so per-reason counts are
    // batch-exact no matter which replica the stream kept
    val gotCounts = got.groupBy("reason").count()
    val wantCounts = llm.TextAnalysis.corpusFilter(spark, dir)
      .groupBy("reason").count()
    assert(gotCounts.exceptAll(wantCounts).count() == 0 &&
      wantCounts.exceptAll(gotCounts).count() == 0)
  }

  test("sliding stream windows match batch rolling_throughput") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.rollingThroughputStream(stream).writeStream
      .outputMode("complete").format("memory").queryName("graft_roll_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_roll_stream")
      .select("event_type", "minute", "roll_n")
    val want = analytics.Analytics.rollingThroughput(spark, dir)
      .select("event_type", "minute", "roll_n")
    // every batch minute has its sliding window, with the same count; the
    // stream additionally emits windows whose closing minute was silent
    assert(want.exceptAll(got).count() == 0)
    assert(got.count() >= want.count() && want.count() > 0)
  }

  test("streaming MAD alerts equal batch anomaly_minutes") {
    // sf0.001 minute counts are almost all 1 (dev = 0 everywhere), so the
    // alert set is empty there by construction; the sf0.01 corpus has real
    // spikes and exercises the threshold for real.
    val dir01 = "/root/testdata/sf0.01"
    val stream = Streams.tableStream(spark, dir01, "events")
    val q = Streams.anomalyAlertStream(spark, dir01, stream)
      .select("event_type", "minute", "n", "med", "mad", "dev")
      .writeStream
      .outputMode("complete").format("memory").queryName("graft_alert_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_alert_stream")
    val want = analytics.Analytics.anomalyMinutes(spark, dir01)
      .select("event_type", "minute", "n", "med", "mad", "dev")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    assert(want.count() > 0)
  }

  test("streaming transition feed aggregates to batch event_transitions") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.transitionsStream(stream).writeStream
      .outputMode("append").format("memory").queryName("graft_trans_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_trans_stream")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val want = analytics.Analytics.eventTransitions(spark, dir)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
  }

  test("watermarked producer-seq dedup == batch distinct (producer, seq)") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.producerDedupStream(stream)
      .select("producer_id", "seq").writeStream
      .outputMode("append").format("memory").queryName("graft_pdedup_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_pdedup_stream").count()
    val want = Tables.t(spark, dir, "events")
      .select(pmod(col("user_id"), lit(16L)), expr("event_id div 20"))
      .distinct().count()
    assert(got == want && got > 0)
  }

  test("stream-stream interval join == batch range_join_events") {
    def src() = Streams.tableStream(spark, dir, "events")
    val q = Streams.intervalJoinStream(src(), src()).writeStream
      .outputMode("append").format("memory").queryName("graft_ss_join").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_ss_join")
    val want = graft.analytics.Analytics.rangeJoinEvents(spark, dir)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("streaming READ_COMMITTED filter == batch aborted-txn filter") {
    val stream = Streams.tableStream(spark, dir, "events")
    // Stateless scan-side predicate — identical in batch and streaming.
    def committed(df: org.apache.spark.sql.DataFrame) = df.filter(
      !substring(md5(pmod(col("event_id"), lit(64L)).cast("string")), 1, 1)
        .isin("0", "1", "2"))
    val q = committed(stream).select("event_id").writeStream
      .outputMode("append").format("memory").queryName("graft_rc_stream").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_rc_stream").count()
    val want = committed(Tables.t(spark, dir, "events")).count()
    assert(got == want && got > 0)
  }

  test("timeout-closed streaming sessions match batch sessionize") {
    val stream = Streams.tableStream(spark, dir, "events")
    val q = Streams.sessionTimeoutStream(spark, stream).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sess_timeout").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_sess_timeout")
      .select("user_id", "start_ms", "end_ms", "n_events")
    val batch = analytics.Analytics.sessionize(spark, dir)
      .select("user_id", "start_ms", "end_ms", "n_events")
    // every emitted session is exactly a batch session...
    assert(got.exceptAll(batch).count() == 0)
    // ...and only each user's watermark-pending tail can be missing
    assert(got.count() >= batch.count() - batch.select("user_id").distinct().count())
    assert(got.count() > 0)
  }

  test("streaming ingest sink lands every event in the partitioned store") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val batches = Streams.runIngestStream(spark, dir, out)
    assert(batches >= 1)
    val landed = spark.read.parquet(out)
    assert(landed.count() == Tables.t(spark, dir, "events").count())
    assert(landed.select("topic").distinct().count() == 5)
  }

  test("streaming MG summary keeps the epsilon guarantee vs exact counts") {
    val k = 64
    val sketch = Streams.runStreamHeavyHitters(spark, dir, k)
    val exact = LogOps.log(spark, dir).groupBy("topic", "k")
      .agg(count(lit(1)).as("n"))
    val totals = exact.groupBy("topic").agg(sum("n").cast("long").as("total"))
    val joined = sketch.join(exact, Seq("topic", "k")).join(totals, "topic")
    assert(joined.count() == sketch.count()) // every sketched key is real
    assert(joined.filter(col("est") > col("n")).count() == 0)
    assert(joined.filter(col("n") - col("est") > col("total") / k).count() == 0)
    val missing = exact.join(totals, "topic")
      .filter(col("n") > col("total") / k)
      .join(sketch, Seq("topic", "k"), "left_anti")
    assert(missing.count() == 0)
  }

  test("stream-static enrichment join == batch join") {
    val got = Streams.runStreamStaticJoin(spark, dir)
    val want = Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .join(Tables.t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"), "left")
      .groupBy("event_type", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("streaming latency sketch == batch histogram, bounded state") {
    val got = Streams.runStreamLatencySketch(spark, dir)
    val want = graft.log.BrokerOps.hdrHist(
      graft.log.BrokerOps.withLatency(
        Tables.t(spark, dir, "events")
          .select(col("event_id"), col("props").as("v"))))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the state the stream held IS bounded: 4 apis x <= ~176 buckets
    assert(got.count() > 0 && got.count() <= 4 * 176)
  }

  test("streaming CDC == batch cdc_view") {
    val got = Streams.runCdcStream(spark, dir)
      .select("topic", "k", "event_id", "v", "prev_v", "op")
    val want = LogOps.cdcView(spark, dir)
      // offs is a per-(topic, part) coordinate the per-key stream does not
      // carry; everything else must match exactly.
      .join(LogOps.log(spark, dir)
        .select(col("topic"), col("part"), col("offs"), col("event_id")),
        Seq("topic", "part", "offs"))
      .select("topic", "k", "event_id", "v", "prev_v", "op")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("stateful compaction stream == batch compact") {
    val got = Streams.runCompactionStream(spark, dir)
      .select(col("topic"), col("k"), col("event_id"))
    val want = LogOps.compact(spark, dir)
      // batch compact is per (topic, part, key); part is a function of key,
      // so (topic, key) identifies the same record.
      .join(LogOps.log(spark, dir).select(col("topic"), col("part"),
        col("k"), col("offs"), col("event_id")),
        Seq("topic", "part", "k", "offs"))
      .select(col("topic"), col("k"), col("event_id"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
