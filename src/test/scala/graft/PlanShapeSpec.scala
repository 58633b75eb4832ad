package graft

import graft.log.{BrokerOps, LogOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the count-compressed percentile plans (the 100 TB shape): the
  * distribution must be compressed by a partial-aggregate exchange on
  * (key, value) BEFORE any sort window runs — never a full-data sort
  * partitioned by the 4-5-cardinality key alone, which would collapse
  * parallelism to 4-5 tasks each sorting ~20 TB at scale.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertCompressed(plan: String, key: String, value: String): Unit = {
    assert(s"hashpartitioning\\($key#\\d+[^)]*, $value#\\d+".r.findFirstIn(plan).isDefined,
      s"no ($key, $value) partial-agg exchange in plan:\n$plan")
    assert(plan.contains("partial_count"),
      s"no map-side partial aggregation in plan:\n$plan")
  }

  test("value_percentiles compresses to (topic, val) counts before ranking") {
    assertCompressed(planOf(LogOps.valuePercentiles(spark, dir)), "topic", "val")
  }

  test("request_latency compresses to (api, lat_us) counts before ranking") {
    assertCompressed(planOf(BrokerOps.requestLatency(spark, dir)), "api", "lat_us")
  }

  test("watermark_lateness compresses to (topic, late_ms) counts before ranking") {
    assertCompressed(planOf(LogOps.watermarkLateness(spark, dir)), "topic", "late_ms")
  }

  test("quantized ANN scans broadcast the query side, never shuffle it") {
    // ann_pq: the ADC distance table joins the codes via broadcast hash
    // (equi keys on subspace + code) — the big side streams.
    val pq = graft.llm.Similarity.queries("ann_pq")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pq.contains("BroadcastHashJoin"), s"ann_pq not broadcast:\n$pq")
    assert(!pq.contains("SortMergeJoin"), s"ann_pq shuffles a join side:\n$pq")
    // ann_sq8: tiny query set broadcast over one scan (non-equi condition
    // => broadcast nested loop, by design).
    val sq8 = graft.llm.Similarity.queries("ann_sq8")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(sq8.contains("BroadcastNestedLoopJoin") || sq8.contains("BroadcastHashJoin"),
      s"ann_sq8 query side not broadcast:\n$sq8")
    assert(!sq8.contains("SortMergeJoin"), s"ann_sq8 shuffles a join side:\n$sq8")
  }

  test("round-7 compositions broadcast the small side") {
    // ann_ivfpq: the ADC table + probed-cell frame is broadcast; the codes
    // scan streams (codes x cells joins on vec_id may legitimately
    // shuffle — both sides are index-sized, 64x smaller than vectors).
    val ivfpq = planOf(graft.llm.Similarity.annIvfPq(spark, dir))
    assert(ivfpq.contains("BroadcastHashJoin"),
      s"ann_ivfpq ADC side not broadcast:\n$ivfpq")
    // tiered_read_path: the commit frame (|groups| x |partitions|) is the
    // broadcast side; segments never shuffle for the join.
    val rp = planOf(graft.log.BrokerOps.tieredReadPath(spark, dir))
    assert(rp.contains("BroadcastHashJoin"),
      s"tiered_read_path commits not broadcast:\n$rp")
    assert(!rp.contains("SortMergeJoin"),
      s"tiered_read_path shuffles a join side:\n$rp")
    // bpe_merges: each round's winning pair is a broadcast 1-row frame —
    // the vocabulary must never shuffle for the merge.
    val bpe = planOf(graft.llm.TextAnalysis.bpeMerges(spark, dir))
    assert(!bpe.contains("SortMergeJoin"),
      s"bpe_merges shuffles the vocabulary for a merge:\n$bpe")
  }

  test("late round-7 additions keep their scale shapes") {
    // latency_hdr_sketch: bucket counts must partial-aggregate on
    // (api, b_lo) before any window — the bounded-summary contract.
    val sk = planOf(BrokerOps.latencyHdrSketch(spark, dir))
    assertCompressed(sk, "api", "b_lo")
    // corpus_shuffle: the 256-row bucket-offset side is broadcast; the
    // corpus must not join it with a shuffle.
    val cs = planOf(graft.llm.Sampling.corpusShuffle(spark, dir))
    assert(cs.contains("BroadcastHashJoin"),
      s"corpus_shuffle offsets not broadcast:\n$cs")
    assert(!cs.contains("SortMergeJoin"),
      s"corpus_shuffle shuffles the offset join:\n$cs")
    // bpe_encode: the encoded vocabulary joins the corpus side broadcast.
    val be = planOf(graft.llm.TextAnalysis.bpeEncode(spark, dir))
    assert(!be.contains("SortMergeJoin"),
      s"bpe_encode shuffles the vocab join:\n$be")
    // describe_transactions: the 64-row metadata side is broadcast into
    // the queried-id probe.
    val dt = planOf(graft.txn.Transactions.describeTransactions(spark, dir))
    assert(dt.contains("BroadcastHashJoin"),
      s"describe_transactions metadata not broadcast:\n$dt")
  }

  test("incident_blast joins count-compressed sides, never raw pairs") {
    // Both interval-join sides must be compressed before the cell
    // equi-join: events to (cell, tms, n) via a partial-aggregated
    // exchange, incidents to distinct starts — the pair explosion at high
    // traffic density is the hazard the 100x stress run exposed.
    val plan = planOf(graft.analytics.Analytics.incidentBlast(spark, dir))
    assertCompressed(plan, "cell", "tms")
    assert(!plan.contains("CartesianProduct"),
      s"incident_blast plans a cartesian product:\n$plan")
  }

  test("q9/q16 star plans broadcast every dimension side") {
    // q9_profit: part (filtered), supplier, and nation are all broadcast —
    // the fact side shuffles only for the orders join and the aggregation.
    // At 100x the supplier broadcast is pinned by the author, not left to
    // AQE's runtime estimate.
    val q9 = planOf(graft.analytics.Analytics.q9(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(q9).size >= 3,
      s"q9_profit dims not all broadcast:\n$q9")
    assert("SortMergeJoin".r.findAllIn(q9).size <= 1,
      s"q9_profit shuffles more than the orders join:\n$q9")
    // q16_supplier_counts: part filter and complained-supplier anti join
    // both broadcast; the only shuffle is the aggregation on
    // (brand, type, size).
    val q16 = planOf(graft.analytics.Analytics.q16(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(q16).size >= 2,
      s"q16 part/anti joins not broadcast:\n$q16")
    assert(!q16.contains("SortMergeJoin"),
      s"q16 shuffles a join side:\n$q16")
  }

  test("q2/q11/q20 bridge plans broadcast every dim and the global scalar") {
    // q2: part filter + supplier->nation->region chain broadcast; the
    // fact shuffles once for the bridge groupBy, then the correlated-MIN
    // window partitions on p_partkey — full parallelism, no global sort.
    val q2 = planOf(graft.analytics.Analytics.q2(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(q2).size >= 2,
      s"q2 dims not broadcast:\n$q2")
    assert(!q2.contains("SortMergeJoin"), s"q2 shuffles a join side:\n$q2")
    assert("hashpartitioning\\(p_partkey#\\d+".r.findFirstIn(q2).isDefined,
      s"q2 window not partitioned on p_partkey:\n$q2")
    // q11: the nation-supplier probe broadcasts into one fact pass; the
    // global total joins back as a broadcast 1-row frame — the fact is
    // never scanned twice and never shuffled for the threshold compare.
    val q11 = planOf(graft.analytics.Analytics.q11(spark, dir))
    assert(q11.contains("BroadcastHashJoin"), s"q11 probe not broadcast:\n$q11")
    assert(q11.contains("BroadcastNestedLoopJoin") ||
      "BroadcastHashJoin".r.findAllIn(q11).size >= 2,
      s"q11 global total not broadcast:\n$q11")
    assert(!q11.contains("SortMergeJoin"), s"q11 shuffles a join side:\n$q11")
    // q20: red-part prune and the supplier dim both broadcast; the only
    // shuffles are the two aggregations.
    val q20 = planOf(graft.analytics.Analytics.q20(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(q20).size >= 2,
      s"q20 dims not broadcast:\n$q20")
    assert(!q20.contains("SortMergeJoin"), s"q20 shuffles a join side:\n$q20")
  }

  test("dsir_weights broadcasts the vocabulary ratio table") {
    // The per-token ratio frame is vocabulary-sized: it must broadcast
    // into the tf stream (and the 1-row totals into the gram table) —
    // the corpus side never shuffles for either join.
    val plan = planOf(graft.llm.Sampling.dsirWeights(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"dsir ratio join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dsir shuffles a join side:\n$plan")
  }

  test("no registered query plans a CartesianProduct") {
    // Global guard: every join in the engine must be equi-keyed or a
    // broadcast of a deliberately tiny frame (BroadcastNestedLoopJoin).
    // An unkeyed shuffled cartesian product is always a planning bug.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
        } catch { case e: Throwable => Some(s"$name (plan failed: ${e.getMessage})") }
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("knn_graph blocks join on (cell, sub), small frames broadcast") {
    // Pin the uncached BUILD: the registered query serves a checkpointed
    // frame whose plan is just a scan.
    val plan = planOf(graft.llm.Similarity.buildKnnGraph(spark, dir))
    // The nsub cap table and the centroid set broadcast into the scan; the
    // pair generation is an equi-join on (cell, sub) — never a cartesian
    // or a single-key (cell-only) join that would let a hot cell go
    // quadratic.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"knn_graph cap/centroid frames not broadcast:\n$plan")
    assert("hashpartitioning\\(cell#\\d+[^)]*, sub#\\d+".r.findFirstIn(plan).isDefined ||
      "\\[cell#\\d+[^]]*, sub#\\d+[^]]*\\]".r.findFirstIn(plan).isDefined,
      s"knn_graph pair join not keyed on (cell, sub):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"knn_graph cartesian:\n$plan")
  }

  test("fetch_authorized broadcasts topic stats into the ACL frame") {
    // Both inputs are metadata-sized rollups; the composition must be a
    // broadcast hash join — a data-sized exchange for the topic-stats
    // side would mean the rollup happened after the join.
    val plan = planOf(graft.admin.Admin.fetchAuthorized(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"fetch_authorized topic stats not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fetch_authorized shuffles a join side:\n$plan")
  }

  test("pii_scrub is one scan and only the rollup exchange") {
    // The regex work is in-row over a single documents scan; the ONLY
    // exchange allowed is the final ~|sources|-row rollup's partial-agg
    // shuffle. A second exchange would mean the scan shuffled data-sized
    // rows before aggregating.
    val plan = planOf(graft.llm.Curation.piiScrub(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"pii_scrub has more than the rollup exchange:\n$plan")
    assert(plan.contains("partial_"),
      s"pii_scrub rollup not map-side combined:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"pii_scrub scans documents more than once:\n$plan")
  }

  test("props_json_stats parses in-row: one scan, one rollup exchange") {
    // get_json_object must stay a codegen'd projection over the scan —
    // nothing materializes parsed JSON. The distinct-count rewrite
    // plans exactly two partial-aggregated exchanges: the (type, kv)
    // expansion then the |event_type|-row rollup; both shuffle
    // aggregate-compressed rows, never the scan.
    val plan = planOf(graft.analytics.Analytics.propsJsonStats(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"props_json_stats plans extra exchanges:\n$plan")
    assert(plan.contains("partial_"),
      s"props_json_stats rollup not map-side combined:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"props_json_stats scans events more than once:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_type:string,props:string>"),
      s"props_json_stats scan not pruned to two columns:\n$plan")
  }

  test("event_transitions shuffles once on user, rolls up on pair") {
    // One window exchange on user_id (bounded per-key state), one
    // |types|^2 rollup exchange — no join, no extra sort beyond the
    // window's per-partition sort.
    val plan = planOf(graft.analytics.Analytics.eventTransitions(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"event_transitions plans extra exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"),
      s"event_transitions plans a join:\n$plan")
  }

  test("anomaly_mad windows the compressed minute frame, medians broadcast") {
    // Every window/join runs on the |types|*|minutes| count frame; the
    // two median frames broadcast back — never a sort-merge join — and
    // the scan partial-aggregates before any exchange.
    // BUILD shape (what runs at scale, once per session/data): medians
    // broadcast back onto the minute frame, never a sort-merge join.
    val devPlan = planOf(graft.analytics.Analytics.buildAnomalyDev(spark, dir))
    assert(!devPlan.contains("SortMergeJoin"),
      s"anomaly dev build shuffles a join side:\n$devPlan")
    assert("BroadcastExchange".r.findAllIn(devPlan).size >= 2,
      s"anomaly dev build median frames not broadcast:\n$devPlan")
    // Consumers ride the checkpointed dev frame: one rollup, no parquet
    // re-scan and no re-derived median subtrees.
    val plan = planOf(graft.analytics.Analytics.anomalyMad(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"anomaly_mad shuffles a join side:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 0,
      s"anomaly_mad re-scans events past the checkpoint:\n$plan")
    assert(!plan.contains("Window"),
      s"anomaly_mad re-derives the median windows past the dev cache:\n$plan")
    val mcPlan = planOf(graft.analytics.Analytics
      .buildAnomalyMinuteCounts(spark, dir))
    assert(mcPlan.contains("partial_count") &&
      "Scan parquet".r.findAllIn(mcPlan).size == 1,
      s"minute-count frame not one partial-aggregated scan:\n$mcPlan")
  }

  test("rolling_throughput frames the compressed minute counts") {
    // The RANGE window runs on the checkpointed (type, minute) frame —
    // no parquet re-scan past the shared minute-count cache, and only
    // the window's own exchange of that compressed frame (the build
    // shape itself is pinned in the anomaly_mad test).
    val plan = planOf(graft.analytics.Analytics.rollingThroughput(spark, dir))
    assert("Scan parquet".r.findAllIn(plan).size == 0,
      s"rolling_throughput re-scans events past the checkpoint:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"rolling_throughput plans extra exchanges:\n$plan")
  }

  test("producer_state_snapshot broadcasts the boundary frame") {
    // The |partitions|-row bounds checkpoint broadcasts back onto both
    // compressed passes — the log never shuffles for the boundary join.
    val plan = planOf(graft.txn.Transactions
      .producerStateSnapshot(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"producer_state_snapshot bounds not broadcast into both passes:\n$plan")
    assert(plan.contains("partial_"),
      s"producer_state_snapshot passes not map-side combined:\n$plan")
  }

  test("nation_revenue_rollup subtotals re-read the checkpointed frame") {
    // The hierarchy must come from re-aggregating the |nations| frame —
    // no Expand (Dataset.rollup would triple the fact shuffle) and no
    // parquet re-scan past the checkpoint.
    val plan = planOf(graft.analytics.Analytics
      .nationRevenueRollup(spark, dir))
    assert(!plan.contains("Expand"),
      s"nation_revenue_rollup plans an Expand:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 0,
      s"nation_revenue_rollup re-scans facts past the checkpoint:\n$plan")
  }

  test("r15 connection ledgers: one sort serves every window") {
    // publish_buffer_throttle: five window computations (rank, prefix
    // sum, running min, two hysteresis states) must share the ONE
    // (conn, arrival) sort — one exchange, one Sort, one scan. A second
    // sort would mean a window spec drifted off the shared ordering.
    val pt = planOf(graft.admin.Admin.publishBufferThrottle(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(pt).size == 1,
      s"publish_buffer_throttle has extra exchanges:\n$pt")
    assert("\\+- Sort ".r.findAllIn(pt).size == 1,
      s"publish_buffer_throttle sorts more than once:\n$pt")
    assert("Scan parquet".r.findAllIn(pt).size == 1,
      s"publish_buffer_throttle scans events more than once:\n$pt")
    // idle_connections: the instants frame must be count-compressed by a
    // (conn, tms) partial-agg exchange BEFORE the per-connection windows
    // (never a raw-event sort), and both session rollups reuse the
    // window's conn partitioning — exactly two exchanges.
    val ic = planOf(graft.admin.Admin.idleConnections(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(ic).size == 2,
      s"idle_connections has extra exchanges:\n$ic")
    assert(ic.contains("partial_count"),
      s"idle_connections instants not map-side combined:\n$ic")
    assert("Scan parquet".r.findAllIn(ic).size == 1,
      s"idle_connections scans events more than once:\n$ic")
    // inner_topic_protection: coins and verdicts are in-row over one
    // scan; the ONLY exchange is the decision-table rollup.
    val it = planOf(graft.admin.Admin.innerTopicProtection(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(it).size == 1,
      s"inner_topic_protection has more than the rollup exchange:\n$it")
    assert("Scan parquet".r.findAllIn(it).size == 1,
      s"inner_topic_protection scans events more than once:\n$it")
  }

  test("dedup_bloom broadcasts the bounded first-setter table") {
    // The per-bit first-setter frame is bounded by the filter size m
    // (constant), so its join back onto the 4n bit rows must broadcast —
    // shuffling the bit rows a second time for that join would double
    // the op's data-sized exchange volume at 100 TB.
    val plan = planOf(graft.llm.Dedup.queries("dedup_bloom")(spark, dir))
    assert(plan.contains("BroadcastExchange"),
      s"dedup_bloom first-setter table not broadcast:\n$plan")
    assert(plan.contains("partial_min"),
      s"dedup_bloom first-setter not map-side combined:\n$plan")
  }

  test("r11 additions keep their scale shapes") {
    // doc_chunk: the window generator is in-row off one scan — the plan
    // must contain NO exchange of any kind (a map-only stage at 100 TB).
    val dc = planOf(graft.llm.Chunking.docChunk(spark, dir))
    assert(!dc.contains("Exchange"),
      s"doc_chunk plans an exchange — the chunker must be map-only:\n$dc")
    // curriculum_order: same contract as corpus_shuffle — the
    // difficulty-bucket offsets broadcast back, never a shuffled join,
    // and the corpus itself never passes through a single partition.
    val co = planOf(graft.llm.Sampling.curriculumOrder(spark, dir))
    assert(co.contains("BroadcastHashJoin"),
      s"curriculum_order offsets not broadcast:\n$co")
    assert(!co.contains("SortMergeJoin"),
      s"curriculum_order shuffles the offset join:\n$co")
    // dedup_delta rides the cached LSH candidates; its only additions
    // are in-row coin columns and a contamination-sized rollup — no
    // cartesian anywhere (the global guard also covers this).
    val dd = planOf(graft.llm.Dedup.dedupDelta(spark, dir))
    assert(!dd.contains("CartesianProduct"),
      s"dedup_delta plans a cartesian:\n$dd")
  }

  test("customer_spend_deciles ranks per bucket, never one global sort") {
    // The data-sized window must partition by the value bucket; the only
    // single-partition work is the |buckets|-row offset prefix.
    val plan = planOf(graft.analytics.Analytics
      .customerSpendDeciles(spark, dir))
    assert("hashpartitioning\\(bucket".r.findFirstIn(plan).isDefined,
      s"deciles rank window not bucket-partitioned:\n$plan")
    assert(plan.contains("partial_"),
      s"deciles totals not map-side combined:\n$plan")
  }

  test("zipf_profile ranks the vocabulary frame, not the corpus") {
    // The token explode partial-aggregates to (source, tok) counts; the
    // rank window and bucket rollup run on that sub-linear frame.
    val plan = planOf(graft.llm.TextAnalysis.zipfProfile(spark, dir))
    assert(plan.contains("partial_count"),
      s"zipf_profile token counts not map-side combined:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"zipf_profile scans documents more than once:\n$plan")
    assert(!plan.contains("Join"), s"zipf_profile plans a join:\n$plan")
  }

  test("alter_configs adds no shuffle beyond the topic_configs frame") {
    // The write half is in-row md5 arithmetic on the config frame: the
    // only joins are the broadcast 8-row defaults cross the distinct
    // topic list — never a sort-merge join.
    val plan = planOf(graft.admin.Admin.alterConfigs(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"alter_configs shuffles a join side:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"alter_configs defaults frame not broadcast:\n$plan")
  }

  test("cluster_sample broadcasts assignment and cell sizes, no sort") {
    // The keep decision is an in-row integer compare: centroids and the
    // FitK-row size frame broadcast; a SortMergeJoin or a per-cell rank
    // Sort would mean the scan shuffled or serialized on 16 cells.
    val plan = planOf(graft.llm.Similarity.clusterSample(spark, dir))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"cluster_sample sides not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"cluster_sample shuffles a join side:\n$plan")
    assert(!plan.contains("Window"),
      s"cluster_sample ranks per cell (parallelism collapse):\n$plan")
  }

  test("curation_report rolls up the verdict frame without re-joining documents") {
    // One documents scan (the verdict frame), the bounded loser frame
    // broadcast, one partial-aggregated rollup on source.
    val plan = planOf(graft.llm.Curation.curationReport(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"curation_report shuffles the loser join:\n$plan")
    assert(plan.contains("partial_"),
      s"curation_report rollup not map-side combined:\n$plan")
  }

  test("acl_check is one aggregation, no joins at all") {
    val plan = planOf(graft.admin.Admin.aclCheck(spark, dir))
    assert(!plan.contains("Join"), s"acl_check joined a grant table:\n$plan")
    assert(plan.contains("HashAggregate"), s"acl_check not aggregated:\n$plan")
  }

  test("watermark_lateness prefix-max runs chunk-parallel, prefix side broadcast") {
    val plan = planOf(LogOps.watermarkLateness(spark, dir))
    // The arrival-order running max must be windowed per (topic, chunk) —
    // parallelism topics × chunks — with the chunk-maxima prefix broadcast.
    assert("hashpartitioning\\(topic#\\d+[^)]*, chunk#\\d+".r.findFirstIn(plan).isDefined,
      s"no (topic, chunk) window partitioning in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"chunk-prefix join is not broadcast:\n$plan")
  }

  test("api_versions broadcasts the 26-row range table into the rollup") {
    val plan = planOf(graft.admin.Admin.apiVersions(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"api_versions range table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"api_versions shuffles a join side:\n$plan")
    assert(plan.contains("partial_count"),
      s"api_versions rollup not map-side combined:\n$plan")
  }

  test("sasl_flow is one aggregation, no joins at all") {
    val plan = planOf(graft.admin.Admin.saslFlow(spark, dir))
    assert(!plan.contains("Join"), s"sasl_flow joined a side table:\n$plan")
    assert(plan.contains("partial_count"),
      s"sasl_flow rollup not map-side combined:\n$plan")
  }

  test("epoch_order ranks per (epoch, bucket), offsets broadcast") {
    // Each epoch's rank must be a per-(epoch, bucket) window — a global
    // or per-epoch-only window would funnel the corpus through E tasks —
    // and the 256·E-row offset table must broadcast into the scan.
    val plan = planOf(graft.llm.Sampling.epochOrder(spark, dir))
    assert("hashpartitioning\\(epoch#\\d+[^)]*, bucket#\\d+".r
      .findFirstIn(plan).isDefined,
      s"epoch_order window not keyed on (epoch, bucket):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"epoch_order offsets not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"epoch_order shuffles a join side:\n$plan")
  }

  test("langid_eval is one scan, totals windowed over the aggregate") {
    val plan = planOf(graft.llm.TextAnalysis.langidEval(spark, dir))
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"langid_eval scans documents more than once:\n$plan")
    assert(!plan.contains("Join"), s"langid_eval joined a side table:\n$plan")
    assert(plan.contains("partial_count"),
      s"langid_eval rollup not map-side combined:\n$plan")
  }

  test("decontaminate_report keeps the benchmark gram set broadcast") {
    // The gram-overlap build (pre-cache) must broadcast the benchmark set
    // into the single train scan...
    val build = planOf(graft.llm.Dedup.decontamBuild(spark, dir)._2)
    assert(!build.contains("SortMergeJoin"),
      s"decontaminate hit-frame build shuffles a join side:\n$build")
    assert(build.contains("BroadcastHashJoin"),
      s"decontaminate gram set not broadcast:\n$build")
    // ...and the report must broadcast the contamination-sized hit frame
    // back onto the doc→source map instead of shuffling it.
    val plan = planOf(graft.llm.Dedup.decontaminateReport(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"decontaminate_report shuffles a join side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"decontaminate_report hit frame not broadcast:\n$plan")
  }

  test("ann_refine fetches exact vectors via a broadcast n_id join") {
    // The refine STAGE must broadcast the R x |queries| candidate set
    // into the vector scan — a sort-merge join keyed on n_id would
    // shuffle the whole vector table to re-rank 80 candidates. (The
    // upstream IVFPQ code chain keeps its own data-sized vec_id joins;
    // those are the index build, not the refine fetch.)
    val plan = planOf(graft.llm.Similarity.annRefine(spark, dir))
    assert("BroadcastHashJoin \\[n_id".r.findFirstIn(plan).isDefined,
      s"ann_refine candidate fetch not a broadcast n_id join:\n$plan")
    assert("SortMergeJoin \\[n_id".r.findFirstIn(plan).isEmpty,
      s"ann_refine shuffles the vector table to refine:\n$plan")
  }

  test("shard_manifest adds only map-side-combined rollups to the pack") {
    // Beyond packShuffled's own shape (256-bucket prefix, broadcast
    // offsets) the manifest may add aggregations only — no new join, and
    // both rollup levels partial-aggregate before their exchange.
    val plan = planOf(graft.llm.Curation.shardManifest(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"shard_manifest shuffles a join side:\n$plan")
    assert("Join".r.findAllIn(plan).size ==
      "BroadcastHashJoin".r.findAllIn(plan).size,
      s"shard_manifest has a non-broadcast join:\n$plan")
    assert(plan.contains("partial_count"),
      s"shard_manifest rollup not map-side combined:\n$plan")
  }

  test("gram-df ops pay exactly one token-scale shuffle, no join") {
    // ngram_novelty and bigram_likelihood both fold their df/first-doc
    // lookup into the ONE uniform gram-hash exchange (a groupBy +
    // re-join would shuffle token-scale rows twice).
    for (name <- Seq("ngram_novelty", "bigram_likelihood")) {
      val plan = planOf(graft.llm.TextAnalysis.queries(name)(spark, dir))
      assert("hashpartitioning\\(h#".r.findAllIn(plan).size == 1,
        s"$name should have exactly one gram-hash exchange:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        s"$name re-joins what the window already computed:\n$plan")
    }
  }

  test("late r11 additions keep their scale shapes") {
    // vocab_coverage: the corpus top-K must be a distributed partial
    // top-k (TakeOrderedAndProject), never a global Sort, and the K-row
    // vocab must broadcast back into the count frame.
    val vc = planOf(graft.llm.TextAnalysis.vocabCoverage(spark, dir))
    assert(vc.contains("TakeOrderedAndProject"),
      s"vocab_coverage top-K is not a partial top-k:\n$vc")
    assert(vc.contains("BroadcastHashJoin"),
      s"vocab_coverage vocab not broadcast:\n$vc")
    // collocations: same top-k contract for the final cut.
    val co = planOf(graft.llm.TextAnalysis.collocations(spark, dir))
    assert(co.contains("TakeOrderedAndProject"),
      s"collocations top-100 is not a partial top-k:\n$co")
    // rfm_segments: all three quartile maps and the scalar n broadcast
    // into the user frame — no shuffled join anywhere.
    val rfm = planOf(graft.analytics.Analytics.rfmSegments(spark, dir))
    assert(!rfm.contains("SortMergeJoin"),
      s"rfm_segments shuffles a quartile join:\n$rfm")
    assert(rfm.contains("BroadcastHashJoin"),
      s"rfm_segments quartile maps not broadcast:\n$rfm")
    // transition matrices: the normalization totals broadcast; the only
    // data-sized exchange is the per-user lag window's.
    for ((n, df) <- Seq(
        ("transition_matrix",
          graft.analytics.Analytics.transitionMatrix(spark, dir)),
        ("transition_matrix2",
          graft.analytics.Analytics.transitionMatrix2(spark, dir)))) {
      val p = planOf(df)
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
        s"$n normalization join not broadcast:\n$p")
    }
  }

  test("round-11 close-out additions keep their scale shapes") {
    // supplier_share_hhi: both dims broadcast into the fact scan; the
    // only shuffles are the (nation, supplier) partial agg and the
    // suppliers-frame window.
    val hh = planOf(graft.analytics.Analytics.supplierShareHhi(spark, dir))
    assert(hh.contains("BroadcastHashJoin") && !hh.contains("SortMergeJoin"),
      s"supplier_share_hhi dims not broadcast:\n$hh")
    // interarrival_quartiles: the rank-pick offset table must broadcast
    // back (no shuffled join of the gap frame against it).
    val iq = planOf(graft.analytics.Analytics.interarrivalQuartiles(spark, dir))
    assert(iq.contains("BroadcastHashJoin"),
      s"interarrival_quartiles offsets not broadcast:\n$iq")
    // vocab_coverage_curve: partial top-k head, never a global Sort of
    // the vocabulary.
    val cv = planOf(graft.llm.TextAnalysis.vocabCoverageCurve(spark, dir))
    assert(cv.contains("TakeOrderedAndProject"),
      s"vocab_coverage_curve head is not a partial top-k:\n$cv")
    // contamination_spans now rides the cached hit-pair frame (the
    // r12 one-train-scan unification): its own plan must add NO new
    // data-sized pass — no join at all beyond the cached scan (the
    // broadcast-gram BUILD shape is pinned on decontamBuild above).
    val cs = planOf(graft.llm.Dedup.contaminationSpans(spark, dir))
    assert(cs.contains("InMemoryTableScan") && !cs.contains("SortMergeJoin"),
      s"contamination_spans re-scans instead of riding the cache:\n$cs")
    // doc_length_outliers: ONE partial-aggregated scan collects the
    // bounded (source, n_chars) count frame; the med/MAD chain is
    // driver-side, so the returned plan is a LocalRelation — no join,
    // no window, no second scan anywhere.
    val ol = planOf(graft.llm.TextAnalysis.docLengthOutliers(spark, dir))
    assert(!ol.contains("Join") && !ol.contains("Scan parquet"),
      s"doc_length_outliers plans data work past the driver rollup:\n$ol")
  }

  test("final close-out additions keep their scale shapes") {
    // basket_lift: the per-part count frames and the scalar total must
    // broadcast back into the pair frame (no shuffled join there).
    val bl = planOf(graft.analytics.Analytics.basketLift(spark, dir))
    assert(bl.contains("BroadcastHashJoin"),
      s"basket_lift part counts not broadcast:\n$bl")
    // brand_discount_depth / customer_churn: dims broadcast or AQE
    // shuffle — either way no CartesianProduct and at least one
    // broadcast in the depth plan (part is a classic broadcast dim).
    val bd = planOf(graft.analytics.Analytics.brandDiscountDepth(spark, dir))
    assert(bd.contains("BroadcastHashJoin") && !bd.contains("SortMergeJoin"),
      s"brand_discount_depth part dim not broadcast:\n$bd")
    // orders_seasonality: the YoY self-join runs broadcast on the
    // months frame.
    val se = planOf(graft.analytics.Analytics.ordersSeasonality(spark, dir))
    assert(se.contains("BroadcastHashJoin"),
      s"orders_seasonality YoY join not broadcast:\n$se")
    // embedding_label_margin: the label-centroid frame broadcasts; the
    // data-sized vector frame never sort-merge joins.
    val lm = planOf(graft.llm.Similarity.embeddingLabelMargin(spark, dir))
    assert(!lm.contains("SortMergeJoin"),
      s"embedding_label_margin shuffles a join:\n$lm")
    // pack_len_sweep: the 3-row length frame broadcasts into the pack
    // layout (BroadcastNestedLoopJoin from the crossJoin is expected).
    val pl = planOf(graft.llm.Curation.packLenSweep(spark, dir))
    assert(!pl.contains("CartesianProduct"),
      s"pack_len_sweep plans a cartesian:\n$pl")
  }

  test("round-12 additions keep their scale shapes") {
    // embedding_dim_stats: every join key is the 64-row dim frame —
    // broadcast only. The base is ONE partial-aggregated scan, now
    // checkpointed (the r17 multi-consumer fix: the lazy form re-planned
    // the posexplode scan per consumer — 20 scans in one plan), so the
    // scan shape is pinned on the BUILDER and the final plan must read
    // the checkpointed RDD, not parquet.
    val ds = planOf(graft.llm.Similarity.embeddingDimStats(spark, dir))
    assert(ds.contains("BroadcastHashJoin") && !ds.contains("SortMergeJoin"),
      s"embedding_dim_stats dim joins not broadcast:\n$ds")
    assert(!ds.contains("Scan parquet"),
      s"embedding_dim_stats re-scans parquet past the checkpoint:\n$ds")
    val dsBuild = planOf(
      graft.llm.Similarity.buildDimBucketCounts(spark, dir))
    assert(dsBuild.contains("partial_count"),
      s"embedding_dim_stats build not partial-aggregated:\n$dsBuild")
    // event_paths: the scalar total rides a broadcast, and the top-3
    // cut happens per user partition (window), never a global sort.
    val ep = planOf(graft.analytics.Analytics.eventPaths(spark, dir))
    assert(ep.contains("BroadcastNestedLoopJoin"),
      s"event_paths scalar total not broadcast:\n$ep")
    // conversion_window_curve: the lag histogram broadcasts into the
    // 6-row window spine (non-equi join on metadata-sized frames).
    val cw = planOf(graft.analytics.Analytics
      .conversionWindowCurve(spark, dir))
    assert(cw.contains("BroadcastNestedLoopJoin"),
      s"conversion_window_curve histogram not broadcast:\n$cw")
    // char_class_profile / minhash_band_stats: rollup-only exchanges,
    // no join anywhere.
    val cp = planOf(graft.llm.TextAnalysis.charClassProfile(spark, dir))
    assert(!cp.contains("Join"), s"char_class_profile joins:\n$cp")
    val bs = planOf(graft.llm.Dedup.minhashBandStats(spark, dir))
    assert(!bs.contains("Join"), s"minhash_band_stats joins:\n$bs")
    // supplier_fulfillment: fact partial-aggregates BEFORE the name
    // join, and the supplier dim broadcasts.
    val sf = planOf(graft.analytics.Analytics
      .supplierFulfillment(spark, dir))
    assert(sf.contains("BroadcastHashJoin"),
      s"supplier_fulfillment dim not broadcast:\n$sf")
    assert(sf.contains("partial_count"),
      s"supplier_fulfillment not partial-aggregated:\n$sf")
    // discount_qty_curve: ONE scan, rollup-only, no join.
    val dq = planOf(graft.analytics.Analytics.discountQtyCurve(spark, dir))
    assert(!dq.contains("Join"), s"discount_qty_curve joins:\n$dq")
    // ivf_centroid_margin: the 16-row fitted frame self-joins via
    // broadcast, never a cartesian.
    val cm = planOf(graft.llm.Similarity.ivfCentroidMargin(spark, dir))
    assert(cm.contains("BroadcastNestedLoopJoin") &&
      !cm.contains("CartesianProduct"),
      s"ivf_centroid_margin pair join not broadcast:\n$cm")
    // source_lang_matrix: marginals broadcast back onto the count frame
    // — no shuffled join anywhere.
    val sl = planOf(graft.llm.TextAnalysis.sourceLangMatrix(spark, dir))
    assert(!sl.contains("SortMergeJoin") && sl.contains("BroadcastHashJoin"),
      s"source_lang_matrix marginals not broadcast:\n$sl")
    // customer_repeat_rate: orders partial-aggregate BEFORE the customer
    // join; nation name broadcast.
    val rr = planOf(graft.analytics.Analytics.customerRepeatRate(spark, dir))
    assert(rr.contains("BroadcastHashJoin") && rr.contains("partial_count"),
      s"customer_repeat_rate shape wrong:\n$rr")
    // vocab_growth_curve: the type side is ONE token-scale exchange (the
    // gram -> min-coin agg); the curve joins only broadcast 4-row frames.
    val vg = planOf(graft.llm.TextAnalysis.vocabGrowthCurve(spark, dir))
    assert(!vg.contains("SortMergeJoin"),
      s"vocab_growth_curve shuffles a join side:\n$vg")
  }

  test("embedding_outliers broadcasts centroids and stats, never re-shuffles vectors") {
    val plan = planOf(graft.llm.Similarity.embeddingOutliers(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"embedding_outliers shuffles a join side:\n$plan")
    assert("Join".r.findAllIn(plan).size ==
      "BroadcastHashJoin".r.findAllIn(plan).size,
      s"embedding_outliers has a non-broadcast join:\n$plan")
  }

  test("round-13 additions keep their scale shapes") {
    // codec_recompress: the per-batch rollup must RIDE the offset
    // window's (topic, part) partitioning — hash(topic, part) satisfies
    // clustering on (topic, part, batch_id), so the only fact-sized
    // exchange is the one the log view already pays. The codec rollup
    // exchange is metadata-sized.
    val cr = planOf(LogOps.codecRecompress(spark, dir))
    val factEx = "Exchange hashpartitioning\\(topic#\\d+, part#\\d+L?, \\d+\\)".r
    assert(factEx.findAllIn(cr).size == 1,
      s"codec_recompress re-shuffles the fact beyond the log window:\n$cr")
    // pending_topic_futures: the min window and the conditional rollup
    // share ONE (topic, part) exchange — exactly one exchange total.
    val pf = planOf(BrokerOps.pendingTopicFutures(spark, dir))
    assert("Exchange".r.findAllIn(pf).size == 1,
      s"pending_topic_futures pays more than the one co-keyed exchange:\n$pf")
    // hll_distinct_eval: the register-universe completion joins the
    // 4096-row range BROADCAST; the register aggregation partial-aggs
    // map-side (the fixed-size-partials property the sketch exists for).
    val hll = planOf(analytics.Analytics.hllDistinctEval(spark, dir))
    assert(hll.contains("BroadcastNestedLoopJoin") ||
      hll.contains("BroadcastHashJoin"),
      s"hll register universe not broadcast:\n$hll")
    assert(hll.contains("partial_max"),
      s"hll registers not map-side combined:\n$hll")
    // minhash_perm_curve: the signature joins stay broadcast over the
    // cached pair frame — no sort-merge anywhere in the curve.
    val pc = planOf(llm.Dedup.minhashPermCurve(spark, dir))
    assert(!pc.contains("CartesianProduct"),
      s"minhash_perm_curve went cartesian:\n$pc")
  }

  test("LSH buckets are computed in-row: one scan, no aggregate exchange") {
    // ann_lsh / ann_lsh_multi fold the broadcast plane matrix per row —
    // the bucket build must not shuffle (vec, plane) rows through a
    // groupBy nor re-join vecs for v/nrm. The only exchanges allowed are
    // the broadcasts and the final top-k window's.
    for (name <- Seq("ann_lsh", "ann_lsh_multi")) {
      val p = planOf(graft.llm.Similarity.queries(name)(spark, dir))
      assert(!p.contains("SortMergeJoin"), s"$name shuffles a join side:\n$p")
      assert(!p.contains("partial_sum"),
        s"$name still builds buckets through an aggregate:\n$p")
    }
    // single-table: a (bucket)-keyed broadcast equi-join
    assert(planOf(graft.llm.Similarity.queries("ann_lsh")(spark, dir))
      .contains("BroadcastHashJoin"), "ann_lsh not broadcast")
    // multi-table: the any-table collision is an in-row code-array
    // overlap against the 8 broadcast queries — no posexplode fan-out,
    // no distinct exchange, no join back for v/nrm (the r14 4.2x-at-100x
    // scaler was exactly those three extra exchanges).
    val pm = planOf(graft.llm.Similarity.queries("ann_lsh_multi")(spark, dir))
    assert(pm.contains("BroadcastNestedLoopJoin"),
      s"ann_lsh_multi lost the broadcast compare:\n$pm")
    // exactly ONE hash exchange: the final top-k window's (the 24-row
    // plane-matrix fold is a SinglePartition metadata aggregate, allowed)
    assert("Exchange hashpartitioning".r.findAllIn(pm).size == 1,
      s"ann_lsh_multi re-grew a distinct/join exchange:\n$pm")
    assert(!pm.toLowerCase.contains("generate"),
      s"ann_lsh_multi re-grew the posexplode fan-out:\n$pm")
  }

  test("round-16 operators keep their metadata-sized shapes") {
    // publish_rate_throttle: scan -> (topic, sec) partial agg -> topic
    // rollup. Exactly two hash exchanges (both map-side combined), no
    // join, no sort anywhere — the config rates are in-row md5 coins.
    val rt = planOf(graft.admin.Admin.publishRateThrottle(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(rt).size == 2,
      s"publish_rate_throttle grew extra exchanges:\n$rt")
    assert(!rt.contains("Join"), s"publish_rate_throttle joins:\n$rt")
    assert(!rt.contains("Sort "), s"publish_rate_throttle sorts:\n$rt")
    // offsets_for_publish_time: the ONLY exchange + sort is the log
    // model's offset-assignment window; both lookups are conditional
    // aggregates on that partitioning.
    val op = planOf(LogOps.offsetsForPublishTime(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(op).size == 1,
      s"offsets_for_publish_time grew extra exchanges:\n$op")
    assert(!op.contains("Join"), s"offsets_for_publish_time joins:\n$op")
    // bundle_unload_invalidation: after the (topic, part) bounds
    // aggregate everything is metadata-sized and the three joins
    // (events x pairs, group moves, txn moves) all broadcast.
    val bu = planOf(graft.log.BrokerOps.bundleUnloadInvalidation(spark, dir))
    assert(!bu.contains("SortMergeJoin"),
      s"bundle_unload_invalidation shuffles a join side:\n$bu")
    assert(bu.contains("BroadcastHashJoin"),
      s"bundle_unload_invalidation lost its broadcast joins:\n$bu")
  }

  test("round-17 operators keep their metadata-sized shapes") {
    // auth_failure_delay: the park-occupancy self-join must be the
    // explode-to-equi-join (hash, bounded fan), never a nested loop
    // over the parks frame (quadratic — measured 50s at 100x before
    // the fix), and the failing-conn universe lands as a local
    // relation, so no SortMergeJoin anywhere.
    val af = planOf(graft.admin.Admin.authFailureDelay(spark, dir))
    assert(!af.contains("NestedLoop"),
      s"auth_failure_delay occupancy join degraded to a nested loop:\n$af")
    assert(!af.contains("SortMergeJoin"),
      s"auth_failure_delay shuffles a join side:\n$af")
    // (the fails local relation sits upstream of the parks checkpoint,
    // so it cannot appear in this final plan — its absence of a
    // SortMergeJoin/NestedLoop here is the observable contract)
    // multi_ledger_fetch: one (topic, part, fetch_id) partial-aggregated
    // exchange + the metadata-sized per-partition rollup broadcast back;
    // no sort-merge join, no window.
    val ml = planOf(LogOps.multiLedgerFetch(spark, dir))
    assert(!ml.contains("SortMergeJoin"),
      s"multi_ledger_fetch shuffles the rollup join:\n$ml")
    assert(ml.contains("BroadcastHashJoin"),
      s"multi_ledger_fetch lost its broadcast rollup join:\n$ml")
    // topic_delete_invalidation: the commits side joins broadcast onto
    // the metadata-sized topic frame — no shuffle joins.
    val td = planOf(graft.admin.Admin.topicDeleteInvalidation(spark, dir))
    assert(!td.contains("SortMergeJoin"),
      s"topic_delete_invalidation shuffles a join side:\n$td")
    // heavy_hitters_guarantees: the sketch and totals sides both ride
    // BroadcastExchange onto the exact (topic, key) rollup.
    val hg = planOf(LogOps.heavyHittersGuarantees(spark, dir))
    assert(!hg.contains("SortMergeJoin"),
      s"heavy_hitters_guarantees shuffles a join side:\n$hg")
    assert(hg.contains("BroadcastHashJoin"),
      s"heavy_hitters_guarantees lost its broadcast joins:\n$hg")
  }

  test("Bloom family fans bits ONCE at the M grain, per-m only at doc grain") {
    // bloom_fp_curve (5 filter sizes): the corpus-sized explode is the
    // 4-hash M=262144-grain fan — it appears once per scan of the bit
    // frame (first-setter build + verdict join = 2), NEVER multiplied by
    // |ms|; the per-m fan is the struct explode at the n-row verdict
    // grain (1). The per-m first-setter tables ride a BroadcastExchange
    // (the ≤ M-row lut), not a shuffle join on 4·|ms|·n bit rows.
    val fp = planOf(graft.llm.Dedup.queries("bloom_fp_curve")(spark, dir))
    assert("Generate".r.findAllIn(fp).size == 3,
      s"bloom_fp_curve re-grew a data-sized per-m fan:\n$fp")
    assert("% 262144".r.findAllIn(fp).size == 2,
      s"bloom_fp_curve lost the M-grain fan:\n$fp")
    assert(fp.contains("BroadcastExchange"),
      s"bloom_fp_curve first-setter lut no longer broadcasts:\n$fp")
    // bloom_delta_filter: 2 M-grain fans (base filter + arrival test) +
    // the fill explode over the ≤ M-row filter frame + the verdict-grain
    // struct fan + nothing else.
    val df = planOf(graft.llm.Dedup.queries("bloom_delta_filter")(spark, dir))
    assert("Generate".r.findAllIn(df).size == 5,
      s"bloom_delta_filter re-grew a data-sized per-m fan:\n$df")
    assert("% 262144".r.findAllIn(df).size == 4,
      s"bloom_delta_filter lost the M-grain fan:\n$df")
    assert(df.contains("BroadcastExchange"),
      s"bloom_delta_filter membership lut no longer broadcasts:\n$df")
  }
}
