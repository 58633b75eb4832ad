package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial event-stream shapes: identical-timestamp ties, exact
  * session-boundary gaps, out-of-order ids, negative monetary values.
  * The per-user window chains claim (ts, event_id) total-order
  * determinism — this pins that claim on data built to break it.
  */
class EdgeEventsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")

  /** T0 in micros (2024-01-01 00:00:00 UTC). */
  private val T0 = 1704067200000000L

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edge_ev")
    d.toFile.deleteOnExit()
    import spark.implicits._
    // (event_id, micros, user_id, event_type, value)
    val rows = Seq(
      // user 1: FOUR events at the IDENTICAL instant — chain order must
      // come from event_id alone
      (10L, T0, 1L, "view", 1.0),
      (11L, T0, 1L, "click", 2.0),
      (12L, T0, 1L, "purchase", 30.0),
      (13L, T0, 1L, "error", 0.0),
      // user 2: gap of EXACTLY 30 min — same session (the split is
      // strictly-greater)
      (20L, T0, 2L, "view", 1.0),
      (21L, T0 + 1800000000L, 2L, "purchase", 10.0),
      // user 3: gap of 30 min + 1 ms — two sessions
      (30L, T0, 3L, "view", 1.0),
      (31L, T0 + 1800001000L, 3L, "click", 1.0),
      // user 4: ids DESCEND while time ascends (late renumbering) +
      // a negative refund value
      (42L, T0, 4L, "signup", 0.0),
      (41L, T0 + 1000000L, 4L, "view", 5.0),
      (40L, T0 + 2000000L, 4L, "purchase", -5.0))
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d.toString
  }

  test("tied timestamps: the transition chain follows event_id exactly") {
    val tr = analytics.Analytics.eventTransitions(spark, dir)
      .filter(col("n") > 0).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // user 1 contributes view->click->purchase->error; user 2 view->
    // purchase; user 3 view->click; user 4 (by ts despite descending
    // ids) signup->view->purchase
    val want = Set(
      ("view", "click"), ("click", "purchase"), ("purchase", "error"),
      ("view", "purchase"), ("signup", "view"))
    assert(tr == want, s"got $tr")
    // and the 2nd-order chain sees the tied triple in id order
    val t2 = analytics.Analytics.transitionMatrix2(spark, dir)
      .select("from1", "from2", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(t2 == Set(("view", "click", "purchase"),
      ("click", "purchase", "error"), ("signup", "view", "purchase")))
  }

  test("tied timestamps: event_paths orders the tied triple by id") {
    // u1's tied instant resolves by event_id (view>click>purchase, the
    // error event falls off the 3-cut); u4's descending ids resolve by
    // ts. Four users, one path each, 2500 bp shares.
    val p = analytics.Analytics.eventPaths(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("share_bp"))).toMap
    assert(p == Map(
      "view>click>purchase" -> ((1L, 2500L)),
      "view>purchase" -> ((1L, 2500L)),
      "view>click" -> ((1L, 2500L)),
      "signup>view>purchase" -> ((1L, 2500L))), s"got $p")
  }

  test("tied timestamps: interarrival gaps are zero, counted exactly") {
    // user 1's four same-instant events yield three gaps of exactly 0 ms
    // within each type... but types differ, so per-(user, type) there
    // are NO gaps for user 1; users 2/3 contribute one gap each per
    // type pair. The tie-broken lag window must neither crash nor
    // invent nonzero gaps from the tied instants.
    val iq = analytics.Analytics.interarrivalQuartiles(spark, dir)
    val got = iq.collect().map(r =>
      r.getString(0) -> r.getAs[Long]("n_gaps")).toMap
    // no (user, type) pair repeats a type for users 1/2/3/4 except none
    // — the adversarial set has all-distinct types per user, so the
    // operator must return an EMPTY frame rather than fabricate gaps
    assert(got.isEmpty,
      s"interarrival invented gaps on a no-repeat stream: $got")
  }

  test("session boundary is strictly greater than 30 minutes") {
    val s = analytics.Analytics.sessionize(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == 1L) // four tied events: one session
    assert(s(2L) == 1L) // exactly 30 min: same session
    assert(s(3L) == 2L) // 30 min + 1 ms: split
    assert(s(4L) == 1L)
    // negative value flows through the decimal sum, not dropped
    val u4 = analytics.Analytics.sessionize(spark, dir)
      .filter(col("user_id") === 4L).head
    assert(math.abs(u4.getAs[Double]("sum_val") - 0.0) < 1e-9)
  }

  test("session conversion counts the tied-instant purchase session") {
    val sc = analytics.Analytics.sessionConversion(spark, dir)
    // sessions: u1 (4 events, converted), u2 (2, converted), u3 two
    // 1-event sessions (not converted), u4 (3, converted — refunds
    // still count as purchase events)
    assert(sc.agg(sum("n_sessions")).head.getLong(0) == 5L)
    assert(sc.agg(sum("n_converted")).head.getLong(0) == 3L)
    assert(sc.filter(col("n_events") === 1L).head
      .getAs[Long]("n_converted") == 0L)
  }

  test("round-13 event operators survive the adversarial stream") {
    // tied instants, descending ids, negative values, a 4-user toy log:
    // every broker/coordinator view must degrade, never abort, and the
    // structural invariants must hold on the degenerate shape too
    for (name <- Seq("codec_recompress", "kop_event_queue",
      "pending_topic_futures", "migration_requests", "tenant_summary",
      "token_validation", "offset_commit_validation",
      "join_group_validation", "end_txn_validation", "hll_distinct_eval"))
      assert(SparkEntry.queries(name)(spark, dir).count() >= 0,
        s"$name failed on the adversarial stream")
    // the queue stays work-conserving even when every event arrives
    // inside one instant cluster
    val q = admin.Admin.kopEventQueue(spark, dir)
    assert(q.filter(col("queued_ms") < 0L ||
      col("start_ms") < col("arrival_ms")).count() == 0)
    // single-batch logs: every (topic, part) has exactly one batch and
    // wire/stored bytes stay positive
    val c = graft.log.LogOps.codecRecompress(spark, dir)
    assert(c.filter(col("wire_bytes") <= 0L || col("stored_bytes") <= 0L ||
      col("n_in_place") + col("n_recompressed") =!= col("n_batches"))
      .count() == 0)
  }

  /** Wide topic universe so every create_partitions md5-coin branch has
    * population (the 5-topic standard corpus leaves auth/manual/negative
    * data-dependent).
    */
  lazy val wideDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edge_wide")
    d.toFile.deleteOnExit()
    import spark.implicits._
    val rows = (0L until 80L).map { i =>
      (i, T0 + i * 1000000L, i % 16, s"topic${i % 40}", 1.0)
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d.toString
  }

  test("create_partitions: every decision branch fires on a wide universe") {
    val cp = admin.Admin.createPartitions(spark, wideDir).cache()
    val outcomes = cp.select("outcome").distinct().collect()
      .map(_.getString(0)).toSet
    for (o <- Seq("NONE", "INVALID_PARTITIONS", "INVALID_REQUEST",
      "UNKNOWN_TOPIC_OR_PARTITION", "TOPIC_AUTHORIZATION_FAILED"))
      assert(outcomes.contains(o), s"branch $o never fires: $outcomes")
    // the reference's apply contract: NONE applies the requested count
    // (>= current), every error leaves the old count in place
    assert(cp.filter(col("outcome") === "NONE" &&
      (col("applied_partitions") =!= col("req_partitions") ||
        col("req_partitions") < col("old_partitions"))).count() == 0)
    assert(cp.filter(col("outcome") =!= "NONE" &&
      col("applied_partitions") =!= col("old_partitions")).count() == 0)
    // unauthorized topics short-circuit before any admin-path error
    assert(cp.filter(col("authorized") === 0L &&
      col("outcome") =!= "TOPIC_AUTHORIZATION_FAILED").count() == 0)
    // duplicate request entries keep the processed outcome (the
    // result.putAll overwrite quirk): dup rows show every outcome class,
    // never a sticky INVALID_REQUEST
    assert(cp.filter(col("n_entries") === 2L &&
      col("outcome") === "NONE").count() > 0)
    cp.unpersist()
  }

  test("create_topics: branches live, sentinel default applied, nothing created on error") {
    val ct = admin.Admin.createTopics(spark, wideDir).cache()
    val outcomes = ct.select("outcome").distinct().collect()
      .map(_.getString(0)).toSet
    for (o <- Seq("NONE", "INVALID_REQUEST", "TOPIC_ALREADY_EXISTS",
      "TOPIC_AUTHORIZATION_FAILED"))
      assert(outcomes.contains(o), s"branch $o never fires: $outcomes")
    // the NO_NUM_PARTITIONS sentinel resolves to the broker default (1)
    assert(ct.filter(col("req_partitions") === -1L &&
      col("effective_partitions") =!= 1L).count() == 0)
    assert(ct.filter(col("req_partitions") === -1L).count() > 0)
    // only NONE creates; created count = effective count
    assert(ct.filter(col("outcome") =!= "NONE" &&
      col("created_partitions") =!= 0L).count() == 0)
    assert(ct.filter(col("outcome") === "NONE" &&
      (col("created_partitions") =!= col("effective_partitions") ||
        col("existed") === 1L)).count() == 0)
    ct.unpersist()
  }

  test("heartbeat: all five decision classes are live on the standard corpus") {
    val hb = coordinator.Groups.heartbeat(spark, "/root/testdata/sf0.001")
      .cache()
    val outcomes = hb.select("outcome").distinct().collect()
      .map(_.getString(0)).toSet
    for (o <- Seq("NONE", "REBALANCE_IN_PROGRESS", "ILLEGAL_GENERATION",
      "UNKNOWN_MEMBER_ID"))
      assert(outcomes.contains(o), s"class $o never fires: $outcomes")
    // the loading blind-accept is a real population, and it never
    // schedules a heartbeat (the validate path bypasses the member)
    assert(hb.filter(col("blind_accept") === 1L).count() > 0)
    assert(hb.filter(col("blind_accept") === 1L &&
      (col("outcome") =!= "NONE" || col("hb_scheduled") === 1L))
      .count() == 0)
    // scheduled beats are exactly the validated live-state successes
    assert(hb.filter(col("hb_scheduled") === 1L &&
      !col("outcome").isin("NONE", "REBALANCE_IN_PROGRESS")).count() == 0)
    hb.unpersist()
  }
}
