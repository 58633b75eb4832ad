package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derivable fixtures for the round-17 operators: the whenDelete
  * double-deref split, the park/absorb/occupancy arithmetic at exact
  * bucket boundaries, ledger-boundary crossings at exact multiples, and
  * the heavy-hitter presence guarantee with a single dominating key.
  * Coin facts used (md5, the library's one spelling): topic 'delta' has
  * np#%4 == 0 (non-partitioned), 'alpha' is partitioned; conn2 FAILS
  * auth (OAUTHBEARER, auth coin '1'), conn1/conn3 do not.
  */
class EdgeRound17Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")

  /** Write (event_id, tms-in-ms, user_id, event_type, value) rows as an
    * events.parquet dir and return it.
    */
  private def mkDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edge_r17")
    d.toFile.deleteOnExit()
    import spark.implicits._
    rows.toDF("event_id", "ms", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(ms * 1000)")).drop("ms")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d.toString
  }

  test("topic_delete_invalidation: partitioned vs non-partitioned double-deref") {
    // alpha: 4 live partitions (users 0-3); delta (np coin 0): records
    // in 2 raw parts that must collapse to ONE bare-name event with the
    // double deref.
    val rows = (0 until 4).map(u =>
      (u.toLong, 1000L + u, u.toLong, "alpha", 1.0)) ++
      Seq((10L, 2000L, 0L, "delta", 1.0), (11L, 2001L, 1L, "delta", 1.0))
    val out = graft.admin.Admin
      .topicDeleteInvalidation(spark, mkDir(rows))
      .collect().map(r => r.getAs[String]("topic") -> r).toMap
    val a = out("alpha")
    assert(a.getAs[Boolean]("is_partitioned"))
    assert(a.getAs[Long]("n_partitions") == 4L)
    assert(a.getAs[Long]("n_whendelete_events") == 4L)
    assert(a.getAs[Long]("n_cache_derefs") == 4L)
    assert(a.getAs[Long]("n_plog_removals") == 4L)
    val d = out("delta")
    assert(!d.getAs[Boolean]("is_partitioned"))
    assert(d.getAs[Long]("n_partitions") == 1L)
    assert(d.getAs[Long]("n_whendelete_events") == 1L)
    assert(d.getAs[Long]("n_cache_derefs") == 2L)
    assert(d.getAs[Long]("n_plog_removals") == 2L)
    assert(d.getAs[Long]("n_records") == 2L)
  }

  test("auth_failure_delay: absorb within bucket, occupancy across boundary") {
    // conn2 fails; three attempts: two in bucket 1 (the second absorbed),
    // one 150 ms later in bucket 2 while park 1 is still live (occ 2).
    // conn1 does not fail: its records must not appear at all.
    val rows = Seq(
      (1L, 7199900L, 2L, "alpha", 1.0),
      (2L, 7199950L, 2L, "alpha", 1.0),
      (3L, 7200050L, 2L, "alpha", 1.0),
      (4L, 7199900L, 1L, "alpha", 1.0),
      (5L, 7200050L, 1L, "alpha", 1.0))
    val out = graft.admin.Admin.authFailureDelay(spark, mkDir(rows)).collect()
    assert(out.length == 1, s"only conn2 fails, got ${out.length} rows")
    val r = out.head
    assert(r.getAs[String]("conn") == "conn2")
    assert(r.getAs[Long]("n_attempts") == 3L)
    assert(r.getAs[Long]("n_admitted") == 2L)
    assert(r.getAs[Long]("n_absorbed") == 1L)
    assert(r.getAs[Long]("parked_close_ms") == 600L)
    assert(r.getAs[Long]("max_concurrent_parked") == 2L)
    assert(r.getAs[Long]("damped_pct") == 33L)
  }

  test("multi_ledger_fetch: crossing exactly at the 50-offset boundary") {
    // one partition, 60 dense offsets: fetch 0 = offs [0,30) stays in
    // ledger 0; fetch 1 = offs [30,60) crosses into ledger 1 at offs 50.
    val rows = (0 until 60).map(i =>
      (i.toLong, 1000L + i, 0L, "alpha", 1.0))
    val out = graft.log.LogOps.multiLedgerFetch(spark, mkDir(rows))
      .collect().map(r => r.getAs[Long]("fetch_id") -> r).toMap
    assert(out.size == 2)
    val f0 = out(0L)
    assert(f0.getAs[Long]("n_records") == 30L)
    assert(f0.getAs[Long]("n_entries") == 3L)
    assert(f0.getAs[Long]("n_ledgers") == 1L)
    assert(f0.getAs[Long]("n_crossings") == 0L)
    val f1 = out(1L)
    assert(f1.getAs[Long]("first_offs") == 30L)
    assert(f1.getAs[Long]("last_offs") == 59L)
    assert(f1.getAs[Long]("n_entries") == 3L)
    assert(f1.getAs[Long]("n_ledgers") == 2L)
    assert(f1.getAs[Long]("n_crossings") == 1L)
    assert(f1.getAs[Long]("n_fetches_part") == 2L)
    assert(f1.getAs[Long]("total_crossings_part") == 1L)
    assert(f1.getAs[Long]("crossing_rate_bp") == 5000L)
  }

  test("heavy_hitters_guarantees: one dominating key is present, bounds hold") {
    // user 3 (hk 'hot3') posts 100 of 130 records; 30 long-tail users
    // (ids not divisible by 3) post one each. Budget = 130/64 ~ 2, so
    // exactly one true heavy hitter, and every guarantee column is 0.
    val hot = (0 until 100).map(i =>
      (i.toLong, 1000L + i, 3L, "alpha", 1.0))
    val tail = (0 until 30).map { i =>
      val uid = 1000L + i * 3 + 1 // never divisible by 3
      (200L + i, 5000L + i, uid, "alpha", 1.0)
    }
    val out = graft.log.LogOps
      .heavyHittersGuarantees(spark, mkDir(hot ++ tail)).collect()
      .map(r => r.getAs[String]("universe") -> r).toMap
    // user 3's 100 records dominate in BOTH universes (k "3" raw,
    // 'hot3' skewed), so the two rows agree on every guarantee column
    assert(out.keySet == Set("raw", "skewed"))
    for (r <- out.values) {
      assert(r.getAs[Long]("n_records") == 130L)
      assert(r.getAs[Long]("error_budget") == 2L)
      assert(r.getAs[Long]("n_true_heavy") == 1L)
      assert(r.getAs[Long]("n_true_heavy_missing") == 0L)
      assert(r.getAs[Long]("n_overcount") == 0L)
      assert(r.getAs[Long]("n_bound_violations") == 0L)
    }
  }
}
