package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.log.LogOps

/** Per-operator semantic invariants at sf0.001 (fast); exactness against
  * DuckDB is covered by Verify + tools/check_oracle.py.
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracle key has a query") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, dir).columns.nonEmpty, s"$name has no schema")
    }
  }

  test("log offsets are dense per partition") {
    val lo = LogOps.log(spark, dir)
      .groupBy("topic", "part")
      .agg(min("offs").as("mn"), max("offs").as("mx"), count(lit(1)).as("n"))
    assert(lo.filter(col("mn") =!= 0L || col("mx") =!= col("n") - 1).count() == 0)
  }

  test("compaction keeps exactly one record per key") {
    val c = LogOps.compact(spark, dir)
    assert(c.groupBy("topic", "part", "k").count().filter(col("count") > 1).count() == 0)
  }

  test("consumer lag is non-negative and bounded by log end") {
    val lag = coordinator.Groups.consumerLag(spark, dir)
    assert(lag.filter(col("lag") < 0 || col("lag") > col("log_end")).count() == 0)
  }

  test("range assignor covers every partition exactly once") {
    val a = coordinator.Groups.assignRange(spark, dir)
    val parts = LogOps.log(spark, dir).select("topic", "part").distinct().count()
    assert(a.count() == parts)
    assert(a.select("member").distinct().count() <= 3)
  }

  test("read_committed filters a strict subset") {
    val rc = txn.Transactions.readCommitted(spark, dir)
      .agg(sum("n_committed"), sum("n_aborted_filtered")).head()
    val total = LogOps.log(spark, dir).count()
    assert(rc.getLong(0) + rc.getLong(1) == total)
    assert(rc.getLong(1) > 0)
  }

  test("jaccard similarities are within [0, 1]") {
    val j = llm.Dedup.ngramJaccard(spark, dir)
    assert(j.filter(col("jac") < 0.0 || col("jac") > 1.0).count() == 0)
  }

  test("minhash candidates verified above threshold") {
    val m = llm.Dedup.dedupMinhashLsh(spark, dir)
    assert(m.filter(col("jac") < 0.5).count() == 0)
  }

  test("ann returns at most k ranked neighbors per query") {
    val a = llm.Similarity.annBruteforce(spark, dir)
    assert(a.groupBy("q_id").count().filter(col("count") > 5).count() == 0)
    assert(a.filter(col("cos") > 1.0000001 || col("cos") < -1.0000001).count() == 0)
  }

  test("unpivot(pivot) round-trips to the plain group counts") {
    val melted = analytics.Analytics.unpivotTopics(spark, dir)
      .filter(col("n") > 0)
      .withColumnRenamed("topic", "event_type")
    val direct = Tables.t(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    assert(melted.exceptAll(direct).count() == 0 &&
      direct.exceptAll(melted).count() == 0)
  }

  test("HLL sketch estimate within 5% of exact distinct counts") {
    val e = Tables.t(spark, dir, "events")
    val both = e.groupBy("event_type").agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id", 0.02).as("est"))
    assert(both.filter(
      org.apache.spark.sql.functions.abs(col("est") - col("exact")) >
        col("exact") * 0.05).count() == 0)
  }

  test("multimodal pipeline preserves rows and decode invariants") {
    val m = llm.Multimodal.multimodalPipeline(spark, dir)
    val docs = Tables.t(spark, dir, "documents").count()
    assert(m.count() == docs)
    assert(m.select("media_type").distinct().count() == 3)
    assert(m.filter(col("batch_size") > 64).count() == 0)
    // resize caps the long edge at 256 and preserves which edge is longer
    assert(m.filter(greatest(col("resized_w"), col("resized_h")) > 256).count() == 0)
    // frame sampling only applies to video and keeps ~1/4 of frames
    assert(m.filter(col("media_type") =!= "video" && col("n_frames") =!= 1).count() == 0)
    assert(m.filter(col("sampled_frames") > col("n_frames")).count() == 0)
  }
}
