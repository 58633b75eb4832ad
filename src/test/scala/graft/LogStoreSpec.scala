package graft

import graft.log.LogOps
import graft.sources.LogStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partitioned layout must preserve the log exactly and prune
  * partitions on topic predicates.
  */
class LogStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"
  lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_store").toString
    LogStore.materialize(spark, dir, p)
    p
  }

  test("materialized log preserves every record") {
    val a = LogOps.log(spark, dir).select("topic", "part", "offs", "event_id")
    val b = LogStore.read(spark, store).select("topic", "part", "offs", "event_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("bucketed table joins without a shuffle exchange") {
    val path = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    LogStore.materializeBucketed(spark, dir, "graft_log_bucketed", path)
    val q = LogStore.bucketedLagJoin(spark, "graft_log_bucketed")
    val rows = q.count()
    assert(rows == LogOps.log(spark, dir).select("part").distinct().count())
    val plan = q.queryExecution.executedPlan.toString
    // Bucketing must eliminate every SHUFFLE exchange (the broadcast
    // exchange for the small join side is expected and desirable).
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join:\n$plan")
    assert(plan.contains("Bucketed: true"))
    spark.sql("DROP TABLE IF EXISTS graft_log_bucketed")
  }

  test("topic predicate prunes partitions at the scan") {
    val q = LogStore.fetchFromStore(spark, store, "click", 0L, 100L)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(topic"), s"no partition filter in plan:\n$scan")
    // Pruned read touches only the click directory: every row is 'click'.
    assert(q.select("topic").distinct().collect().map(_.getString(0)).toSeq == Seq("click"))
  }
}
