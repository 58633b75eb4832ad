package graft

import graft.log.{BatchCodec, LogOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batch encode must be lossless and respect batching invariants. */
class BatchCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  test("encode -> decode round trip preserves every record") {
    import spark.implicits._
    val decoded = BatchCodec.encodeBatches(spark, dir)
      .select("topic", "part", "first_offs", "n", "payload").as[BatchCodec.Batch]
      .flatMap(BatchCodec.decodeBatch)
      .toDF()
    val original = LogOps.log(spark, dir).select("topic", "part", "offs", "k", "v")
    assert(decoded.exceptAll(original).count() == 0 &&
      original.exceptAll(decoded).count() == 0)
  }

  test("tombstones (null key/value) round-trip losslessly") {
    val recs = Seq(
      BatchCodec.LogRec("t", 0L, 10L, "k1", null),
      BatchCodec.LogRec("t", 0L, 11L, null, "v2"),
      BatchCodec.LogRec("t", 0L, 12L, "k3", "v3"))
    assert(BatchCodec.decodeBatch(BatchCodec.encodeGroup(recs)) == recs)
  }

  test("oversized offset delta is rejected, not truncated") {
    val recs = Seq(
      BatchCodec.LogRec("t", 0L, 0L, "a", "b"),
      BatchCodec.LogRec("t", 0L, Int.MaxValue.toLong + 1L, "c", "d"))
    assertThrows[IllegalArgumentException](BatchCodec.encodeGroup(recs))
  }

  test("batches are bounded and offset-contiguous per partition") {
    val b = BatchCodec.encodeBatches(spark, dir)
    assert(b.filter(col("n") > BatchCodec.MaxBatch).count() == 0)
    // Sum of batch sizes per partition == record count per partition.
    val perPart = b.groupBy("topic", "part").agg(sum("n").as("total"))
    val want = LogOps.log(spark, dir).groupBy("topic", "part").count()
    assert(perPart.join(want, Seq("topic", "part"))
      .filter(col("total") =!= col("count")).count() == 0)
  }
}
