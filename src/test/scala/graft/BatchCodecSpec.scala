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
