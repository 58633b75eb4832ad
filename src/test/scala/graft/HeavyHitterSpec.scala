package graft

import graft.log.LogOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries aggregator's epsilon guarantee, pinned against exact
  * counts: no overcounts, undercounts bounded by n/k, and every true
  * heavy hitter (frequency > n/k) present in the summary.
  */
class HeavyHitterSpec extends AnyFunSuite {
  lazy val spark = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.01"
  val k = 64

  test("MG sketch holds the Misra-Gries guarantees against exact counts") {
    val sketch = LogOps.heavyHittersSketch(spark, dir)
    val exact = LogOps.log(spark, dir).groupBy("topic", "k")
      .agg(count(lit(1)).as("n"))
    val totals = exact.groupBy("topic").agg(sum("n").cast("long").as("total"))
    val joined = sketch.join(exact, Seq("topic", "k"))
      .join(totals, "topic")
    // every sketched key exists exactly (inner join loses nothing)
    assert(joined.count() == sketch.count())
    // estimates never overcount and undercount by at most n/k
    assert(joined.filter(col("est") > col("n")).count() == 0)
    assert(joined.filter(col("n") - col("est") > col("total") / k).count() == 0)
    // every true heavy hitter is present
    val heavy = exact.join(totals, "topic")
      .filter(col("n") > col("total") / k)
    val missing = heavy.join(sketch, Seq("topic", "k"), "left_anti")
    assert(missing.count() == 0)
    // the summary is bounded
    val sizes = sketch.groupBy("topic").agg(count(lit(1)).as("sz"))
    assert(sizes.filter(col("sz") > k - 1).count() == 0)
  }
}
