package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of operator must actually plan as AsOfJoinExec and agree
  * with the windowed carry-forward formulation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  private def result = analytics.Analytics.asofJoinSignup(spark, dir)

  test("plans through the custom physical operator") {
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
  }

  test("matches the single-table window formulation") {
    val ev = Tables.t(spark, dir, "events")
      .withColumn("et", expr("(ts div 1000000) * 1048576 + event_id % 1048576"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("et")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = ev
      .withColumn("signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("st",
        last(when(col("event_type") === "signup", col("et")), ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "signup")
      .select("event_id", "user_id", "et", "signup_id", "st")
    val got = result
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("empty right side yields all-null matches, not an error") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("id", "key", "t")
    val right = Seq.empty[(Long, Long, Long)].toDF("rid", "rkey", "rt")
    val out = plans.AsOf.join(left, right, "key", "rkey", "t", "rt")
    assert(out.count() == 2)
    assert(out.filter(col("rid").isNotNull).count() == 0)
  }

  test("column resolution is case-insensitive under default config") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("id", "key", "t")
    val right = Seq((9L, 10L, 50L)).toDF("rid", "rkey", "rt")
    val out = plans.AsOf.join(left, right, "KEY", "RKEY", "T", "RT")
    assert(out.count() == 1)
    assert(out.head().getLong(3) == 9L)
  }

  test("events before any signup get a null match") {
    val r = result
    val withNull = r.filter(col("signup_id").isNull)
    // every null-match event precedes its user's first signup time
    val firstSignup = Tables.t(spark, dir, "events")
      .filter(col("event_type") === "signup")
      .withColumn("et", expr("(ts div 1000000) * 1048576 + event_id % 1048576"))
      .groupBy("user_id").agg(min("et").as("first_st"))
    assert(withNull.join(firstSignup, Seq("user_id"), "left")
      .filter(col("first_st").isNotNull && col("et") >= col("first_st"))
      .count() == 0)
  }
}
