package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-engine arithmetic assumptions the oracles lean on.
  *
  * Several oracles pair Spark `pmod(x, k)` with DuckDB `x % k` on
  * data-derived ids (token_validation: user_id; tenant_coordinator_
  * placement / coordinator_placement: event_id; the log-view convention
  * generally). pmod and % agree ONLY for non-negative x — an adversarial
  * corpus with negative ids would break oracle-exactness silently. This
  * spec makes that corpus fail loudly here instead.
  */
class ParityAssumptionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  test("ids fed to pmod-vs-% oracles are non-negative") {
    val ev = Tables.t(spark, dir, "events")
      .agg(min("event_id").as("min_event"), min("user_id").as("min_user"))
      .head()
    assert(ev.getLong(0) >= 0L,
      s"events.event_id has negative values (min=${ev.getLong(0)}); " +
        "pmod/% oracle parity no longer holds — switch the affected " +
        "oracles to sign-explicit division before trusting them")
    assert(ev.getLong(1) >= 0L,
      s"events.user_id has negative values (min=${ev.getLong(1)}); " +
        "pmod/% oracle parity no longer holds")
    val li = Tables.t(spark, dir, "lineitem")
      .agg(min("l_orderkey").as("mo"), min("l_partkey").as("mp")).head()
    assert(li.getLong(0) >= 0L && li.getLong(1) >= 0L,
      "lineitem keys went negative; pmod/% oracle parity no longer holds")
  }
}
