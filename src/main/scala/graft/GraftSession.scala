package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every entrypoint (Verify, Bench, tests)
  * must share for cross-engine parity:
  *
  * - `nanosAsLong`: two events generations exist — TIMESTAMP(NANOS) files
  *   (which Spark 4 refuses to read as a timestamp; this flag reads them as
  *   exact nanos longs) and TIMESTAMP(MICROS) files (read as TimestampType
  *   and canonicalized to nanos longs by Tables.canonTs). Either way every
  *   entrypoint sees `ts` as BIGINT nanos (DuckDB's epoch_ms(ts) ==
  *   ts_ns div 1_000_000).
  * - `inferTimestampNTZ=false`: millis timestamps read as TIMESTAMP (session
  *   tz UTC) so unix_millis() works and literals compare like DuckDB's
  *   naive timestamps.
  * - shuffle.partitions sized to cores, but AQE plans each shuffle at
  *   16x cores first (`initialPartitionNum`) and COALESCES down to the
  *   advisory size: small inputs still run a handful of reducers, while
  *   a 1000x input keeps enough reducers that per-task aggregation state
  *   fits (measured: basket's per-order collect_set OOMs a 32g JVM when
  *   600M fact rows land on 8 reducers, and runs clean at 16x). This is
  *   exactly the knob a 1000-executor cluster runs with — a high initial
  *   count AQE shrinks per-query — not a local hack.
  */
object GraftSession {
  def build(master: String, cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
