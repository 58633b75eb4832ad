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
  * - shuffle.partitions sized to cores (AQE coalesces further); at cluster
  *   scale this would be 2-3x total cores.
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
