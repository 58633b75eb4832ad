package graft.sources

import graft.log.LogOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-checked query over the [[Glog]] store: materialize the log into
  * the engine's own segment format (idempotent), read it back through the
  * DataSource V2 connector, and verify the round trip hash-exactly against
  * the DuckDB oracle computing the same log view from the raw events.
  */
object GlogOps {

  private def storePath(dir: String): String =
    // java.io.tmpdir (the AnnIndex/BpeStore spelling, identical to the old
    // hardcoded /tmp on a stock JVM) so parallel test JVMs with private
    // tmpdirs never share a half-built store.
    new java.io.File(new java.io.File(sys.props("java.io.tmpdir"),
      "graft_glog"), dir.replaceAll("[^a-zA-Z0-9.]", "_")).toString

  def glogRead(spark: SparkSession, dir: String): DataFrame = {
    val p = storePath(dir)
    Glog.materialize(spark, dir, p)
    spark.read.format("glog").load(p)
      .select("topic", "part", "offs", "event_id", "tms", "k", "v")
  }

  /** Time-bounded fetch through the store: the same DSv2 read with a
    * pushed `tms` lower bound, so v4 batch headers skip whole batches
    * payload-free (the ListOffsets-by-time -> fetch path end to end over
    * the engine's own storage; Kafka's .timeindex seek). Hash-exact
    * against DuckDB filtering the log view the store was built from.
    */
  def glogFetchTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // One source of truth for the store path/format/projection: the tms
    // bound still pushes through glogRead's select into the DSv2 scan.
    glogRead(spark, dir)
      .filter(col("tms") >= 1705276800000L) // 2024-01-15 00:00 UTC
  }

  /** Store-level compaction (Kafka's LogCleaner as a batch rewrite): read
    * a glog store, keep the latest record per (topic, part, key) with its
    * ORIGINAL offset (compaction never renumbers), and write a compacted
    * store — offsets inside segments stay ordered, so header-based offset
    * seeks keep working on the gaps.
    *
    * "Latest" is the engine-wide (tms, event_id) rule — deliberately the
    * same survivor LogOps.compact and Streams.latestPerKey pick (and the
    * specs pin), NOT Kafka's highest-offset rule; the three compaction
    * paths must agree with each other first.
    */
  def compactStore(spark: SparkSession, inPath: String, outPath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy("topic", "part", "k")
      .orderBy(col("tms").desc, col("event_id").desc)
    val kept = spark.read.format("glog").load(inPath)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("topic", "part", "offs", "event_id", "tms", "k", "v")
      .as[Glog.Rec]
    Glog.writeSegments(kept, outPath, "segment-0")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "glog_read" -> glogRead,
    "glog_fetch_time" -> glogFetchTime)

  val oracles: Map[String, String] = Map(
    "glog_read" -> (LogOps.logSql +
      "SELECT topic, part, offs, event_id, tms, k, v FROM log"),
    "glog_fetch_time" -> (LogOps.logSql +
      """SELECT topic, part, offs, event_id, tms, k, v FROM log
        |WHERE tms >= 1705276800000""".stripMargin))
}
