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
    s"/tmp/graft_glog/${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"

  def glogRead(spark: SparkSession, dir: String): DataFrame = {
    val p = storePath(dir)
    Glog.materialize(spark, dir, p)
    spark.read.format("glog").load(p)
      .select("topic", "part", "offs", "event_id", "tms", "k", "v")
  }

  /** Store-level compaction (Kafka's LogCleaner as a batch rewrite): read
    * a glog store, keep the latest record per (topic, part, key) with its
    * ORIGINAL offset (compaction never renumbers), and write a compacted
    * store — offsets inside segments stay ordered, so header-based offset
    * seeks keep working on the gaps.
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
    "glog_read" -> glogRead)

  val oracles: Map[String, String] = Map(
    "glog_read" -> (LogOps.logSql +
      "SELECT topic, part, offs, event_id, tms, k, v FROM log"))
}
