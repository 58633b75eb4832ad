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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "glog_read" -> glogRead)

  val oracles: Map[String, String] = Map(
    "glog_read" -> (LogOps.logSql +
      "SELECT topic, part, offs, event_id, tms, k, v FROM log"))
}
