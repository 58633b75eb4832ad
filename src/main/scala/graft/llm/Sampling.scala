package graft.llm

import graft.Tables.t
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset mixing for training-data curation.
  *
  * Sampling keys on a hash of the stable id — reproducible across runs,
  * engines, and cluster sizes (no RNG state), and embarrassingly parallel:
  * the keep-decision is a scan-side predicate at 100 TB.
  */
object Sampling {

  /** Stratified sampling: per-language keep rates (en 50%, others 20%)
    * applied via md5(doc_id) mod 100 — a deterministic coin.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bucket", md5Long(col("doc_id").cast("string")) % 100L)
      .withColumn("rate", when(col("lang") === "en", 50L).otherwise(20L))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket"))

  /** Dataset mixing: a 200-doc budget allocated across sources
    * proportionally to source size, taking each source's lowest doc_ids —
    * the deterministic form of ratio-controlled corpus interleaving.
    */
  def mixSources(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val bySource = Window.partitionBy("source").orderBy("doc_id")
    // Corpus total via a broadcast 1-row aggregate — a global window would
    // funnel the whole table through one task at scale.
    val total = d.agg(count(lit(1)).as("n_total"))
    d.crossJoin(broadcast(total))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("alloc", expr("(200 * n_src) div n_total"))
      .withColumn("rn", row_number().over(bySource).cast("long"))
      .filter(col("rn") <= col("alloc"))
      .select(col("doc_id"), col("source"), col("rn"), col("alloc"))
  }

  /** Deterministic 90/10 train/test split on an md5 coin over doc_id —
    * reproducible across runs, cluster sizes, and engines — with a
    * per-source assignment audit (split skew per source is the first thing
    * a leakage review checks).
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("split",
        when(md5Long(col("doc_id").cast("string")) % 10L < 9L, "train")
          .otherwise("test"))
      .groupBy("source", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("n_chars"),
        min("doc_id").as("min_doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_stratified" -> sampleStratified,
    "mix_sources" -> mixSources,
    "train_test_split" -> trainTestSplit)

  val oracles: Map[String, String] = Map(
    "train_test_split" ->
      """SELECT source,
        |  CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 10 < 9
        |    THEN 'train' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang,
        |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 AS bucket
        |FROM documents
        |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100
        |  < CASE WHEN lang = 'en' THEN 50 ELSE 20 END""".stripMargin,
    "mix_sources" ->
      """SELECT doc_id, source, rn, alloc FROM (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn,
        |    (200 * COUNT(*) OVER (PARTITION BY source))
        |      // COUNT(*) OVER () AS alloc
        |  FROM documents)
        |WHERE rn <= alloc""".stripMargin)
}
