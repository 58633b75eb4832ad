package graft.registry

import graft.log.LogOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Schema-registry semantics
  * (/root/reference/schema-registry/.../model/Schema.java,
  * CompatibilityChecker.java) over the message payloads.
  *
  * Subjects are topics; a "schema version" is the field-set observed in the
  * JSON payloads. `schema_infer` builds the per-subject field inventory with
  * type inference; `schema_compat` runs a BACKWARD check between two
  * versions (v1 = even event_ids, v2 = odd): compatible iff no v1 field
  * disappeared in v2.
  *
  * Scale: field explosion is a narrow map-side op (from_json is codegen'd);
  * the aggregation key (topic, field) has tiny cardinality so the shuffle
  * is negligible; no driver-side JSON parsing.
  */
object SchemaRegistry {

  private def fields(spark: SparkSession, dir: String): DataFrame =
    LogOps.log(spark, dir)
      .select(col("topic"), col("event_id"),
        explode(from_json(col("v"), MapType(StringType, StringType)))
          .as(Seq("field", "fval")))

  def schemaInfer(spark: SparkSession, dir: String): DataFrame =
    fields(spark, dir)
      .groupBy("topic", "field")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("fval").as("n_vals"),
        when(min(when(col("fval").rlike("^-?[0-9]+$"), 1).otherwise(0)) === 1,
          "long").otherwise("string").as("inferred"))

  def schemaCompat(spark: SparkSession, dir: String): DataFrame =
    fields(spark, dir)
      .groupBy("topic", "field")
      .agg(
        max(when(pmod(col("event_id"), lit(2L)) === 0L, 1L).otherwise(0L)).as("has_v1"),
        max(when(pmod(col("event_id"), lit(2L)) === 1L, 1L).otherwise(0L)).as("has_v2"))
      .groupBy("topic")
      .agg(
        sum("has_v1").cast("long").as("n_v1_fields"),
        sum("has_v2").cast("long").as("n_v2_fields"),
        sum(col("has_v1") * col("has_v2")).cast("long").as("n_common"),
        min(when(col("has_v1") === 1L && col("has_v2") === 0L, 0L).otherwise(1L))
          .as("backward_compatible"))

  /** Version registry: per (subject, version) the canonical schema
    * fingerprint — md5 of the sorted field list — and its field count
    * (SchemaStorage's subject -> versions -> schema-id mapping).
    */
  def schemaVersions(spark: SparkSession, dir: String): DataFrame =
    fields(spark, dir)
      .withColumn("version", pmod(col("event_id"), lit(2L)) + 1L)
      .select("topic", "version", "field")
      .distinct()
      .groupBy("topic", "version")
      .agg(
        count(lit(1)).as("n_fields"),
        md5(concat_ws(",", sort_array(collect_list("field")))).as("fingerprint"))

  /** Full compatibility-mode matrix per subject
    * (CompatibilityChecker.java's BACKWARD / FORWARD / FULL modes):
    * backward = no v1 field dropped in v2, forward = no v2 field absent
    * from v1, full = both. One pass over the same field inventory.
    */
  def schemaCompatModes(spark: SparkSession, dir: String): DataFrame =
    fields(spark, dir)
      .groupBy("topic", "field")
      .agg(
        max(when(pmod(col("event_id"), lit(2L)) === 0L, 1L).otherwise(0L)).as("has_v1"),
        max(when(pmod(col("event_id"), lit(2L)) === 1L, 1L).otherwise(0L)).as("has_v2"))
      .groupBy("topic")
      .agg(
        min(when(col("has_v1") === 1L && col("has_v2") === 0L, 0L).otherwise(1L))
          .as("backward"),
        min(when(col("has_v2") === 1L && col("has_v1") === 0L, 0L).otherwise(1L))
          .as("forward"))
      .withColumn("full_compat", col("backward") * col("forward"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schema_infer" -> schemaInfer,
    "schema_compat" -> schemaCompat,
    "schema_compat_modes" -> schemaCompatModes,
    "schema_versions" -> schemaVersions)

  private val L = LogOps.logSqlCte

  private val fieldsSql: String =
    """f AS (SELECT topic, event_id, v, unnest(json_keys(v)) AS field FROM log),
      |fv AS (SELECT topic, event_id, field,
      |       json_extract_string(v, '$.' || field) AS fval FROM f)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "schema_infer" -> (L + fieldsSql +
      """SELECT topic, field, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT fval) AS BIGINT) AS n_vals,
        |  CASE WHEN MIN(CASE WHEN regexp_matches(fval, '^-?[0-9]+$')
        |    THEN 1 ELSE 0 END) = 1 THEN 'long' ELSE 'string' END AS inferred
        |FROM fv GROUP BY topic, field""".stripMargin),
    "schema_versions" -> (L + fieldsSql +
      """, vf AS (
        |  SELECT DISTINCT topic, event_id % 2 + 1 AS version, field FROM fv)
        |SELECT topic, version, COUNT(*) AS n_fields,
        |  md5(string_agg(field, ',' ORDER BY field)) AS fingerprint
        |FROM vf GROUP BY topic, version""".stripMargin),
    "schema_compat_modes" -> (L + fieldsSql +
      """, vers AS (
        |  SELECT topic, field,
        |    MAX(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS has_v1,
        |    MAX(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS has_v2
        |  FROM fv GROUP BY topic, field),
        |modes AS (
        |  SELECT topic,
        |    CAST(MIN(CASE WHEN has_v1 = 1 AND has_v2 = 0 THEN 0 ELSE 1 END)
        |      AS BIGINT) AS backward,
        |    CAST(MIN(CASE WHEN has_v2 = 1 AND has_v1 = 0 THEN 0 ELSE 1 END)
        |      AS BIGINT) AS forward
        |  FROM vers GROUP BY topic)
        |SELECT topic, backward, forward, backward * forward AS full_compat
        |FROM modes""".stripMargin),
    "schema_compat" -> (L + fieldsSql +
      """, vers AS (
        |  SELECT topic, field,
        |    MAX(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS has_v1,
        |    MAX(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS has_v2
        |  FROM fv GROUP BY topic, field)
        |SELECT topic, CAST(SUM(has_v1) AS BIGINT) AS n_v1_fields,
        |  CAST(SUM(has_v2) AS BIGINT) AS n_v2_fields,
        |  CAST(SUM(has_v1 * has_v2) AS BIGINT) AS n_common,
        |  CAST(MIN(CASE WHEN has_v1 = 1 AND has_v2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS backward_compatible
        |FROM vers GROUP BY topic""".stripMargin))
}
