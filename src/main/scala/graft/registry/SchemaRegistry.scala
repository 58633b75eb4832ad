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
  * JSON payloads, with THREE versions per subject (version = event_id mod 3
  * + 1 — ≥3 versions so the transitive compatibility modes are a real
  * check, not degenerate to the non-transitive ones). `schema_infer` builds
  * the per-subject field inventory with type inference; `schema_compat`
  * runs the non-transitive BACKWARD check of the newest version (v3)
  * against the latest prior (v2); `schema_compat_transitive` checks v3
  * against ALL prior versions (CompatibilityChecker.java:141-146
  * BACKWARD_TRANSITIVE / FORWARD_TRANSITIVE / FULL_TRANSITIVE).
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

  /** The versioned field inventory (topic, version, field) — the one
    * version-model definition every compat/versions operator derives from.
    *
    * The payloads themselves carry a single field everywhere, so a purely
    * observed version model is degenerate (every version identical — no
    * compat check would ever fire). Each version's field set is therefore
    * the observed payload fields (present in every version) UNION a
    * deterministic evolution universe {ts, user, val, src, tag, geo}:
    * field f is in version v of subject t iff the first md5 hex digit of
    * "t#f#v" is 0-9 (~62% — the same engine-portable md5-coin modeling
    * discipline as Groups.protocolSelect's support matrix). Fields appear
    * AND disappear across versions, so transitive vs non-transitive modes
    * genuinely diverge.
    */
  private def versionedFields(spark: SparkSession, dir: String): DataFrame = {
    val observed = fields(spark, dir)
      .withColumn("version", pmod(col("event_id"), lit(3L)) + 1L)
      .select("topic", "version", "field")
    val universe = spark.createDataFrame(
      Seq("ts", "user", "val", "src", "tag", "geo").map(Tuple1(_))).toDF("field")
    val synth = LogOps.log(spark, dir).select("topic").distinct()
      .crossJoin(broadcast(
        spark.range(1, 4).select(col("id").as("version")).crossJoin(universe)))
      .filter(substring(md5(concat_ws("#",
        col("topic"), col("field"), col("version").cast("string"))), 1, 1)
        .rlike("^[0-9]$"))
      .select("topic", "version", "field")
    observed.union(synth).distinct()
  }

  /** Per-(topic, field) presence flags for the three schema versions. */
  private def versionFlags(spark: SparkSession, dir: String): DataFrame =
    versionedFields(spark, dir)
      .groupBy("topic", "field")
      .agg(
        max(when(col("version") === 1L, 1L).otherwise(0L)).as("has_v1"),
        max(when(col("version") === 2L, 1L).otherwise(0L)).as("has_v2"),
        max(when(col("version") === 3L, 1L).otherwise(0L)).as("has_v3"))

  def schemaInfer(spark: SparkSession, dir: String): DataFrame =
    fields(spark, dir)
      .groupBy("topic", "field")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("fval").as("n_vals"),
        when(min(when(col("fval").rlike("^-?[0-9]+$"), 1).otherwise(0)) === 1,
          "long").otherwise("string").as("inferred"))

  /** Non-transitive BACKWARD: the new version (v3) must retain every field
    * of the LATEST prior version (v2) — earlier versions are not consulted
    * (that is [[schemaCompatTransitive]]'s job).
    */
  def schemaCompat(spark: SparkSession, dir: String): DataFrame =
    versionFlags(spark, dir)
      .groupBy("topic")
      .agg(
        sum("has_v2").cast("long").as("n_prev_fields"),
        sum("has_v3").cast("long").as("n_new_fields"),
        sum(col("has_v2") * col("has_v3")).cast("long").as("n_common"),
        min(when(col("has_v2") === 1L && col("has_v3") === 0L, 0L).otherwise(1L))
          .as("backward_compatible"))

  /** Version registry: per (subject, version) the canonical schema
    * fingerprint — md5 of the sorted field list — and its field count
    * (SchemaStorage's subject -> versions -> schema-id mapping).
    */
  def schemaVersions(spark: SparkSession, dir: String): DataFrame =
    versionedFields(spark, dir)
      .groupBy("topic", "version")
      .agg(
        count(lit(1)).as("n_fields"),
        md5(concat_ws(",", sort_array(collect_list("field")))).as("fingerprint"))

  /** Non-transitive compatibility-mode matrix per subject
    * (CompatibilityChecker.java's BACKWARD / FORWARD / FULL modes), v3
    * checked against v2 only: backward = no v2 field dropped in v3,
    * forward = no v3 field absent from v2, full = both. One pass over the
    * same field inventory.
    */
  def schemaCompatModes(spark: SparkSession, dir: String): DataFrame =
    versionFlags(spark, dir)
      .groupBy("topic")
      .agg(
        min(when(col("has_v2") === 1L && col("has_v3") === 0L, 0L).otherwise(1L))
          .as("backward"),
        min(when(col("has_v3") === 1L && col("has_v2") === 0L, 0L).otherwise(1L))
          .as("forward"))
      .withColumn("full_compat", col("backward") * col("forward"))

  /** Transitive compatibility modes (CompatibilityChecker.java:141-146):
    * the new version (v3) checked against ALL prior versions, not just the
    * latest — BACKWARD_TRANSITIVE = no field of v1 OR v2 dropped in v3,
    * FORWARD_TRANSITIVE = no v3 field absent from v1 OR v2,
    * FULL_TRANSITIVE = both. Reported next to the non-transitive pair so
    * the matrix shows exactly which subjects pass the weak check but fail
    * the transitive one (a field dropped in v2 then re-added is the classic
    * case).
    */
  def schemaCompatTransitive(spark: SparkSession, dir: String): DataFrame =
    versionFlags(spark, dir)
      .groupBy("topic")
      .agg(
        min(when(col("has_v2") === 1L && col("has_v3") === 0L, 0L).otherwise(1L))
          .as("backward"),
        min(when((col("has_v1") === 1L || col("has_v2") === 1L) &&
          col("has_v3") === 0L, 0L).otherwise(1L)).as("backward_transitive"),
        min(when(col("has_v3") === 1L && col("has_v2") === 0L, 0L).otherwise(1L))
          .as("forward"),
        min(when(col("has_v3") === 1L &&
          (col("has_v1") === 0L || col("has_v2") === 0L), 0L).otherwise(1L))
          .as("forward_transitive"))
      .withColumn("full_transitive",
        col("backward_transitive") * col("forward_transitive"))

  /** Subject/version deletion impact
    * (/root/reference/schema-registry/.../model/SchemaStorage.java:63
    * `deleteSubject` — all versions of a subject removed; the REST
    * DELETE /subjects/{s} + /subjects/{s}/versions/{v} surface): a
    * deterministic md5 coin marks ~25% of subjects hard-deleted (every
    * version gone) and, independently, individual versions soft-deleted
    * on the survivors. Per subject: version counts before/deleted/
    * remaining, the re-pointed latest version (-1 when the subject is
    * gone), and whether compatibility checking has gone vacuous (fewer
    * than 2 remaining versions — nothing left to check a new schema
    * against). The destructive sibling of [[schemaVersions]], same mold
    * as delete_groups/delete_topics.
    *
    * Scale: operates on the (subject, version) registry — metadata-sized
    * after the same one aggregation the other registry views share.
    */
  def schemaDelete(spark: SparkSession, dir: String): DataFrame =
    versionedFields(spark, dir).select("topic", "version").distinct()
      .withColumn("subject_deleted",
        when(substring(md5(concat(lit("sdel#"), col("topic"))), 1, 1)
          .isin("0", "1", "2", "3"), 1L).otherwise(0L))
      .withColumn("version_deleted",
        when(substring(md5(concat_ws("#", lit("vdel"), col("topic"),
          col("version").cast("string"))), 1, 1)
          .isin("0", "1", "2", "3"), 1L).otherwise(0L))
      .withColumn("deleted",
        greatest(col("subject_deleted"), col("version_deleted")))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_versions_before"),
        max("subject_deleted").as("subject_deleted"),
        sum("deleted").cast("long").as("n_deleted"),
        sum(lit(1L) - col("deleted")).cast("long").as("n_remaining"),
        coalesce(max(when(col("deleted") === 0L, col("version"))), lit(-1L))
          .as("new_latest"))
      .withColumn("compat_vacuous",
        when(col("n_remaining") <= 1L, 1L).otherwise(0L))

  /** Per-subject effective compatibility mode
    * (/root/reference/schema-registry/.../resources/ConfigResource.java:92-123
    * — GET/PUT /config/{subject} backed by SchemaStorage
    * .getCompatibilityMode/setCompatibilityMode): the registry-wide
    * default (BACKWARD) unless the subject carries an override — a
    * deterministic md5 coin on the subject (~25% override rate, the next
    * hex digit picking among the six non-default modes; the
    * Admin.topicConfigs provenance discipline) — plus the admission
    * verdict the mode exists to produce: would this subject's own v3
    * registration be accepted under its effective mode (NONE always
    * admits; the rest read the [[schemaCompatTransitive]] matrix).
    *
    * Scale: subject-cardinality metadata all the way down — the compat
    * matrix aggregates on (topic, field) like every schema view; the
    * coin is one hash on the already-grouped row.
    */
  def subjectConfig(spark: SparkSession, dir: String): DataFrame = {
    val modes = Seq("NONE", "FORWARD", "FULL", "BACKWARD_TRANSITIVE",
      "FORWARD_TRANSITIVE", "FULL_TRANSITIVE")
    val h = md5(concat(lit("subjcfg#"), col("topic")))
    schemaCompatTransitive(spark, dir)
      .withColumn("full_compat", col("backward") * col("forward"))
      .withColumn("coin", substring(h, 1, 1))
      .withColumn("d", conv(substring(h, 2, 1), 16, 10).cast("long"))
      .withColumn("compatibility",
        when(!col("coin").isin("0", "1", "2", "3"), lit("BACKWARD"))
          .otherwise(element_at(array(modes.map(lit): _*),
            (pmod(col("d"), lit(6L)) + 1L).cast("int"))))
      .withColumn("source",
        when(col("coin").isin("0", "1", "2", "3"), "SUBJECT")
          .otherwise("DEFAULT"))
      .withColumn("v3_accepted",
        when(col("compatibility") === "NONE", 1L)
          .when(col("compatibility") === "BACKWARD", col("backward"))
          .when(col("compatibility") === "FORWARD", col("forward"))
          .when(col("compatibility") === "FULL", col("full_compat"))
          .when(col("compatibility") === "BACKWARD_TRANSITIVE",
            col("backward_transitive"))
          .when(col("compatibility") === "FORWARD_TRANSITIVE",
            col("forward_transitive"))
          .otherwise(col("full_transitive")))
      .select("topic", "compatibility", "source", "v3_accepted")
  }

  /** Content-addressed global schema IDs
    * (/root/reference/schema-registry/.../resources/SchemaResource.java:77-105
    * GET /schemas/ids/{id} + /versions; SchemaStorage.java:36,43
    * findSchemaById / findSchemaByDefinition): identical schema content
    * registered under any number of (subject, version) slots shares ONE
    * global id — the registry's dedup-by-definition contract. IDs are
    * assigned densely in fingerprint order (deterministic, engine-
    * portable); n_uses counts the slots sharing the id (the
    * /schemas/ids/{id}/versions answer).
    *
    * Scale: the id table is one row per DISTINCT schema — metadata-sized
    * by construction — so the unpartitioned ranking window and the join
    * back are both bounded; the (subject, version) side never shuffles
    * (broadcast).
    */
  def schemaIds(spark: SparkSession, dir: String): DataFrame = {
    val v = schemaVersions(spark, dir)
    val ids = v.groupBy("fingerprint")
      .agg(count(lit(1)).as("n_uses"))
      .withColumn("schema_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("fingerprint")).cast("long"))
    v.join(broadcast(ids), "fingerprint")
      .select("topic", "version", "schema_id", "fingerprint", "n_uses")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schema_ids" -> schemaIds,
    "subject_config" -> subjectConfig,
    "schema_delete" -> schemaDelete,
    "schema_infer" -> schemaInfer,
    "schema_compat" -> schemaCompat,
    "schema_compat_modes" -> schemaCompatModes,
    "schema_compat_transitive" -> schemaCompatTransitive,
    "schema_versions" -> schemaVersions)

  private val L = LogOps.logSqlCte

  private val fieldsSql: String =
    """f AS (SELECT topic, event_id, v, unnest(json_keys(v)) AS field FROM log),
      |fv AS (SELECT topic, event_id, field,
      |       json_extract_string(v, '$.' || field) AS fval FROM f)
      |""".stripMargin

  /** DuckDB mirror of [[versionedFields]] (continues fieldsSql; ends with
    * `vfields(topic, version, field)`).
    */
  private val vfieldsSql: String =
    """, uni AS (
      |  SELECT * FROM (VALUES ('ts'),('user'),('val'),('src'),('tag'),('geo'))
      |    u(field)),
      |synth AS (
      |  SELECT topic, CAST(v AS BIGINT) AS version, field
      |  FROM (SELECT DISTINCT topic FROM log)
      |  CROSS JOIN generate_series(1, 3) t(v) CROSS JOIN uni
      |  WHERE substring(md5(topic || '#' || field || '#' || CAST(v AS VARCHAR)),
      |      1, 1) BETWEEN '0' AND '9'),
      |vfields AS (
      |  SELECT DISTINCT topic, version, field FROM (
      |    SELECT topic, event_id % 3 + 1 AS version, field FROM fv
      |    UNION ALL SELECT * FROM synth))
      |""".stripMargin

  private val versSql: String = vfieldsSql +
    """, vers AS (
      |  SELECT topic, field,
      |    MAX(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS has_v1,
      |    MAX(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS has_v2,
      |    MAX(CASE WHEN version = 3 THEN 1 ELSE 0 END) AS has_v3
      |  FROM vfields GROUP BY topic, field)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "schema_ids" -> (L + fieldsSql + vfieldsSql +
      """, vers2 AS (
        |  SELECT topic, version,
        |    md5(string_agg(field, ',' ORDER BY field)) AS fingerprint
        |  FROM vfields GROUP BY topic, version),
        |ids AS (
        |  SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_uses,
        |    CAST(ROW_NUMBER() OVER (ORDER BY fingerprint) AS BIGINT)
        |      AS schema_id
        |  FROM vers2 GROUP BY fingerprint)
        |SELECT topic, version, schema_id, fingerprint, n_uses
        |FROM vers2 JOIN ids USING (fingerprint)""".stripMargin),
    "subject_config" -> (L + fieldsSql + versSql +
      """, cmpt AS (
        |  SELECT topic,
        |    MIN(CASE WHEN has_v2 = 1 AND has_v3 = 0 THEN 0 ELSE 1 END)
        |      AS backward,
        |    MIN(CASE WHEN (has_v1 = 1 OR has_v2 = 1) AND has_v3 = 0
        |      THEN 0 ELSE 1 END) AS backward_transitive,
        |    MIN(CASE WHEN has_v3 = 1 AND has_v2 = 0 THEN 0 ELSE 1 END)
        |      AS forward,
        |    MIN(CASE WHEN has_v3 = 1 AND (has_v1 = 0 OR has_v2 = 0)
        |      THEN 0 ELSE 1 END) AS forward_transitive
        |  FROM vers GROUP BY topic),
        |c2 AS (
        |  SELECT topic, backward, forward,
        |    backward * forward AS full_compat,
        |    backward_transitive, forward_transitive,
        |    backward_transitive * forward_transitive AS full_transitive,
        |    substring(md5('subjcfg#' || topic), 1, 1) AS coin,
        |    ('0x' || substring(md5('subjcfg#' || topic), 2, 1))::BIGINT AS d
        |  FROM cmpt),
        |c3 AS (
        |  SELECT topic,
        |    CASE WHEN coin NOT IN ('0','1','2','3') THEN 'BACKWARD'
        |      ELSE ['NONE','FORWARD','FULL','BACKWARD_TRANSITIVE',
        |            'FORWARD_TRANSITIVE','FULL_TRANSITIVE'][(d % 6 + 1)]
        |    END AS compatibility,
        |    CASE WHEN coin IN ('0','1','2','3') THEN 'SUBJECT'
        |      ELSE 'DEFAULT' END AS source,
        |    backward, forward, full_compat,
        |    backward_transitive, forward_transitive, full_transitive
        |  FROM c2)
        |SELECT topic, compatibility, source,
        |  CAST(CASE compatibility WHEN 'NONE' THEN 1
        |    WHEN 'BACKWARD' THEN backward
        |    WHEN 'FORWARD' THEN forward
        |    WHEN 'FULL' THEN full_compat
        |    WHEN 'BACKWARD_TRANSITIVE' THEN backward_transitive
        |    WHEN 'FORWARD_TRANSITIVE' THEN forward_transitive
        |    ELSE full_transitive END AS BIGINT) AS v3_accepted
        |FROM c3""".stripMargin),
    "schema_delete" -> (L + fieldsSql + vfieldsSql +
      """, dv AS (
        |  SELECT topic, version,
        |    CASE WHEN substring(md5('sdel#' || topic), 1, 1)
        |      IN ('0','1','2','3') THEN 1 ELSE 0 END AS subject_deleted,
        |    CASE WHEN substring(md5('vdel#' || topic || '#'
        |        || CAST(version AS VARCHAR)), 1, 1)
        |      IN ('0','1','2','3') THEN 1 ELSE 0 END AS version_deleted
        |  FROM (SELECT DISTINCT topic, version FROM vfields)),
        |d2 AS (
        |  SELECT *, GREATEST(subject_deleted, version_deleted) AS deleted
        |  FROM dv)
        |SELECT topic, COUNT(*) AS n_versions_before,
        |  CAST(MAX(subject_deleted) AS BIGINT) AS subject_deleted,
        |  CAST(SUM(deleted) AS BIGINT) AS n_deleted,
        |  CAST(SUM(1 - deleted) AS BIGINT) AS n_remaining,
        |  CAST(COALESCE(MAX(CASE WHEN deleted = 0 THEN version END), -1)
        |    AS BIGINT) AS new_latest,
        |  CAST(CASE WHEN SUM(1 - deleted) <= 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS compat_vacuous
        |FROM d2 GROUP BY topic""".stripMargin),
    "schema_infer" -> (L + fieldsSql +
      """SELECT topic, field, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT fval) AS BIGINT) AS n_vals,
        |  CASE WHEN MIN(CASE WHEN regexp_matches(fval, '^-?[0-9]+$')
        |    THEN 1 ELSE 0 END) = 1 THEN 'long' ELSE 'string' END AS inferred
        |FROM fv GROUP BY topic, field""".stripMargin),
    "schema_versions" -> (L + fieldsSql + vfieldsSql +
      """SELECT topic, version, COUNT(*) AS n_fields,
        |  md5(string_agg(field, ',' ORDER BY field)) AS fingerprint
        |FROM vfields GROUP BY topic, version""".stripMargin),
    "schema_compat_modes" -> (L + fieldsSql + versSql +
      """SELECT topic,
        |  CAST(MIN(CASE WHEN has_v2 = 1 AND has_v3 = 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS backward,
        |  CAST(MIN(CASE WHEN has_v3 = 1 AND has_v2 = 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS forward,
        |  CAST(MIN(CASE WHEN has_v2 = 1 AND has_v3 = 0 THEN 0 ELSE 1 END)
        |    * MIN(CASE WHEN has_v3 = 1 AND has_v2 = 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS full_compat
        |FROM vers GROUP BY topic""".stripMargin),
    "schema_compat_transitive" -> (L + fieldsSql + versSql +
      """SELECT topic,
        |  CAST(MIN(CASE WHEN has_v2 = 1 AND has_v3 = 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS backward,
        |  CAST(MIN(CASE WHEN (has_v1 = 1 OR has_v2 = 1) AND has_v3 = 0
        |    THEN 0 ELSE 1 END) AS BIGINT) AS backward_transitive,
        |  CAST(MIN(CASE WHEN has_v3 = 1 AND has_v2 = 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS forward,
        |  CAST(MIN(CASE WHEN has_v3 = 1 AND (has_v1 = 0 OR has_v2 = 0)
        |    THEN 0 ELSE 1 END) AS BIGINT) AS forward_transitive,
        |  CAST(MIN(CASE WHEN (has_v1 = 1 OR has_v2 = 1) AND has_v3 = 0
        |    THEN 0 ELSE 1 END)
        |    * MIN(CASE WHEN has_v3 = 1 AND (has_v1 = 0 OR has_v2 = 0)
        |    THEN 0 ELSE 1 END) AS BIGINT) AS full_transitive
        |FROM vers GROUP BY topic""".stripMargin),
    "schema_compat" -> (L + fieldsSql + versSql +
      """SELECT topic, CAST(SUM(has_v2) AS BIGINT) AS n_prev_fields,
        |  CAST(SUM(has_v3) AS BIGINT) AS n_new_fields,
        |  CAST(SUM(has_v2 * has_v3) AS BIGINT) AS n_common,
        |  CAST(MIN(CASE WHEN has_v2 = 1 AND has_v3 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS backward_compatible
        |FROM vers GROUP BY topic""".stripMargin))
}
