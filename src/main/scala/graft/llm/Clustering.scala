package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One Lloyd iteration of k-means over the embedding table — the batch
  * clustering primitive behind semantic dedup (SemDeDup prunes within
  * k-means cells) and IVF index builds (`ann_ivf` consumes exactly such
  * centroids).
  *
  * Cross-engine parity: the per-dimension mean is computed over components
  * quantized to 1e-6 with `floor` (exact long arithmetic in both engines),
  * then one long/long division to double — bit-identical without trusting
  * double->decimal rounding modes. Assignment reuses the ordered-fold
  * cosine (`vec_dot`) with (cos DESC, cid ASC) tie-break.
  *
  * Scale notes: the k=8 seed set is broadcast; assignment is one scan of
  * the vectors with a map-side `max_by` reduction (the shuffle carries one
  * (vec_id, cid, cos) row per vector, never k copies). The dimension
  * explode multiplies rows by dim=64 but partial aggregation reduces them
  * back to k*64 cells before the exchange — at 100 TB this stays one pass
  * over the vectors plus a k*dim-sized shuffle.
  */
object Clustering {

  private val K = 8
  private val Q = 1000000L

  /** Each vector with its nearest seed centroid (vec_id < 8) and the
    * cosine to it.
    */
  private def assigned(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Embeddings.withNorm(spark, dir)
    val cents = vecs.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("vec_dot(v, cv)") / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(expr("max_by(cid, struct(ccos, -cid))").as("cid"),
        max("ccos").as("best_cos"))
  }

  /** New centroids after one Lloyd step, long-form (cid, dim, c_new):
    * per-dimension mean of the assigned vectors' quantized components.
    */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Embeddings.withNorm(spark, dir).select(col("vec_id"), col("v"))
    assigned(spark, dir).join(vecs, "vec_id")
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("cid"), col("dim").cast("long").as("dim"),
        expr(s"floor(x * $Q)").as("xq"))
      .groupBy("cid", "dim")
      .agg(count(lit(1)).as("n_members"), sum("xq").cast("long").as("sum_q"))
      .withColumn("c_new",
        col("sum_q").cast("double") / (col("n_members") * Q).cast("double"))
      .drop("sum_q")
  }

  /** Cluster-level summary of the same assignment: size and mean cosine
    * cohesion (quantized the same way).
    */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    assigned(spark, dir)
      .select(col("cid"), expr(s"floor(best_cos * $Q)").as("cq"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"), sum("cq").cast("long").as("sum_q"))
      .withColumn("mean_cos",
        col("sum_q").cast("double") / (col("n_members") * Q).cast("double"))
      .drop("sum_q")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_step" -> kmeansStep,
    "kmeans_clusters" -> kmeansClusters)

  private val assignSql = Similarity.vecSql +
    s""", cents AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $K),
       |asg AS (
       |  SELECT q.vec_id, q.v, c.cid,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.cv[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.cnrm) AS ccos
       |  FROM vecs q CROSS JOIN cents c),
       |best AS (
       |  SELECT vec_id, v, cid, ccos FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn FROM asg)
       |  WHERE rn = 1)
       |""".stripMargin

  val oracles: Map[String, String] = Map(
    "kmeans_step" -> (assignSql +
      s""", dims AS (
         |  SELECT cid,
         |    unnest(generate_series(0, len(v) - 1)) AS dim,
         |    unnest(list_transform(v, x -> CAST(floor(x * $Q) AS BIGINT))) AS xq
         |  FROM best)
         |SELECT cid, dim, COUNT(*) AS n_members,
         |  CAST(CAST(SUM(xq) AS BIGINT) AS DOUBLE)
         |    / CAST(COUNT(*) * $Q AS DOUBLE) AS c_new
         |FROM dims GROUP BY 1, 2""".stripMargin),
    "kmeans_clusters" -> (assignSql +
      s"""SELECT cid, COUNT(*) AS n_members,
         |  CAST(CAST(SUM(CAST(floor(ccos * $Q) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |    / CAST(COUNT(*) * $Q AS DOUBLE) AS mean_cos
         |FROM best GROUP BY 1""".stripMargin))
}
