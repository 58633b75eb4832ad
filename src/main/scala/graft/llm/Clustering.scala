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

  /** Fit parameters for [[fittedCentroids]]: 16 cells (the IVF coarse
    * quantizer width) refined for at most 4 Lloyd rounds. MaxRounds is a
    * COMPUTE budget, not a semantic knob: the driver loop exits early at
    * the fixpoint (round r output == round r-1 output), and the oracle
    * unrolls exactly MaxRounds rounds — at a fixpoint the extra unrolled
    * rounds are no-ops (same centroids => same assignment => same means),
    * so early exit stays hash-identical either way.
    */
  private[llm] val FitK = 16
  private[llm] val MaxRounds = 4

  private val fitCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** K-means fitted to fixpoint (bounded by [[MaxRounds]]) over the
    * embedding table, seeded from the [[FitK]] lowest-id vectors — the
    * centroids [[kmeansFit]] publishes and Similarity's IVF family
    * (`ann_ivf`, `ann_ivf_nprobe2`, `semdedup`) consumes as its coarse
    * quantizer. Returns (cid, cv, cnrm, n_members).
    *
    * Scale: per round, assignment is one broadcast pass over the vectors
    * with map-side max_by reduction, and the mean is a partial-aggregated
    * (cid, dim) shuffle — the dedup_clusters loop discipline: the only
    * iterated frame is the k x dim centroid table, localCheckpoint'ed each
    * round so lineage stays flat; the convergence probe is a
    * set-difference over the k-row centroid frames, never over the data.
    */
  private[graft] def fittedCentroids(spark: SparkSession, dir: String): DataFrame = {
    // Keyed on a content fingerprint of the embeddings table, not the path
    // alone: data regenerated in-place mid-session (the gen_stress
    // workflow) re-fits instead of serving stale centroids.
    fitCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(fitCache, spark, dir, "embeddings"), {
      val vecs = Embeddings.directional(spark, dir)
      var cents = vecs.filter(col("vec_id") < FitK)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cnrm"), lit(1L).as("n_members"))
        .localCheckpoint()
      var round = 0
      var converged = false
      while (round < MaxRounds && !converged) {
        val assigned = nearestCentroid(
          vecs, cents.select("cid", "cv", "cnrm")).select("vec_id", "cid")
        val next = assigned.join(vecs, "vec_id")
          .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
          .select(col("cid"), col("dim"), expr(s"floor(x * $Q)").as("xq"))
          .groupBy("cid", "dim")
          .agg(count(lit(1)).as("n"), sum("xq").cast("long").as("sq"))
          .withColumn("c", col("sq").cast("double") / (col("n") * Q).cast("double"))
          .groupBy("cid")
          .agg(
            expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
              .as("cv"),
            max("n").as("n_members"))
          .withColumn("cnrm", expr("sqrt(vec_dot(cv, cv))"))
          .select("cid", "cv", "cnrm", "n_members")
          .localCheckpoint()
        // Fixpoint probe: this round's output vs its input, both
        // directions over the two checkpointed k-row frames — a driver
        // action over k rows, never over the data.
        converged =
          next.select("cid", "cv").exceptAll(cents.select("cid", "cv")).isEmpty &&
          cents.select("cid", "cv").exceptAll(next.select("cid", "cv")).isEmpty
        cents = next
        round += 1
      }
      cents
    })
  }

  /** Nearest-centroid assignment over a broadcast (cid, cv, cnrm)
    * frame — the ONE Spark-side definition (seed-K views, the Lloyd
    * loop, and Similarity's IVF cells all call it). Argmax by
    * (cosine, lowest cid) via max_by partial aggregation: the map side
    * reduces each vector's K candidate rows to one before the exchange,
    * so the shuffle carries (vec_id, cid), never K copies of the vector;
    * the tie-break matches every oracle's (ccos DESC, cid ASC).
    */
  private[llm] def nearestCentroid(vecs: DataFrame,
      cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("vec_dot(v, cv)") / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(expr("max_by(cid, struct(ccos, -cid))").as("cid"),
        max("ccos").as("best_cos"))

  /** Each vector with its nearest seed centroid (vec_id < 8) and the
    * cosine to it.
    */
  private def assigned(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Embeddings.directional(spark, dir)
    val cents = vecs.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    nearestCentroid(vecs, cents)
  }

  /** New centroids after one Lloyd step, long-form (cid, dim, c_new):
    * per-dimension mean of the assigned vectors' quantized components.
    */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Embeddings.directional(spark, dir).select(col("vec_id"), col("v"))
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

  /** The fitted centroids, long-form (cid, dim, c_fit, n_members) — the
    * published view of [[fittedCentroids]] the correctness gate checks
    * against the unrolled-Lloyd oracle.
    */
  def kmeansFit(spark: SparkSession, dir: String): DataFrame =
    fittedCentroids(spark, dir)
      .select(col("cid"), col("n_members"), posexplode(col("cv")).as(Seq("dim", "c_fit")))
      .select(col("cid"), col("dim").cast("long").as("dim"),
        col("c_fit"), col("n_members"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_fit" -> kmeansFit,
    "kmeans_step" -> kmeansStep,
    "kmeans_clusters" -> kmeansClusters)

  /** DuckDB mirror of [[fittedCentroids]]: [[MaxRounds]] Lloyd rounds
    * unrolled as CTEs (a fixpoint makes trailing rounds no-ops, matching
    * the driver loop's early exit). Ends with `fcent(cid, cv, cnrm)` plus
    * `fm(cid, dim, n, sq)` (the final round's long-form means). Shared by
    * kmeans_fit and Similarity's IVF-family oracles.
    */
  private[llm] def fitSql: String = {
    val dot = Similarity.dotSql("vecs.v", "c.cv")
    val rounds = (1 to MaxRounds).map { r =>
      val prev = if (r == 1) "c0" else s"c${r - 1}"
      s"""a$r AS (
         |  SELECT vecs.vec_id, vecs.v, c.cid,
         |    $dot / (vecs.nrm * c.cnrm) AS ccos
         |  FROM vecs CROSS JOIN $prev c),
         |b$r AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM a$r)
         |  WHERE rn = 1),
         |d$r AS (
         |  SELECT cid, unnest(generate_series(0, len(v) - 1)) AS dim,
         |    unnest(list_transform(v, x -> CAST(floor(x * $Q) AS BIGINT))) AS xq
         |  FROM b$r),
         |m$r AS (
         |  SELECT cid, dim, COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sq
         |  FROM d$r GROUP BY cid, dim),
         |c$r AS (
         |  SELECT cid, cv,
         |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(cv, x -> x * x)), (a, x) -> a + x)) AS cnrm
         |  FROM (SELECT cid,
         |          list(CAST(sq AS DOUBLE) / CAST(n * $Q AS DOUBLE) ORDER BY dim) AS cv
         |        FROM m$r GROUP BY cid))""".stripMargin
    }.mkString(",\n")
    s""", c0 AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs
       |  WHERE vec_id < $FitK),
       |$rounds,
       |fm AS (SELECT cid, dim, n, sq FROM m$MaxRounds),
       |fcent AS (SELECT cid, cv, cnrm FROM c$MaxRounds)
       |""".stripMargin
  }

  private val assignSql = Similarity.vecSql +
    s""", cents AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $K),
       |asg AS (
       |  SELECT q.vec_id, q.v, c.cid,
       |    ${Similarity.dotSql("q.v", "c.cv")} / (q.nrm * c.cnrm) AS ccos
       |  FROM vecs q CROSS JOIN cents c),
       |best AS (
       |  SELECT vec_id, v, cid, ccos FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn FROM asg)
       |  WHERE rn = 1)
       |""".stripMargin

  val oracles: Map[String, String] = Map(
    "kmeans_fit" -> (Similarity.vecSql + fitSql +
      s"""SELECT cid, dim,
         |  CAST(sq AS DOUBLE) / CAST(n * $Q AS DOUBLE) AS c_fit,
         |  n AS n_members
         |FROM fm""".stripMargin),
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
