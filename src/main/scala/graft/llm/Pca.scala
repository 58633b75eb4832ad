package graft.llm

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding column — the covariance-spectrum
  * quality gate a curation pipeline reads before trusting cosine
  * geometry (a top component explaining most of the variance means the
  * embedding space is nearly rank-1 and semantic dedup / ANN recall
  * claims are hollow; reference consumers meet the same payload-column
  * statistics problem through their schema'd record values,
  * schema-registry KopAvroSchema paths).
  *
  * Scale design (100 TB): the ONLY data-sized pass is a one-shot
  * moment aggregation (Gram + mean + count) through a typed
  * [[Aggregator]] with an Array[Double] buffer — map-side combined, so
  * the shuffle carries one (d^2+d+1)-double buffer per partition,
  * exactly the computeGramianMatrix shape. Everything after —
  * covariance assembly, 32 power-iteration mat-vecs, eigenvalue and
  * trace — runs on the d^2-row checkpointed covariance frame:
  * metadata, never data. No driver-side collect anywhere; the loop
  * frames are d rows.
  */
object Pca {

  /** Embedding width of the corpus (embeddings.parquet is d=64). The
    * aggregator fails loudly on any other width rather than silently
    * truncating.
    */
  private val Dim = 64

  /** One-pass moment accumulator: buffer = [gram (d*d) | sum (d) | n]. */
  private class MomentAgg(d: Int)
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = new Array[Double](d * d + d + 1)
    def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      require(x.length == d, s"embedding width ${x.length}, expected $d")
      val xa = x.toArray
      var r = 0
      while (r < d) {
        val xr = xa(r); val off = r * d; var c = 0
        while (c < d) { b(off + c) += xr * xa(c); c += 1 }
        b(d * d + r) += xr
        r += 1
      }
      b(d * d + d) += 1.0
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  private val fitCache = TrieMap.empty[(SparkSession, String), DataFrame]

  def clearCache(): Unit = fitCache.clear()

  /** Top principal component of the embedding covariance: per dimension
    * the unit component weight (sign-canonicalized: the largest-|w|
    * entry, lowest dim on ties, is made positive), with the eigenvalue,
    * explained-variance ratio, and corpus size on every row.
    */
  def pcaTopComponent(spark: SparkSession, dir: String): DataFrame =
    fitCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(fitCache, spark, dir, "embeddings"), {
      val d = Dim
      val agg = udaf(new MomentAgg(d), ExpressionEncoder[Seq[Double]]())
      // The single data-sized pass; localCheckpoint pins the 1-row result.
      val moments = Embeddings.withNorm(spark, dir)
        .agg(agg(col("v")).as("m"))
        .select(posexplode(col("m")).as(Seq("idx", "mv")))
        .localCheckpoint()
      val n = moments.filter(col("idx") === lit(d * d + d))
        .select(col("mv").as("n"))
      val mean = moments
        .filter(col("idx") >= lit(d * d) && col("idx") < lit(d * d + d))
        .crossJoin(broadcast(n))
        .select((col("idx") - lit(d * d)).cast("long").as("i"),
          (col("mv") / col("n")).as("mu"))
      // cov_ij = gram_ij / n - mu_i * mu_j, as a d^2-row frame.
      val cov = moments.filter(col("idx") < lit(d * d))
        .select(expr(s"CAST(idx div $d AS BIGINT)").as("i"),
          expr(s"CAST(idx % $d AS BIGINT)").as("j"), col("mv"))
        .crossJoin(broadcast(n))
        .join(broadcast(mean.select(col("i"), col("mu").as("mui"))), "i")
        .join(broadcast(mean.select(col("i").as("j"), col("mu").as("muj"))), "j")
        .select(col("i"), col("j"),
          (col("mv") / col("n") - col("mui") * col("muj")).as("c"))
        .localCheckpoint()
      // Repeated squaring on the metadata-sized covariance frame:
      // 8 normalize-and-square rounds give C^256, so the residual decays
      // like (lambda2/lambda1)^256 — plain power iteration at this frame
      // size would need hundreds of jobs to match a near-degenerate gap.
      // Each squaring is a d^2-row self-join; max-|entry| rescaling each
      // round keeps magnitudes in range (eigenvectors are scale-free).
      var m = cov
      var round = 0
      while (round < 8) {
        val scale = m.agg(max(abs(col("c"))).as("s"))
        val mn = m.crossJoin(broadcast(scale))
          .select(col("i"), col("j"), (col("c") / col("s")).as("c"))
        m = mn.as("a").join(mn.as("b"), col("a.j") === col("b.i"))
          .groupBy(col("a.i").as("i"), col("b.j").as("j"))
          .agg(sum(col("a.c") * col("b.c")).as("c"))
          .select(col("i"), col("j"), col("c"))
          .localCheckpoint()
        round += 1
      }
      // Rows of C^256 are v_i * v (up to scale); the best-conditioned
      // estimate is the row with the largest diagonal (= lambda * v_i^2,
      // lowest index on ties), polished by two exact mat-vecs with the
      // original covariance.
      val rsel = m.filter(col("i") === col("j"))
        .agg(max_by(col("i"), struct(col("c"), -col("i"))).as("r"))
      var v: DataFrame = {
        val row = m.join(broadcast(rsel), col("i") === col("r"))
          .select(col("j").as("i"), col("c").as("y"))
        val nrm0 = row.agg(sqrt(sum(col("y") * col("y"))).as("nrm"))
        row.crossJoin(broadcast(nrm0))
          .select(col("i"), (col("y") / col("nrm")).as("w"))
          .localCheckpoint()
      }
      round = 0
      while (round < 2) {
        val y = cov.join(broadcast(v.select(col("i").as("j"), col("w"))), "j")
          .groupBy("i").agg(sum(col("c") * col("w")).as("y"))
        val nrm = y.agg(sqrt(sum(col("y") * col("y"))).as("nrm"))
        v = y.crossJoin(broadcast(nrm))
          .select(col("i"), (col("y") / col("nrm")).as("w"))
          .localCheckpoint()
        round += 1
      }
      val lam = cov
        .join(broadcast(v.select(col("i"), col("w").as("wi"))), "i")
        .join(broadcast(v.select(col("i").as("j"), col("w").as("wj"))), "j")
        .agg(sum(col("c") * col("wi") * col("wj")).as("eigenvalue"))
      val trace = cov.filter(col("i") === col("j"))
        .agg(sum("c").as("total_var"))
      val sgn = v
        .agg(max_by(col("w"), struct(abs(col("w")), -col("i"))).as("wpeak"))
        .select(when(signum(col("wpeak")) === 0.0, 1.0)
          .otherwise(signum(col("wpeak"))).as("s"))
      v.crossJoin(broadcast(sgn))
        .crossJoin(broadcast(lam))
        .crossJoin(broadcast(trace))
        .crossJoin(broadcast(n))
        .select(col("i").as("dim"), (col("w") * col("s")).as("component"),
          col("eigenvalue"),
          (col("eigenvalue") / col("total_var")).as("explained_ratio"),
          col("n").cast("long").as("n_vecs"))
        .localCheckpoint()
    })

  /** Projection histogram along the top component: per label, vector
    * counts in width-1/16 projection buckets — the separability view a
    * curation pipeline reads next to the spectrum (labels whose
    * projections separate along the top axis mean one principal
    * direction encodes the label; fully overlapping histograms mean the
    * axis is label-neutral). The cached component folds to ONE
    * broadcast array row, so scoring is an in-row dot product over a
    * single scan — no explode, no join shuffle; the rollup is
    * |labels|*|buckets| rows.
    */
  def pcaProjectionHist(spark: SparkSession, dir: String): DataFrame = {
    val comp = pcaTopComponent(spark, dir)
      .agg(expr("transform(array_sort(collect_list(struct(dim, component)))" +
        ", s -> s.component)").as("comp"))
    Embeddings.withNorm(spark, dir)
      .crossJoin(broadcast(comp))
      .withColumn("proj", expr("vec_dot(v, comp)"))
      .withColumn("bucket",
        floor(col("proj") * lit(16.0)).cast("long"))
      .groupBy("label", "bucket")
      .agg(count(lit(1)).as("n_vecs"),
        min("proj").as("min_proj"), max("proj").as("max_proj"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pca_top_component" -> pcaTopComponent,
    "pca_projection_hist" -> pcaProjectionHist)

  // Rows-only by design: a 32-round double-precision eigen-iteration has
  // no bit-stable SQL mirror; OperatorSpec pins the result against an
  // exact driver-side reference eigensolve instead.
  val oracles: Map[String, String] = Map.empty
}
