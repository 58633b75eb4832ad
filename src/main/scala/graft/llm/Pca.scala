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
  * covariance assembly, the squaring eigen-iteration, eigenvalue and
  * trace, deflation for the second component — runs on the d^2-row
  * checkpointed covariance frame: metadata, never data. No driver-side
  * collect anywhere; the loop frames are d rows.
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
  private val secondCache = TrieMap.empty[(SparkSession, String), DataFrame]
  private val momentsCache = TrieMap.empty[(SparkSession, String), DataFrame]

  def clearCache(): Unit = {
    fitCache.clear(); secondCache.clear(); momentsCache.clear()
  }

  /** The single data-sized pass, fingerprint-cached: the posexploded
    * (d^2+d+1)-row moment frame both components derive from.
    */
  private def moments(spark: SparkSession, dir: String): DataFrame =
    momentsCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(momentsCache, spark, dir, "embeddings"), {
        val agg = udaf(new MomentAgg(Dim), ExpressionEncoder[Seq[Double]]())
        Embeddings.withNorm(spark, dir)
          .agg(agg(col("v")).as("m"))
          .select(posexplode(col("m")).as(Seq("idx", "mv")))
          .localCheckpoint()
      })

  /** The 1-row corpus-size frame from the cached moments. */
  private def nOf(m: DataFrame): DataFrame =
    m.filter(col("idx") === lit(Dim * Dim + Dim)).select(col("mv").as("n"))

  /** cov_ij = gram_ij / n - mu_i * mu_j, as a checkpointed d^2-row
    * frame derived from the cached moments.
    */
  private def covOf(m: DataFrame): DataFrame = {
    val d = Dim
    val n = nOf(m)
    val mean = m
      .filter(col("idx") >= lit(d * d) && col("idx") < lit(d * d + d))
      .crossJoin(broadcast(n))
      .select((col("idx") - lit(d * d)).cast("long").as("i"),
        (col("mv") / col("n")).as("mu"))
    m.filter(col("idx") < lit(d * d))
      .select(expr(s"CAST(idx div $d AS BIGINT)").as("i"),
        expr(s"CAST(idx % $d AS BIGINT)").as("j"), col("mv"))
      .crossJoin(broadcast(n))
      .join(broadcast(mean.select(col("i"), col("mu").as("mui"))), "i")
      .join(broadcast(mean.select(col("i").as("j"), col("mu").as("muj"))), "j")
      .select(col("i"), col("j"),
        (col("mv") / col("n") - col("mui") * col("muj")).as("c"))
      .localCheckpoint()
  }

  /** Dominant eigenvector of a symmetric d^2-row matrix frame, as the
    * sign-canonicalized unit (i, w) frame — the shared eigensolve:
    * repeated squaring gives M^256 so the residual decays like
    * (lambda2/lambda1)^256 (plain power iteration at this frame size
    * would need hundreds of jobs near a degenerate gap); each squaring
    * is a d^2-row self-join with max-|entry| rescaling (eigenvectors
    * are scale-free). The best-conditioned row of M^256 (largest
    * diagonal, lowest index on ties) seeds two exact polish mat-vecs
    * with the ORIGINAL matrix. Sign: the largest-|w| entry (lowest dim
    * on ties) is made positive.
    */
  private def principal(mat: DataFrame): DataFrame = {
    var m = mat
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
      val y = mat.join(broadcast(v.select(col("i").as("j"), col("w"))), "j")
        .groupBy("i").agg(sum(col("c") * col("w")).as("y"))
      val nrm = y.agg(sqrt(sum(col("y") * col("y"))).as("nrm"))
      v = y.crossJoin(broadcast(nrm))
        .select(col("i"), (col("y") / col("nrm")).as("w"))
        .localCheckpoint()
      round += 1
    }
    val sgn = v
      .agg(max_by(col("w"), struct(abs(col("w")), -col("i"))).as("wpeak"))
      .select(when(signum(col("wpeak")) === 0.0, 1.0)
        .otherwise(signum(col("wpeak"))).as("s"))
    v.crossJoin(broadcast(sgn))
      .select(col("i"), (col("w") * col("s")).as("w"))
      .localCheckpoint()
  }

  /** Rayleigh quotient v' C v of a unit (i, w) frame against the
    * covariance — the exact eigenvalue of a converged direction.
    */
  private def quadForm(cov: DataFrame, v: DataFrame, as: String): DataFrame =
    cov
      .join(broadcast(v.select(col("i"), col("w").as("wi"))), "i")
      .join(broadcast(v.select(col("i").as("j"), col("w").as("wj"))), "j")
      .agg(sum(col("c") * col("wi") * col("wj")).as(as))

  /** Top principal component of the embedding covariance: per dimension
    * the unit component weight (sign-canonicalized: the largest-|w|
    * entry, lowest dim on ties, is made positive), with the eigenvalue,
    * explained-variance ratio, and corpus size on every row.
    */
  def pcaTopComponent(spark: SparkSession, dir: String): DataFrame =
    fitCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(fitCache, spark, dir, "embeddings"), {
        val m = moments(spark, dir)
        val n = nOf(m)
        val cov = covOf(m)
        val v = principal(cov)
        val lam = quadForm(cov, v, "eigenvalue")
        val trace = cov.filter(col("i") === col("j"))
          .agg(sum("c").as("total_var"))
        v.crossJoin(broadcast(lam))
          .crossJoin(broadcast(trace))
          .crossJoin(broadcast(n))
          .select(col("i").as("dim"), col("w").as("component"),
            col("eigenvalue"),
            (col("eigenvalue") / col("total_var")).as("explained_ratio"),
            col("n").cast("long").as("n_vecs"))
          .localCheckpoint()
      })

  /** Second principal component by deflation: the same squaring
    * eigensolve run on C2 = C − lambda1·v1·v1' (a d^2-row frame
    * subtraction riding the cached top component), with the eigenvalue
    * as the exact Rayleigh quotient against the ORIGINAL covariance and
    * the cumulative top-2 explained ratio on every row — the "is the
    * space rank-2" refinement of the rank-1 gate, and the axis pair a
    * 2-d separability plot projects onto. Deflation is exact for
    * symmetric matrices (C2's spectrum is C's with lambda1 zeroed), so
    * the dominant direction of C2 IS the second component of C.
    * Everything runs on metadata frames; the data pass is the shared
    * cached moment aggregation.
    */
  def pcaSecondComponent(spark: SparkSession, dir: String): DataFrame =
    secondCache.getOrElseUpdate(
      graft.Tables.freshCacheKey(secondCache, spark, dir, "embeddings"), {
        val m = moments(spark, dir)
        val n = nOf(m)
        val cov = covOf(m)
        val top = pcaTopComponent(spark, dir)
        val v1 = top.select(col("dim").as("i"), col("component").as("w"))
        val lam1 = top.agg(max("eigenvalue").as("lam1"))
        val cov2 = cov
          .join(broadcast(v1.select(col("i"), col("w").as("w1i"))), "i")
          .join(broadcast(v1.select(col("i").as("j"), col("w").as("w1j"))),
            "j")
          .crossJoin(broadcast(lam1))
          .select(col("i"), col("j"),
            (col("c") - col("lam1") * col("w1i") * col("w1j")).as("c"))
          .localCheckpoint()
        val v2 = principal(cov2)
        val lam2 = quadForm(cov, v2, "eigenvalue")
        val trace = cov.filter(col("i") === col("j"))
          .agg(sum("c").as("total_var"))
        v2.crossJoin(broadcast(lam2))
          .crossJoin(broadcast(lam1))
          .crossJoin(broadcast(trace))
          .crossJoin(broadcast(n))
          .select(col("i").as("dim"), col("w").as("component"),
            col("eigenvalue"),
            (col("eigenvalue") / col("total_var")).as("explained_ratio"),
            ((col("lam1") + col("eigenvalue")) / col("total_var"))
              .as("cum_explained"),
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

  /** 2-d separability grid in the top-2 principal plane: per label,
    * vector counts in (width-1/8 × width-1/8) projection cells along
    * (v1, v2) — the scatter a curation review actually plots, reduced
    * to a frame (labels that overlap along v1 alone may separate in
    * the plane; a label smeared across the whole grid marks encoder
    * noise). Both cached components fold to ONE broadcast two-array
    * row, so scoring is two in-row vec_dots over a single scan — no
    * explode, no join shuffle; the rollup is |labels|·|cells| rows.
    */
  def pcaScatter2d(spark: SparkSession, dir: String): DataFrame = {
    def fold(c: DataFrame) =
      c.agg(expr("transform(array_sort(collect_list(struct(dim, component)))" +
        ", s -> s.component)").as("comp"))
    val c1 = fold(pcaTopComponent(spark, dir))
      .select(col("comp").as("c1"))
    val c2 = fold(pcaSecondComponent(spark, dir))
      .select(col("comp").as("c2"))
    Embeddings.withNorm(spark, dir)
      .crossJoin(broadcast(c1))
      .crossJoin(broadcast(c2))
      .withColumn("b1",
        floor(expr("vec_dot(v, c1)") * lit(8.0)).cast("long"))
      .withColumn("b2",
        floor(expr("vec_dot(v, c2)") * lit(8.0)).cast("long"))
      .groupBy("label", "b1", "b2")
      .agg(count(lit(1)).as("n_vecs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pca_top_component" -> pcaTopComponent,
    "pca_second_component" -> pcaSecondComponent,
    "pca_projection_hist" -> pcaProjectionHist,
    "pca_scatter_2d" -> pcaScatter2d)

  // Rows-only by design: a double-precision eigen-iteration has no
  // bit-stable SQL mirror; OperatorSpec pins the results against an
  // exact driver-side reference eigensolve instead.
  val oracles: Map[String, String] = Map.empty
}
