package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial embedding shapes: a zero-norm vector (broken encoder
  * output) must be EXCLUDED from every cosine path (one such row used
  * to abort the whole stage with ANSI DIVIDE_BY_ZERO) while staying
  * fully visible to the norm-stats detector and the PCA moment pass.
  */
class EdgeEmbeddingsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")

  /** 20 vectors, d = 64; vec_id 0 is all-zeros. */
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edge_emb")
    d.toFile.deleteOnExit()
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    (0 until 20).map { i =>
      val v = if (i == 0) Array.fill(64)(0.0f)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
      (i.toLong, v.toSeq, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d.toString
  }

  test("cosine family survives a zero-norm vector and excludes it") {
    val g = llm.Similarity.knnGraph(spark, dir).cache()
    assert(g.count() > 0)
    assert(g.filter(isnan(col("cos"))).count() == 0)
    assert(g.filter(col("q_id") === 0L || col("n_id") === 0L).count() == 0)
    // the clustering fit and an ANN path run to completion too
    assert(llm.Clustering.kmeansClusters(spark, dir).count() > 0)
    assert(llm.Similarity.annBruteforce(spark, dir).count() >= 0)
    assert(llm.Dedup.dedupEmbedding(spark, dir).count() >= 0)
    // the append audit survives a tiny corpus where the md5 coin may
    // select an empty delta (shares guard to 0, no ANSI divide-by-zero)
    assert(llm.Similarity.ivfAppend(spark, dir).count() >= 0)
    g.unpersist()
  }

  test("the detectors still see the zero vector the cosine paths drop") {
    // norm stats: label 0's minimum norm IS zero — the detector fires
    val ns = llm.Similarity.embeddingNormStats(spark, dir)
    val l0 = ns.filter(col("label") === 0).head
    assert(l0.getAs[Long]("n_vecs") == 7L)
    // PCA moment pass includes all 20 vectors
    assert(llm.Pca.pcaTopComponent(spark, dir)
      .head.getAs[Long]("n_vecs") == 20L)
    // the per-dim calibration detector reads the UNfiltered frame too:
    // all 20 vectors counted per dimension, zero row included, no
    // divide hazard anywhere
    val ds = llm.Similarity.embeddingDimStats(spark, dir)
    assert(ds.count() == 64)
    assert(ds.filter(col("n") =!= 20L).count() == 0)
    // the graph-quality audits survive the punctured universe (vec 0
    // has no edges; triangles and label agreement stay well-defined)
    assert(llm.Similarity.knnTriangles(spark, dir)
      .filter(col("vec_id") === 0L).count() == 0)
    assert(llm.Similarity.knnLabelAgreement(spark, dir).count() > 0)
  }
}
