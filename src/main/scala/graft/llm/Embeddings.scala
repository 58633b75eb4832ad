package graft.llm

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single definition of the vector + norm projection used by every cosine
  * path (Similarity, Dedup) — the fold-order contract with the DuckDB
  * oracle lives here and nowhere else.
  */
object Embeddings {
  def withNorm(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecDot.register(spark)
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
  }
}
