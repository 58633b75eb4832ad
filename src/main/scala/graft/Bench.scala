package graft

/** Benchmark main: times every query at the given scale factor and prints
  * one JSON line for the driver (BENCH_r{N}.json).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    // Warm the JVM/codegen once so measured times reflect steady state.
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // Failed queries are reported as -1 so a broken query can never be
    // mistaken for a fast one, and excluded from the total.
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val nFail = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFail,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
