package graft

/** Dev tool: time named queries (`runMain graft.Time <sfDir> <name>...`) —
  * the single-query companion to Bench for perf iteration.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_agg")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"[time] $n%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($c rows)")
    }
    spark.stop()
  }
}
