import graft._
object T {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[4]", "4")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q1_agg", "q5_join", "fetch", "token_count")) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(3000))
    }
  }
}
