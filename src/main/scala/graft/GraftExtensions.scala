package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native functions, so a user can
  * enable the whole library with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and call
  * every native function from SQL without touching Scala. The function
  * list itself lives in [[graft.functions.NativeFunctions]] — one source
  * for this path and the in-session register helpers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    graft.functions.NativeFunctions.all.foreach {
      case (name, usage, builder) =>
        e.injectFunction((FunctionIdentifier(name), info(name, usage),
          builder))
    }
  }
}
