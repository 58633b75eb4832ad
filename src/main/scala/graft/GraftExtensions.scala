package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{GramHashes, JaccardSorted, MinHashSig, SimHash48, VecDot}

/** Session extensions registering graft's native functions, so a user can
  * enable the whole library with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and call
  * `minhash_sig` / `vec_dot` / `gram_hashes` / `simhash48` from SQL without
  * touching Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr) - 24 universal-hash minima"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head, 24)))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - ordered-fold dot product"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("gram_hashes"),
      info("gram_hashes", "gram_hashes(s, n, mod) - distinct md5-prefix n-gram hashes"),
      (exprs: Seq[Expression]) => GramHashes(exprs.head,
        exprs(1).eval() match { case i: Int => i; case l: Long => l.toInt },
        exprs(2).eval() match { case i: Int => i.toLong; case l: Long => l })))
    e.injectFunction((FunctionIdentifier("simhash48"),
      info("simhash48", "simhash48(arr) - 48-bit simhash of string array"),
      (exprs: Seq[Expression]) => SimHash48(exprs.head)))
    e.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted", "jaccard_sorted(a, b) - merge-walk Jaccard of sorted long arrays"),
      (exprs: Seq[Expression]) => JaccardSorted(exprs(0), exprs(1))))
  }
}
