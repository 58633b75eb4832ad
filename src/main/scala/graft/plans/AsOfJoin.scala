package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join: for every left row, the single latest right row with the
  * same key and right time <= left time.
  *
  * This is the one operator in the library Spark genuinely lacks as a
  * whole-plan primitive (the windowed carry-forward in Analytics covers
  * only the single-table case), so it gets the full extension stack:
  * logical node -> planner strategy (injected by GraftExtensions) ->
  * sort-merge physical operator. EnsureRequirements co-partitions both
  * sides on the key and sorts by (key, time), then each partition pair is
  * merged in one pass holding exactly one buffered match — at 100 TB that
  * is a single co-partitioned shuffle with O(1) state per key, the same
  * cost profile as a sort-merge join but without materializing all
  * right-side matches.
  *
  * Keys and times are LongType expressions (the log model's natural
  * coordinates); generalizing to arbitrary orderable types only changes
  * the comparator.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output
    val leftOut = left.output
    val rightOut = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Bind against nullable right attributes: an unmatched left row emits
      // a null-filled right side, so the projection must null-check those
      // ordinals even when the right child declared them non-nullable.
      val resultProj = UnsafeProjection.create(schema,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // One buffered candidate: the latest right row seen for matchKey.
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null
      // Cached evaluation of the parked right head (invalidated on advance)
      // so a long run of left rows doesn't re-run interpreted eval on the
      // same head row.
      var headValid = false
      var headSkip = false
      var headKey = 0L
      var headTime = 0L

      def evalHead(): Unit = {
        val head = rBuf.head
        val hk = rKey.eval(head)
        val ht = rTime.eval(head)
        // SQL join semantics: null keys/times never match — skip the row
        // rather than silently unboxing null to 0.
        headSkip = hk == null || ht == null
        if (!headSkip) {
          headKey = hk.asInstanceOf[Long]
          headTime = ht.asInstanceOf[Long]
        }
        headValid = true
      }

      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTime.eval(lRow)
        if (lk == null || lt == null) {
          resultProj(joined(lRow, nullRight))
        } else {
          val k = lk.asInstanceOf[Long]
          val t = lt.asInstanceOf[Long]
          // Advance the right side while it is still at-or-before (k, t).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            if (!headValid) evalHead()
            if (headSkip) { rBuf.next(); headValid = false }
            else if (headKey < k || (headKey == k && headTime <= t)) {
              val r = rBuf.next()
              headValid = false
              if (headKey == k) { matchKey = k; hasMatch = true; matchRow = r.copy() }
            } else advancing = false
          }
          if (hasMatch && matchKey == k) resultProj(joined(lRow, matchRow))
          else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOf {
  /** As-of join two frames on long key and long event-time columns (column
    * names may differ per side; keys and times must be non-null).
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // Resolve with the session's resolver so case sensitivity matches
    // spark.sql.caseSensitive, like every other column lookup.
    val resolver = spark.sessionState.conf.resolver
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(a => resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val plan = AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime))
    org.apache.spark.sql.GraftDatasetBridge.ofRows(spark, plan)
  }
}
