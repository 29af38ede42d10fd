package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native as-of join: for every left row, the latest right row with the
  * same key and rightTime <= leftTime (left outer semantics).
  *
  * This is the custom-operator ladder rung (c) from SURVEY.md §1: a
  * logical node, a planner strategy, and a physical sort-merge operator.
  * EnsureRequirements provides hash co-partitioning on the key plus
  * per-partition (key, time) sort on both sides, so the physical merge is
  * a single forward pass per partition: zero extra memory beyond one
  * buffered right row, no join explosion, and skew bounded by the key's
  * own cardinality — the plan shape you want at 100 TB, identical to how
  * production time-series stores execute as-of joins.
  *
  * The union+window composition in Relational3.q34 computes the same
  * result with built-ins; this operator avoids materializing the union
  * and the window state, and AsofJoinSpec asserts both agree row-for-row.
  *
  * Constraints (documented, checked at construction): key expressions are
  * integral (long), time expressions are timestamps or longs.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash co-partition both sides on the key... */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** ...and sort each partition by (key, time) so the merge is one pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      // one-row lookahead over the right side
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      // latest right row already consumed for the current key
      var candKey = 0L
      var cand: InternalRow = null

      def timeOf(e: Expression, row: InternalRow): Long = e.eval(row) match {
        case l: Long => l
        case i: Int => i.toLong
        case other => other.asInstanceOf[Number].longValue()
      }

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow).asInstanceOf[Long]
        val lt = timeOf(lTimeB, lRow)
        // advance right cursor through all rows with (key < lk) or
        // (key == lk && time <= lt); remember the last same-key row seen
        var advancing = true
        while (advancing && rHead != null) {
          val rk = rKeyB.eval(rHead).asInstanceOf[Long]
          if (rk < lk || (rk == lk && timeOf(rTimeB, rHead) <= lt)) {
            if (rk == lk) { cand = rHead; candKey = rk }
            rHead = if (rIter.hasNext) rIter.next().copy() else null
          } else advancing = false
        }
        val matched = if (cand != null && candKey == lk) cand else nullRight
        outProj(joined(lRow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Session extension entry point: SparkSession.builder()
  * .withExtensions(new GraftExtensions) — injects the as-of planner
  * strategy, registers graft's scalar SQL functions, and exposes the
  * operator library as table-valued functions (graft.api.SqlSurface),
  * so a spark.sql-only session gets the full engine.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectOptimizerRule(_ => FuzzyMatchGuardRule)
    graft.functions.Register.builders.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
    graft.api.SqlSurface.injectables.foreach(e.injectTableFunction)
  }
}

object AsofJoin {
  /** DataFrame-level API. Ensures the strategy is registered on the
    * session (idempotent), resolves the named columns against each side,
    * and returns the joined frame (left columns + nullable right columns).
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def res(p: LogicalPlan, name: String): Expression =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    val plan = AsofJoinPlan(lPlan, rPlan,
      res(lPlan, leftKey), res(rPlan, rightKey),
      res(lPlan, leftTime), res(rPlan, rightTime))
    Bridge.ofRows(spark, plan)
  }
}
