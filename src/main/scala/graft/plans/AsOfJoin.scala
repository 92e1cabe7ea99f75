package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Custom whole-operator #2: the AS-OF JOIN — for every left row, the
  * single latest right row of the same key whose time is <= the left
  * row's time (left-outer semantics; classic point-in-time lookup:
  * trades←quotes, events←model-versions, clicks←last-purchase).
  *
  * Spark has no Scala-API as-of join; expressing it relationally needs a
  * window over the UNION of both inputs or a per-row LATERAL subquery —
  * an O(n log n) sort of the combined data or an O(n·m) rescan. This
  * operator is the streaming-merge formulation: both sides arrive
  * hash-partitioned by key and sorted by (key, time) — Catalyst inserts
  * exchange/sort only when needed, exactly like SortMergeJoin — and each
  * partition is merged in ONE forward pass (O(n + m), no buffering beyond
  * a single right row per key).
  *
  * Tie policy: among right rows with equal time, the LAST in the right
  * sort order wins (callers append tie-break columns to `rightOrder`). */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  // right side is nullable: left rows may find no as-of match
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.size
    val schema = output
    left.execute().zipPartitions(right.execute()) { (leftIt, rightIt) =>
      val rBuf = rightIt.buffered
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nRight)
      val outProj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      var lastRight: InternalRow = null
      var lastRightKey: Any = null
      leftIt.map { lrow =>
        val lk = lKey.eval(lrow)
        val lt = lTime.eval(lrow)
        // drain right rows that are "behind or at" this left row
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rk = rKey.eval(rBuf.head)
          val c = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
          if (c < 0) rBuf.next() // keys already passed by the left cursor
          else if (c == 0 &&
            timeOrd.lteq(rTime.eval(rBuf.head).asInstanceOf[AnyRef], lt.asInstanceOf[AnyRef])) {
            lastRight = rBuf.next().copy()
            lastRightKey = rk
          } else advancing = false
        }
        val matched = lastRight != null &&
          keyOrd.compare(lastRightKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0
        outProj(joined(lrow, if (matched) lastRight else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
