package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
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

  /** Types whose physical representation is a primitive long/int —
    * eligible for the boxing-free merge loop. */
  private def physicalLong(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.LongType => true
    case _: org.apache.spark.sql.types.IntegerType => true
    case _: org.apache.spark.sql.types.DateType => true
    case _: org.apache.spark.sql.types.TimestampType => true
    case _: org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  private def getLong(dt: org.apache.spark.sql.types.DataType,
                      row: InternalRow, ord: Int): Long = dt match {
    case _: org.apache.spark.sql.types.IntegerType |
         _: org.apache.spark.sql.types.DateType => row.getInt(ord).toLong
    case _ => row.getLong(ord)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // both merge paths compare key-to-key and time-to-time across sides,
    // so the sides must agree on the logical type: a DateType (days) vs
    // TimestampType (micros) pair would otherwise compare raw physical
    // values and silently produce wrong matches. Callers cast explicitly.
    require(leftKey.dataType == rightKey.dataType,
      s"as-of join key types differ: ${leftKey.dataType.simpleString} vs " +
        s"${rightKey.dataType.simpleString} — cast one side explicitly")
    require(leftTime.dataType == rightTime.dataType,
      s"as-of join time types differ: ${leftTime.dataType.simpleString} vs " +
        s"${rightTime.dataType.simpleString} — cast one side explicitly")
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val nRight = right.output.size
    val schema = output
    // fast path: key and time read as primitive longs straight off the
    // row (no per-row boxing, no interpreted-Ordering dispatch) whenever
    // both are bound columns of integral/date/timestamp type — which is
    // every realistic as-of key. Nulls (contract: keys/times non-null)
    // degrade gracefully: null right rows are skipped, null left rows
    // emit the unmatched (null-extended) output.
    (lKey, rKey, lTime, rTime) match {
      case (lk: BoundReference, rk: BoundReference, lt: BoundReference, rt: BoundReference)
          if Seq(lk, rk, lt, rt).map(_.dataType).forall(physicalLong) &&
            // same logical type on both sides: raw-long comparison across
            // types with different physical units (DateType days vs
            // TimestampType micros) would silently mis-match; mixed pairs
            // take the interpreted path, which compares through Orderings
            lk.dataType == rk.dataType && lt.dataType == rt.dataType =>
        val (lkT, rkT, ltT, rtT) = (lk.dataType, rk.dataType, lt.dataType, rt.dataType)
        val (lkO, rkO, ltO, rtO) = (lk.ordinal, rk.ordinal, lt.ordinal, rt.ordinal)
        left.execute().zipPartitions(right.execute()) { (leftIt, rightIt) =>
          val rBuf = rightIt.buffered
          val joined = new JoinedRow
          val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nRight)
          val outProj = UnsafeProjection.create(schema.map(_.dataType).toArray)
          var lastRight: InternalRow = null
          var lastRightKey = 0L
          leftIt.map { lrow =>
            if (lrow.isNullAt(lkO) || lrow.isNullAt(ltO)) {
              outProj(joined(lrow, nullRight))
            } else {
              val lkv = getLong(lkT, lrow, lkO)
              val ltv = getLong(ltT, lrow, ltO)
              var advancing = true
              while (advancing && rBuf.hasNext) {
                val head = rBuf.head
                if (head.isNullAt(rkO) || head.isNullAt(rtO)) rBuf.next()
                else {
                  val rkv = getLong(rkT, head, rkO)
                  if (rkv < lkv) rBuf.next()
                  else if (rkv == lkv && getLong(rtT, head, rtO) <= ltv) {
                    lastRight = rBuf.next().copy()
                    lastRightKey = rkv
                  } else advancing = false
                }
              }
              val matched = lastRight != null && lastRightKey == lkv
              outProj(joined(lrow, if (matched) lastRight else nullRight))
            }
          }
        }
      case _ =>
        val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
        val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
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
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
