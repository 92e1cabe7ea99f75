package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator (SURVEY.md §7.4 mechanism (c)): exact top-k rows
  * per key, executed with per-key BOUNDED HEAPS instead of the built-in
  * window formulation (`row_number().over(partitionBy(key).orderBy(...))
  * <= k`), which SORTS every row of every group before discarding all but
  * k. For a 100 TB fact table with millions of rows per hot key, the
  * window plan's per-partition sort is O(n log n) in TOTAL data and spills;
  * this operator is O(n log k) with O(#keys·k) memory and no sort buffer.
  *
  * Plumbing: logical node → planner strategy → physical exec, injected via
  * `spark.experimental.extraStrategies` (GraftExtensions.install). The
  * exec declares `ClusteredDistribution(keys)`, so Catalyst inserts the
  * hash exchange only when the child isn't already co-partitioned —
  * bucketed/pre-partitioned inputs run it shuffle-free. */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // Two-phase plan, same shape as partial/final aggregation: a PARTIAL
      // top-k runs on each map-side partition BEFORE the exchange, so at
      // most k rows per (key × input partition) are shuffled — on a
      // 100 TB fact table that turns a full-data shuffle into a
      // #keys·k-row shuffle, exactly like Spark's own WindowGroupLimit
      // pushdown for rank windows. The FINAL pass after the hash exchange
      // is exact regardless of what the partial kept.
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final pass co-locates each key's rows (Catalyst adds the exchange
    * only if needed); the partial pass runs wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  /** Memory bound for the partial pass, in RETAINED ROWS (not keys): the
    * map-side filter stops admitting NEW keys once admitted keys × k
    * reaches this budget and passes later keys' rows through unfiltered
    * (the final pass stays exact). Bounding rows rather than keys makes
    * partial-state memory independent of k — a key-count cap of 2^18 with
    * k=1000 would have let one map task hold 256M rows. Same reason hash
    * aggregation spills, solved by degrading to a no-op instead of
    * spilling. Tunable for tests/deployments via the session conf key. */
  private def maxPartialRows: Int =
    conf.getConfString("graft.topk.partialBudgetRows", (1 << 21).toString).toInt
  private def maxPartialKeys: Int = math.max(1, maxPartialRows / math.max(1, k))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    val isPartial = partial
    val keyCap = maxPartialKeys
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      // ascending `ordering` = the requested output order; the heap keeps
      // its WORST (max) element at the head so exceeding rows evict in
      // O(log k)
      val ordering: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      // lazily concatenated: the heap drain below only evaluates after
      // this flatMap has consumed the whole input
      val passedThrough = rows.flatMap { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None if !isPartial || heaps.size < keyCap =>
            val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
          case None => null // partial over budget: pass the row through
        }
        if (heap == null) Iterator.single(row)
        else {
          if (heap.size < limit) heap.enqueue(rowProj(row).copy())
          else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(rowProj(row).copy())
          }
          Iterator.empty
        }
      }
      passedThrough ++ heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
