package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-bound per-row operators (hashing,
  * shingling, similarity): when the scan yields fewer partitions than
  * cores — small files, or one giant row-group — CPU-heavy map work runs
  * on a fraction of the machine. A round-robin repartition up to the
  * default parallelism costs one tiny shuffle of the (narrow) input and
  * buys full-width compute. No-op when the scan is already wide, so it is
  * safe to leave in place at cluster scale. */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
