package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** Public API for the TopKPerKey operator. */
object TopK {

  /** Exact top-`k` rows per distinct value of `keys`, ranked by `orderBy`
    * — (columnName, ascending) pairs; include a unique tie-break column
    * for determinism.
    *
    * Attributes are resolved here against the analyzed child plan rather
    * than via the Column API: Spark 4 Columns carry lazily-resolved
    * ColumnNode wrappers (with non-serializable Origins) that only the
    * session's own analyzer unwraps, and custom logical nodes bypass that
    * machinery. */
  def perKey(df: DataFrame, keys: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$name' in [${analyzed.output.map(_.name).mkString(", ")}]"))
    val keyExprs = keys.map(attr)
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark, TopKPerKey(keyExprs, sortOrders, k, analyzed))
  }
}
