package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}

/** Public API for the AsOfJoin operator. Key/time columns must be
  * non-null; append tie-break column names for deterministic choice among
  * equal right times. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    def attr(df: DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(
          s"no column '$n' in [${df.queryExecution.analyzed.output.map(_.name).mkString(", ")}]"))
    GraftBridge.ofRows(spark, AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime),
      rightTieBreak.map(attr(right, _))))
  }
}
