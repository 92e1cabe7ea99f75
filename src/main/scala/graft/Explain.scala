package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of registered queries
  * so scan pruning (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin vs shuffle), and WholeStageCodegen coverage can be
  * reviewed. Usage: runMain graft.Explain [queryName ...] (default: the
  * bench headline set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic engine setup: native functions, strategies, rewrites
    graft.functions.GraftExtensions.install(spark)
    val names =
      if (args.nonEmpty) args.toSeq
      else Registry.all.filter(_.bench).map(_.name)
    names.foreach {
      case "entry" => // driver-contract smoke: flagship on sf0.001
        val df = SparkEntry.entry(spark)
        println(s"\n========== entry ==========\nrows=${df.count()}")
        df.explain("formatted")
      case n => Registry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None =>
          System.err.println(
            s"unknown query '$n'. Registered: ${Registry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
