package graft

import org.apache.spark.sql.SparkSession

/** One-off profiler for d40_dedup_clusters: times the candidate-pair
  * stage vs the connected-components stage separately, 3 reps each, so
  * a bench regression can be attributed before any optimization.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.D40Profile */
object D40Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (256 << 10).toString)
      .config("spark.sql.files.openCostInBytes", (64 << 10).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.install(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val pairs = t("candidatePairs") {
        graft.dedup.DedupOps.candidatePairs(spark, sfDir).localCheckpoint()
      }
      println(s"  pairs=${pairs.count()}")
      t("connectedComponents") {
        graft.dedup.DedupOps.connectedComponents(pairs)
          .write.format("noop").mode("overwrite").save()
      }
      t("full d40 (registry)") {
        Registry.queries("d40_dedup_clusters")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
