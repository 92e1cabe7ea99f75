package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B harness for the r15→r16 d47 +7.7% question: interleaved
  * repetitions with the positional auto-coalesce check ON (default 8)
  * vs OFF (0), so host drift hits both arms equally. Dev-only — run by
  * hand, never by the driver. */
object D47AB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (256 << 10).toString)
      .config("spark.sql.files.openCostInBytes", (64 << 10).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.install(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries("d47_incremental_dedup")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    val samples = scala.collection.mutable.Map(
      "on" -> Vector.empty[Double], "off" -> Vector.empty[Double])
    for (_ <- 1 to 5; mode <- Seq("on", "off")) {
      spark.conf.set("graft.txn.posCoalesceAt",
        if (mode == "on") "8" else "0")
      val t = once()
      samples(mode) :+= t
      println(f"[d47ab] $mode%-3s $t%.3f s")
    }
    samples.foreach { case (m, ts) =>
      println(f"[d47ab] $m%-3s min=${ts.min}%.3f median=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
