package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for e51_ivf_trained's 4-round 1.33↔1.59 s
  * oscillation (r13-r16): PHASE-TIMED, interleaved repetitions, so
  * host drift hits both arms equally and the cost attributes to a
  * named phase rather than a narrative. Phases: seed (first-k read),
  * train (2 Lloyd iterations = 2 embedding scans + k×d collects),
  * assign (final projection + cell_size window + orderBy). Arms:
  *
  *   cur   the registered query's shape — every phase re-reads
  *         embeddings.parquet
  *   ckpt  one localCheckpoint of the (vec_id, embedding) projection
  *         feeds train AND assign — 1 parquet decode instead of 3,
  *         bit-identical output (only materialization changes)
  *
  * Dev-only — run by hand, never by the driver. */
object E51AB {
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
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sim.{Similarity, SimilarityOps}
    import org.apache.spark.sql.expressions.Window

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def assignOut(emb: org.apache.spark.sql.DataFrame,
                  cents: Array[Array[Double]]): Unit =
      emb.select($"vec_id",
          element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1)
            .cast("bigint").as("cell"))
        .withColumn("cell_size",
          count(lit(1)).over(Window.partitionBy($"cell")).cast("bigint"))
        .orderBy($"vec_id")
        .write.format("noop").mode("overwrite").save()

    def once(mode: String): (Double, Double, Double) = {
      val embRaw = graft.io.Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding")
      val (emb, tPrep) =
        if (mode == "ckpt") time(embRaw.localCheckpoint())
        else (embRaw, 0.0)
      val (seed, tSeed) = time(SimilarityOps.centroids(spark, dir))
      val (cents, tTrain) = time(
        SimilarityOps.trainedSubCentroidsOn(emb, seed, SimilarityOps.e51Iters,
          0, SimilarityOps.Dim))
      val (_, tAssign) = time(assignOut(emb, cents))
      if (mode == "ckpt") { emb.unpersist(blocking = true); () }
      (tPrep + tSeed, tTrain, tAssign)
    }
    once("cur") // warmup
    val samples = scala.collection.mutable.Map(
      "cur" -> Vector.empty[(Double, Double, Double)],
      "ckpt" -> Vector.empty[(Double, Double, Double)])
    for (_ <- 1 to 5; mode <- Seq("cur", "ckpt")) {
      val t = once(mode)
      samples(mode) :+= t
      println(f"[e51ab] $mode%-4s seed=${t._1}%.3f train=${t._2}%.3f " +
        f"assign=${t._3}%.3f total=${t._1 + t._2 + t._3}%.3f s")
    }
    samples.foreach { case (m, ts) =>
      val tot = ts.map(t => t._1 + t._2 + t._3)
      println(f"[e51ab] $m%-4s min=${tot.min}%.3f " +
        f"median=${tot.sorted.apply(tot.size / 2)}%.3f " +
        f"phases(min): seed=${ts.map(_._1).min}%.3f " +
        f"train=${ts.map(_._2).min}%.3f assign=${ts.map(_._3).min}%.3f")
    }
    spark.stop()
  }
}
