package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.sim.{Similarity, SimilarityOps}

/** The measure-don't-guess contract for e51: recall@5 of IVF search over
  * the k-means-TRAINED centroids must not be worse than over the
  * first-16-vectors stand-in, at the same nprobe — training exists to
  * shape cells around the data, and a training step that costs recall
  * would be a regression hidden behind a green assignment oracle. */
class TrainedIndexSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  private val NProbe = 2
  private val NProbes = 40

  /** Mean recall@5 over probes vec_id<NProbes of L2-cell IVF search with the
    * given centroid table (e48's join shape, L2 assignment both sides),
    * plus the mean number of candidates each probe scanned. */
  private[graft] def recallCand(cents: Array[Array[Double]], nprobe: Int,
                                dir: String, probeLo: Long = 0L): (Double, Double) =
    recallAndCandidates(cents, nprobe, dir, probeLo)

  private def recallAndCandidates(cents: Array[Array[Double]],
                                  nprobe: Int = NProbe,
                                  dir: String = Spec.sf0001,
                                  probeLo: Long = 0L): (Double, Double) = {
    val emb = Tables.embeddings(spark, dir)
    val w = Window.partitionBy($"probe_id").orderBy($"cos_sim".desc, $"vec_id")
    def top5(cands: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = cands
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"probe_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val probes = emb.filter($"vec_id" >= probeLo && $"vec_id" < probeLo + NProbes)
      .select($"vec_id".as("probe_id"), $"embedding".as("p"))
    val brute = top5(emb.crossJoin(broadcast(probes))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id", Similarity.cosine("embedding", "p").as("cos_sim")))
    val assigned = emb.select($"vec_id", $"embedding",
      element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1).as("cell"))
    val probeCells = emb.filter($"vec_id" >= probeLo && $"vec_id" < probeLo + NProbes)
      .select($"vec_id".as("probe_id"), $"embedding".as("p"),
        explode(Similarity.nearestSubCells("embedding", cents, nprobe, 0)).as("pcell"))
    val cands = assigned
      .join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id", Similarity.cosine("embedding", "p").as("cos_sim"))
    val nCands = cands.count().toDouble / brute.size
    val ivf = top5(cands)
    val recalls = brute.keys.toSeq.sorted.map { pid =>
      ivf.getOrElse(pid, Set.empty).intersect(brute(pid)).size / 5.0
    }
    (recalls.sum / recalls.size, nCands)
  }

  test("trained centroids win the recall/cost frontier at equal nprobe") {
    val standIn = SimilarityOps.centroids(spark, Spec.sf0001)
    val trained = SimilarityOps.trainedCentroids(
      spark, Spec.sf0001, SimilarityOps.e51Iters)
    val (rStand, cStand) = recallAndCandidates(standIn)
    val (rTrained, cTrained) = recallAndCandidates(trained)
    info(f"stand-in: recall@5 $rStand%.2f scanning $cStand%.0f candidates/probe")
    info(f"trained:  recall@5 $rTrained%.2f scanning $cTrained%.0f candidates/probe")
    // training balances cells: the same nprobe must scan FEWER candidates
    // (the cost side — skewed stand-in cells buy recall by scanning a
    // huge corpus fraction), and recall per scanned candidate must go UP
    // (the frontier test: less work per unit of quality is the entire
    // point of a trained coarse quantizer)
    assert(cTrained < cStand,
      f"training did not shrink the scanned candidate set: $cTrained%.0f >= $cStand%.0f")
    assert(rTrained / cTrained > rStand / cStand,
      f"recall per candidate fell: ${rTrained / cTrained}%.4f <= ${rStand / cStand}%.4f")
    assert(rTrained > 0.5, f"trained recall degenerate: $rTrained%.2f")
  }

  test("k=64 sampled convergence-trained cells beat k=16 at equal candidate budget") {
    // production shape: 64 cells, 50% md5-hash sample, iterate to
    // convergence — vs the oracle-pinned fixed shape (16 cells, full
    // corpus, 2 rounds). Evaluated on HELD-OUT probes (vec_id 200+):
    // the fixed trainer SEEDS on vec_id 0..15, so scoring it on probes
    // 0..39 hands it cells centered on the eval set — a measurement
    // artifact, not index quality. The finer sampled grid must
    // DOMINATE at matched candidate budgets: operating points
    // (nprobe 2 and 4 of 64 cells) deliver at least the recall of
    // k=16's (nprobe 1 and 2) while scanning strictly fewer actual
    // candidates.
    val (c64, iters) = SimilarityOps.trainCentroidsSampled(
      spark, Spec.sf0001, k = 64, sampleFraction = 0.5, maxIters = 12, eps = 1e-2)
    assert(iters >= 1 && c64.length == 64)
    info(s"sampled k=64 training converged in $iters iterations")
    val c16 = SimilarityOps.trainedCentroids(spark, Spec.sf0001, SimilarityOps.e51Iters)
    val held = 200L
    for ((np16, np64) <- Seq((1, 2), (2, 4))) {
      val (r16, n16) = recallAndCandidates(c16, nprobe = np16, probeLo = held)
      val (r64, n64) = recallAndCandidates(c64, nprobe = np64, probeLo = held)
      info(f"k=16 np$np16: recall@5 $r16%.2f @ $n16%.0f cands/probe; " +
        f"k=64 np$np64: $r64%.2f @ $n64%.0f")
      assert(r64 >= r16,
        f"finer sampled index lost recall: $r64%.2f < $r16%.2f")
      assert(n64 < n16,
        f"finer sampled index scanned more: $n64%.0f >= $n16%.0f")
    }
  }

  test("trained PQ codebooks shrink reconstruction error (Lloyd monotonicity)") {
    val sub = SimilarityOps.Dim / 4
    def mse(books: Array[Array[Array[Double]]]): Double = {
      val rows = Tables.embeddings(spark, Spec.sf0001)
        .select($"embedding").as[Array[Float]].collect()
      val errs = rows.map { v =>
        (0 until 4).map { j =>
          val slice = v.slice(j * sub, (j + 1) * sub).map(_.toDouble)
          books(j).map(c =>
            slice.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min
        }.sum
      }
      errs.sum / errs.length
    }
    val standIn = Array.tabulate(4)(j =>
      SimilarityOps.centroids(spark, Spec.sf0001).map(_.slice(j * sub, (j + 1) * sub)))
    val trained = SimilarityOps.trainedCodebooks(
      spark, Spec.sf0001, SimilarityOps.e51Iters)
    val (mStand, mTrained) = (mse(standIn), mse(trained))
    info(f"reconstruction MSE: stand-in $mStand%.4f, trained $mTrained%.4f")
    // each Lloyd step (assignment, then mean update) is non-increasing in
    // the per-subspace quantization objective, so this is a hard bound
    assert(mTrained <= mStand,
      f"training raised reconstruction error: $mTrained%.4f > $mStand%.4f")
    assert(mTrained < mStand * 0.95,
      "training changed nothing — Lloyd iterations had no effect on any subspace")
  }
}
