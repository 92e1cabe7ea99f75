package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables
import Similarity._

/** Similarity-search queries over the embeddings table.
  *
  * e40 is the brute-force baseline (scan → cosine → TakeOrdered top-k):
  * correct at any scale, one pass, no shuffle beyond the final top-k
  * merge. e41 is the k-NN-join shape (small probe set broadcast against
  * the corpus — the 100 TB plan is probes ⋈ bucketed corpus; the LSH
  * bucketing path is in graft.dedup). */
object SimilarityOps {

  // ---------------------------------------------------------------- e40
  /** Top-10 nearest neighbors (cosine) of probe vector vec_id=0. */
  private def e40(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .select($"vec_id", $"label".cast("bigint").as("label"),
        cosine("embedding", "p").as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }
  private val e40Sql =
    s"""WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, CAST(label AS BIGINT) AS label,
       | ${cosineSql("embedding", "p")} AS cos_sim
       |FROM embeddings, probe
       |WHERE vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- e41
  /** k-NN join: top-3 neighbors for each of the first 5 vectors. The
    * probe side is broadcast; ranking is a per-probe window (no global
    * sort). */
  private def e41(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("probe_id"), $"embedding".as("p"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos_sim".desc, $"vec_id")
    emb.crossJoin(broadcast(probes))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id", cosine("embedding", "p").as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter($"rank" <= 3)
      .orderBy($"probe_id", $"rank")
  }
  private val e41Sql =
    s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS p FROM embeddings WHERE vec_id < 5),
       |sims AS (
       |  SELECT probe_id, vec_id, ${cosineSql("embedding", "p")} AS cos_sim
       |  FROM embeddings, probes WHERE vec_id <> probe_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM sims)
       |SELECT probe_id, vec_id, cos_sim, rank FROM ranked
       |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin

  // ---------------------------------------------------------------- e42
  /** Corpus embedding statistics: norm distribution + per-label counts
    * (one aggregation pass; norms are bit-stable decimal sums). */
  private def e42(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.Num.{davg, dsum}
    Tables.embeddings(spark, dir)
      .select($"label", sqrt(norm2("embedding")).as("nrm"))
      .groupBy($"label".cast("bigint").as("label"))
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        dsum($"nrm").as("sum_norm"),
        davg($"nrm").as("avg_norm"),
        min($"nrm").as("min_norm"),
        max($"nrm").as("max_norm"))
      .orderBy($"label")
  }
  private val e42Sql =
    s"""WITH norms AS (
       |  SELECT label, SQRT(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)
       |SELECT CAST(label AS BIGINT) AS label,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | CAST(SUM(CAST(nrm AS DECIMAL(38,6))) AS DOUBLE) AS sum_norm,
       | CAST(SUM(CAST(nrm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(nrm) AS avg_norm,
       | MIN(nrm) AS min_norm,
       | MAX(nrm) AS max_norm
       |FROM norms GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- e44
  /** LSH bucket assignment (8 sign-projection bits → 256 buckets) plus
    * bucket occupancy. The bucket is the ANN partition key at scale. */
  private def e44(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.ops.Par.spread(Tables.embeddings(spark, dir))
      .select($"vec_id", Lsh.bucketCol($"embedding").as("bucket"))
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy($"bucket")).cast("bigint"))
      .orderBy($"vec_id")
  }
  private val e44Sql =
    s"""WITH b AS (SELECT vec_id, ${Lsh.bucketSql("embedding")} AS bucket FROM embeddings)
       |SELECT vec_id, bucket,
       | CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size
       |FROM b ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- e45
  /** Approximate top-5 neighbors of probe vec_id=0, searching ONLY the
    * probe's LSH bucket — the scale path: candidate generation is an
    * equi-join on the bucket key (~n/256 of the corpus per probe) instead
    * of e40's full scan. */
  private def e45(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 4 planes (16 buckets): right recall/selectivity for 500-5000 vecs
    val withBucket = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Lsh.bucketCol($"embedding", 4).as("bucket"))
    val probe = withBucket.filter($"vec_id" === 0)
      .select($"embedding".as("p"), $"bucket".as("pb"))
    withBucket.join(broadcast(probe), $"bucket" === $"pb" && $"vec_id" =!= 0)
      .select($"vec_id", cosine("embedding", "p").as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(5)
  }
  private val e45Sql =
    s"""WITH b AS (SELECT vec_id, embedding, ${Lsh.bucketSql("embedding", 4)} AS bucket FROM embeddings),
       |probe AS (SELECT embedding AS p, bucket AS pb FROM b WHERE vec_id = 0)
       |SELECT vec_id, ${cosineSql("embedding", "p")} AS cos_sim
       |FROM b, probe
       |WHERE bucket = pb AND vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  // ---------------------------------------------------------------- e46
  /** Int8 scalar quantization of embeddings: per-vector symmetric scale
    * (127 / max|x|), quantized codes + reconstruction MSE. Both engines
    * round half-away-from-zero and the fold arithmetic is order-defined,
    * so codes and error are bit-exact. The 4× (fp32→int8) shrink is the
    * standard first move for trillion-row ANN corpora. */
  private def e46(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxAbs = "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    def qAt(i: Int) =
      s"CAST(round(CAST(element_at(embedding, $i) AS DOUBLE) * 127.0D / $maxAbs) AS BIGINT)"
    val mse =
      s"""aggregate(
         | transform(embedding, x -> CAST(x AS DOUBLE)
         |   - CAST(round(CAST(x AS DOUBLE) * 127.0D / $maxAbs) AS DOUBLE) * ($maxAbs / 127.0D)),
         | CAST(0 AS DOUBLE), (acc, d) -> acc + d * d)""".stripMargin
    Tables.embeddings(spark, dir)
      .select(
        $"vec_id",
        expr(maxAbs).as("max_abs"),
        expr(qAt(1)).as("q1"), expr(qAt(2)).as("q2"),
        expr(qAt(3)).as("q3"), expr(qAt(4)).as("q4"),
        (expr(mse) / size($"embedding")).as("mse"))
      .orderBy($"vec_id")
  }
  private val e46Sql = {
    val maxAbs = "list_max(list_transform(embedding, x -> abs(x::DOUBLE)))"
    def qAt(i: Int) = s"CAST(round(embedding[$i]::DOUBLE * 127.0 / $maxAbs) AS BIGINT)"
    val mse =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | list_transform(embedding, x -> x::DOUBLE
         |   - CAST(round(x::DOUBLE * 127.0 / $maxAbs) AS DOUBLE) * ($maxAbs / 127.0))),
         | (acc, d) -> acc + d * d)""".stripMargin
    s"""SELECT vec_id,
       | $maxAbs AS max_abs,
       | ${qAt(1)} AS q1, ${qAt(2)} AS q2, ${qAt(3)} AS q3, ${qAt(4)} AS q4,
       | $mse / LEN(embedding) AS mse
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- e47
  /** IVF cell assignment (the coarse-quantizer half of IVF-flat): each
    * vector joins its nearest of 16 fixed centroids (here: the first 16
    * corpus vectors, standing in for k-means centroids — the assignment
    * machinery is identical and deterministic). At scale the cell id is
    * the partition key, exactly like the LSH bucket in e44. */
  /** The 16 fixed centroids as driver-side doubles (bounded: k vectors,
    * not data) — inlined into GraftNearestCells as a plan constant, the
    * same way a broadcast literal ships. Ordered by vec_id so the array
    * index IS the cent_id. */
  private[graft] def centroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).filter($"vec_id" < 16).orderBy($"vec_id")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
  }

  private def e47(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // cell assignment = per-row argmax over the inlined centroid array:
    // a single codegen'd projection — compare the previous formulation,
    // crossJoin(broadcast(cents)) + row_number() window, which amplified
    // the corpus ×16 and slammed a full-table shuffle keyed by vec_id
    // just to pick a max. The only shuffle left is the cell_size window,
    // keyed by cell — the IVF partition key, which is the point.
    val assigned = Tables.embeddings(spark, dir).select(
      $"vec_id",
      element_at(Similarity.nearestCells("embedding", centroids(spark, dir), 1), 1)
        .cast("bigint").as("cell"))
    assigned
      .withColumn("cell_size",
        count(lit(1)).over(Window.partitionBy($"cell")).cast("bigint"))
      .orderBy($"vec_id")
  }
  private val e47Sql =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e)
       |SELECT vec_id, cell,
       | CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
       |FROM assigned ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- e48
  /** IVF-flat ANN with MULTI-PROBE: the probe (vec_id=0) searches its
    * nprobe=2 nearest cells' inverted lists (candidates ≈ 2n/16 here;
    * real deployments use thousands of cells, same join shape — the cell
    * id is the shuffle key, candidates come from an equi-join, and the
    * corpus is never amplified: assignment is the same per-row projection
    * as e47, multi-probe is an explode of the probe's 2-element cell
    * array). */
  private def e48(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val assigned = emb.select(
      $"vec_id", $"embedding",
      element_at(Similarity.nearestCells("embedding", cents, 1), 1)
        .cast("bigint").as("cell"))
    val probeCells = emb.filter($"vec_id" === 0)
      .select(
        $"embedding".as("p"),
        explode(Similarity.nearestCells("embedding", cents, 2)).as("pc"))
      .select($"p", $"pc".cast("bigint").as("pcell"))
    assigned.join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= 0)
      .select($"vec_id", cosine("embedding", "p").as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(5)
  }
  private val e48Sql =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2)
       |SELECT vec_id, ${cosineSql("embedding", "p")} AS cos_sim
       |FROM assigned, probe
       |WHERE cell IN (SELECT cent_id FROM pcells) AND vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  // ---------------------------------------------------------------- e49
  /** ANN quality measurement: recall@5 of the LSH bucket search (e45's
    * shape) against the brute-force ground truth (e40's shape), per probe
    * — "measure, don't guess" for the approximate path. At scale this is
    * the nightly sampled-recall job every ANN deployment runs: ground
    * truth on a probe SAMPLE (here vec_id < 5), approximate search on the
    * full corpus, hit counting is one semi-joinable intersect. */
  private def e49(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val withBucket = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Lsh.bucketCol($"embedding", 4).as("bucket"))
    val probes = withBucket.filter($"vec_id" < 5)
      .select($"vec_id".as("probe_id"), $"embedding".as("p"), $"bucket".as("pb"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos_sim".desc, $"vec_id")
    def top5(cands: DataFrame): DataFrame = cands
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"probe_id", $"vec_id")
    val brute = top5(withBucket
      .crossJoin(broadcast(probes.select($"probe_id", $"p")))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id", cosine("embedding", "p").as("cos_sim")))
    val lsh = top5(withBucket
      .join(broadcast(probes), $"bucket" === $"pb" && $"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id", cosine("embedding", "p").as("cos_sim")))
    val hits = brute.intersect(lsh)
      .groupBy($"probe_id").agg(count(lit(1)).as("n_hits"))
    probes.select($"probe_id")
      .join(hits, Seq("probe_id"), "left")
      .select($"probe_id",
        coalesce($"n_hits", lit(0L)).cast("bigint").as("n_hits"),
        (coalesce($"n_hits", lit(0L)).cast("double") / 5.0).as("recall"))
      .orderBy($"probe_id")
  }
  private val e49Sql =
    s"""WITH b AS (SELECT vec_id, embedding, ${Lsh.bucketSql("embedding", 4)} AS bucket FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, embedding AS p, bucket AS pb FROM b WHERE vec_id < 5),
       |brute AS (SELECT probe_id, vec_id FROM (
       |  SELECT probe_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ${cosineSql("embedding", "p")} DESC, vec_id) AS rn
       |  FROM embeddings, probes WHERE vec_id <> probe_id) t WHERE rn <= 5),
       |lsh AS (SELECT probe_id, vec_id FROM (
       |  SELECT probe_id, b.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ${cosineSql("b.embedding", "p")} DESC, b.vec_id) AS rn
       |  FROM b, probes WHERE b.bucket = pb AND b.vec_id <> probe_id) t WHERE rn <= 5),
       |hits AS (
       |  SELECT probe_id, COUNT(*) AS n_hits
       |  FROM (SELECT probe_id, vec_id FROM brute INTERSECT SELECT probe_id, vec_id FROM lsh) h
       |  GROUP BY probe_id)
       |SELECT p.probe_id,
       | CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       | CAST(COALESCE(n_hits, 0) AS DOUBLE) / 5.0 AS recall
       |FROM probes p LEFT JOIN hits ON p.probe_id = hits.probe_id
       |ORDER BY p.probe_id""".stripMargin

  // ---------------------------------------------------------------- e50
  /** PRODUCT QUANTIZATION codes (the PQ half of IVF-PQ): the 64-d vector
    * splits into 4 subvectors of 16 dims; each subvector is assigned the
    * L2-nearest entry of its sub-codebook (here: the first 16 corpus
    * vectors' subvectors, standing in for k-means codewords — the
    * assignment machinery is identical and deterministic). 4 codes × 4
    * bits replace 256 float bytes — the 64× compression that makes
    * trillion-row ANN serving fit in memory. Assignment is the same
    * zero-amplification native projection as e47 (GraftNearestCells, L2
    * metric over slices) — no crossJoin, no window, no shuffle. */
  private def e50(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, dir)
    val sub = cents(0).length / 4
    val codes = (0 until 4).map { j =>
      val cj = cents.map(_.slice(j * sub, (j + 1) * sub))
      element_at(Similarity.nearestSubCells("embedding", cj, 1, j * sub), 1)
        .cast("bigint").as(s"code$j")
    }
    Tables.embeddings(spark, dir)
      .select(($"vec_id" +: codes): _*)
      .orderBy($"vec_id")
  }
  private val e50Sql = {
    def l2(j: Int): String = {
      val lo = j * 16 + 1
      val hi = (j + 1) * 16
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | list_transform(list_zip(e.embedding[$lo:$hi], cents.c[$lo:$hi]),
         |   s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE))),
         | (acc, v) -> acc + v)""".stripMargin
    }
    def code(j: Int): String =
      s"(SELECT cent_id FROM cents ORDER BY ${l2(j)} ASC, cent_id LIMIT 1) AS code$j"
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16)
       |SELECT e.vec_id, ${code(0)}, ${code(1)}, ${code(2)}, ${code(3)}
       |FROM embeddings e ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- e51
  /** K-MEANS-TRAINED IVF centroids (replacing e47/e48's first-16-vectors
    * stand-in): Lloyd's algorithm as DataFrame operations —
    *
    *   init    the first k corpus vectors (the deterministic seed)
    *   assign  nearest centroid by L2 (k-means' objective) — the native
    *           zero-amplification GraftNearestCells projection
    *   update  new centroid = per-(cell, dim) mean via posexplode +
    *           decimal-sum davg (order-independent, so the trained
    *           centroids are bit-identical at any partition count)
    *
    * Each iteration syncs k×d small values to the driver (the bounded
    * per-round action every distributed Lloyd implementation has — same
    * pattern as d40's convergence check); data-sized work stays
    * distributed: one projection + one keyed agg per round, no crossJoin,
    * no window. The oracle replays the SAME two iterations as a DuckDB
    * CTE chain — a hash match proves init, both assignment rounds, and
    * both mean updates are bit-exact across engines. SimilaritySpec
    * additionally measures recall@5 of the trained index vs the stand-in
    * (training must not hurt recall at equal nprobe). */
  private[graft] val e51Iters = 2

  /** Lloyd iterations over the subvector [off, off+len) — `off=0,
    * len=dim` trains the IVF coarse quantizer (e51), per-subspace slices
    * train the PQ sub-codebooks (e52). Init = the first k corpus
    * vectors' slices (the deterministic seed shared with the e47/e50
    * stand-ins, which ARE iters=0 of this trainer). */
  private[graft] def trainedSubCentroids(spark: SparkSession, dir: String,
      iters: Int, off: Int, len: Int): Array[Array[Double]] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    trainedSubCentroidsOn(emb, centroids(spark, dir), iters, off, len)
  }

  /** [[trainedSubCentroids]] over a caller-supplied embeddings frame —
    * lets e51's registered query feed a localCheckpointed corpus so
    * both Lloyd iterations AND the final assignment share one parquet
    * decode instead of three (bit-identical training: only the input
    * materialization changes, never the values). */
  private[graft] def trainedSubCentroidsOn(emb: DataFrame,
      seed: Array[Array[Double]], iters: Int, off: Int,
      len: Int): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var cents = seed.map(_.slice(off, off + len))
    for (_ <- 1 to iters) {
      val means = emb.select(
          element_at(Similarity.nearestSubCells("embedding", cents, 1, off), 1)
            .as("cell"),
          // posexplode of the slice: relative dim 0..len-1
          posexplode(slice($"embedding", off + 1, len)).as(Seq("dim", "x")))
        .groupBy($"cell", $"dim")
        .agg(graft.ops.Num.davg($"x".cast("double")).as("m"))
        .collect() // k×len rows — the bounded per-iteration sync point
      val byCell = means.groupBy(_.getAs[Int]("cell")).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m"))
      }
      // a cell that captured no vectors keeps its previous centroid
      cents = Array.tabulate(cents.length)(i => byCell.getOrElse(i, cents(i)))
    }
    cents
  }

  private[graft] def trainedCentroids(spark: SparkSession, dir: String,
      iters: Int): Array[Array[Double]] =
    trainedSubCentroids(spark, dir, iters, 0, Dim)

  /** PRODUCTION-SHAPE IVF training — the 100 TB path the fixed-shape
    * trainer above deliberately is not (e51/e53's DuckDB oracles replay
    * exactly k=16 × iters=2, so that trainer stays pinned):
    *
    *   - `k` is a parameter (size it ~√N; at 10⁹ vectors that is ~32k
    *     cells, not 16)
    *   - training runs over a DETERMINISTIC md5-hash sample of the
    *     corpus (first 4 md5 nibbles as a 16-bit uniform — the same
    *     keep-rule family as a53's resampler). A coarse quantizer
    *     converges on ~10⁵ vectors; only ASSIGNMENT ever needs the full
    *     corpus, so the per-iteration scan cost is decoupled from
    *     corpus size
    *   - iteration stops on CONVERGENCE (max centroid L2 movement < eps)
    *     rather than a caller-guessed round count
    *
    * Per-iteration driver sync stays k×d doubles (the centroid means) —
    * bounded by the index size, never the data.
    *
    * @return (centroids, iterations actually run) */
  private[graft] def trainCentroidsSampled(
      spark: SparkSession, dir: String, k: Int,
      sampleFraction: Double = 1.0, maxIters: Int = 20,
      eps: Double = 1e-3): (Array[Array[Double]], Int) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val sample = (if (sampleFraction >= 1.0) emb
      else emb.filter(
        conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
          .cast("long") < math.round(sampleFraction * 65536)))
      .localCheckpoint(eager = false) // rescanned every iteration
    // deterministic seed: the k lowest-id sampled vectors
    var cents: Array[Array[Double]] = sample.orderBy($"vec_id").limit(k)
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    require(cents.length == k,
      s"sample holds fewer than $k vectors — raise sampleFraction")
    var iters = 0
    var moved = Double.MaxValue
    while (iters < maxIters && moved > eps) {
      val means = sample.select(
          element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1)
            .as("cell"),
          posexplode($"embedding").as(Seq("dim", "x")))
        .groupBy($"cell", $"dim")
        .agg(graft.ops.Num.davg($"x".cast("double")).as("m"))
        .collect() // k×d — bounded by the index, not the data
      val byCell = means.groupBy(_.getAs[Int]("cell")).map { case (c, rows) =>
        c -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m"))
      }
      val next = Array.tabulate(k)(i => byCell.getOrElse(i, cents(i)))
      moved = (0 until k).map { i =>
        math.sqrt(cents(i).zip(next(i))
          .map { case (a, b) => (a - b) * (a - b) }.sum)
      }.max
      cents = next
      iters += 1
    }
    (cents, iters)
  }

  private[graft] val Dim = 64

  private def e51(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cents = trainedCentroids(spark, dir, e51Iters)
    Tables.embeddings(spark, dir).select(
        $"vec_id",
        element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1)
          .cast("bigint").as("cell"))
      .withColumn("cell_size",
        count(lit(1)).over(Window.partitionBy($"cell")).cast("bigint"))
      .orderBy($"vec_id")
  }
  private def l2Sql(v: String, c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       | list_transform(list_zip($v, $c),
       |   s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE))),
       | (acc, u) -> acc + u)""".stripMargin

  /** One Lloyd iteration as three CTEs over `corpus`: assign aI against
    * c(I-1), per-(cell,dim) decimal-sum means mI, rebuilt centroid
    * table cI (LEFT JOIN + COALESCE keeps an empty cell's previous
    * centroid). Shared by the fixed-shape (e51/e53) and sampled (e56)
    * trainer oracles. */
  private def lloydIterSql(i: Int, corpus: String): String =
    s"""a$i AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM c${i - 1}
       |    ORDER BY ${l2Sql("e.embedding", s"c${i - 1}.c")} ASC, cent_id LIMIT 1) AS cell
       |  FROM $corpus e),
       |m$i AS (
       |  SELECT cell, d.dim,
       |    CAST(SUM(CAST(e.embedding[d.dim]::DOUBLE AS DECIMAL(38,6))) AS DOUBLE)
       |      / COUNT(e.embedding[d.dim]) AS m
       |  FROM a$i e, generate_series(1, 64) AS d(dim)
       |  GROUP BY cell, d.dim),
       |c$i AS (
       |  SELECT p.cent_id, COALESCE(n.c, p.c) AS c
       |  FROM c${i - 1} p LEFT JOIN (
       |    SELECT cell AS cent_id, list(m ORDER BY dim) AS c
       |    FROM m$i GROUP BY cell) n USING (cent_id))""".stripMargin

  /** The Lloyd-replay CTE chain shared by e51's and e53's oracles:
    * defines c0 (seed) through c{e51Iters} (trained centroids). */
  private def lloydChainSql: String =
    s"""c0 AS (
       |  SELECT vec_id AS cent_id, list_transform(embedding, x -> x::DOUBLE) AS c
       |  FROM embeddings WHERE vec_id < 16),
       |${(1 to e51Iters).map(lloydIterSql(_, "embeddings")).mkString(",\n")}""".stripMargin

  private val e51Sql: String =
    s"""WITH $lloydChainSql,
       |af AS (
       |  SELECT e.vec_id, (
       |    SELECT cent_id FROM c$e51Iters
       |    ORDER BY ${l2Sql("e.embedding", s"c$e51Iters.c")} ASC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       | CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
       |FROM af ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- e53
  /** ANN SEARCH over the TRAINED index (e48's multi-probe join shape ×
    * e51's centroids): probe vec_id=0 searches its nprobe=2 nearest
    * TRAINED cells' inverted lists; assignment and probe selection both
    * use the L2 coarse quantizer the training optimized. The oracle
    * replays the full pipeline — two Lloyd iterations AND the search —
    * so training and serving are hash-gated TOGETHER (an assignment
    * drift invisible to e51's cell counts would surface here as a
    * different candidate set). */
  private def e53(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = trainedCentroids(spark, dir, e51Iters)
    val emb = Tables.embeddings(spark, dir)
    val assigned = emb.select(
      $"vec_id", $"embedding",
      element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1)
        .cast("bigint").as("cell"))
    val probeCells = emb.filter($"vec_id" === 0)
      .select(
        $"embedding".as("p"),
        explode(Similarity.nearestSubCells("embedding", cents, 2, 0)).as("pc"))
      .select($"p", $"pc".cast("bigint").as("pcell"))
    assigned.join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= 0)
      .select($"vec_id", cosine("embedding", "p").as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(5)
  }
  private val e53Sql =
    s"""WITH $lloydChainSql,
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM c$e51Iters
       |    ORDER BY ${l2Sql("e.embedding", s"c$e51Iters.c")} ASC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM c$e51Iters, probe
       |  ORDER BY ${l2Sql("probe.p", s"c$e51Iters.c")} ASC, cent_id LIMIT 2)
       |SELECT vec_id, ${cosineSql("embedding", "p")} AS cos_sim
       |FROM assigned, probe
       |WHERE cell IN (SELECT cent_id FROM pcells) AND vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  // ---------------------------------------------------------------- e52
  /** K-MEANS-TRAINED PQ sub-codebooks (replacing e50's first-16-vectors
    * stand-in): per-subspace Lloyd, all four subspaces trained in ONE
    * pass per iteration — the assignment projection computes every
    * subspace's cell, one posexplode derives (subspace, relative-dim)
    * from the absolute dim, and a single keyed agg updates all four
    * codebooks' means together (4 sub-codebooks × 16 codes × 16 dims =
    * 1024 small values per sync). Lloyd is monotone in the quantization
    * objective, so trained codebooks can only shrink reconstruction
    * error vs the iters=0 stand-in — TrainedIndexSpec measures exactly
    * that. At 100 TB, PQ training standardly runs on a corpus SAMPLE
    * (the codebook converges on ~10⁵ vectors); the full-corpus pass here
    * is the same plan with the sample filter dropped. */
  private[graft] def trainedCodebooks(spark: SparkSession, dir: String,
      iters: Int): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val sub = Dim / 4
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(4)(j => centroids(spark, dir).map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 1 to iters) {
      val cellCols = (0 until 4).map { j =>
        element_at(Similarity.nearestSubCells("embedding", books(j), 1, j * sub), 1)
          .as(s"cell$j")
      }
      val means = emb
        .select(cellCols :+ posexplode($"embedding").as(Seq("dim", "x")): _*)
        .select(
          ($"dim" / sub).cast("int").as("j"),
          ($"dim" % sub).as("rdim"),
          element_at(
            array($"cell0", $"cell1", $"cell2", $"cell3"),
            ($"dim" / sub).cast("int") + 1).as("cell"),
          $"x")
        .groupBy($"j", $"cell", $"rdim")
        .agg(graft.ops.Num.davg($"x".cast("double")).as("m"))
        .collect() // 4×16×16 values — the bounded per-iteration sync
      val byBook = means.groupBy(r => (r.getAs[Int]("j"), r.getAs[Int]("cell")))
        .map { case (k, rows) =>
          k -> rows.sortBy(_.getAs[Int]("rdim")).map(_.getAs[Double]("m"))
        }
      books = Array.tabulate(4)(j => Array.tabulate(books(j).length)(c =>
        byBook.getOrElse((j, c), books(j)(c))))
    }
    books
  }

  private def e52(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val books = trainedCodebooks(spark, dir, e51Iters)
    val sub = Dim / 4
    val codes = (0 until 4).map { j =>
      element_at(Similarity.nearestSubCells("embedding", books(j), 1, j * sub), 1)
        .cast("bigint").as(s"code$j")
    }
    Tables.embeddings(spark, dir)
      .select(($"vec_id" +: codes): _*)
      .orderBy($"vec_id")
  }
  private val e52Sql: String = {
    val sub = 16
    def l2(j: Int, c: String): String = {
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | list_transform(list_zip(e.embedding[$lo:$hi], $c.c),
         |   s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE))),
         | (acc, u) -> acc + u)""".stripMargin
    }
    // per-subspace CTE chain, the same Lloyd replay as e51's oracle but
    // over the slice [j*16+1, (j+1)*16]
    def chain(j: Int): String = {
      val c0 =
        s"""s${j}c0 AS (
           |  SELECT vec_id AS cent_id,
           |    list_transform(embedding[${j * sub + 1}:${(j + 1) * sub}], x -> x::DOUBLE) AS c
           |  FROM embeddings WHERE vec_id < 16)""".stripMargin
      val its = (1 to e51Iters).map { i =>
        s"""s${j}a$i AS (
           |  SELECT e.vec_id, e.embedding, (
           |    SELECT cent_id FROM s${j}c${i - 1}
           |    ORDER BY ${l2(j, s"s${j}c${i - 1}")} ASC, cent_id LIMIT 1) AS cell
           |  FROM embeddings e),
           |s${j}m$i AS (
           |  SELECT cell, d.dim,
           |    CAST(SUM(CAST(e.embedding[${j * sub} + d.dim]::DOUBLE AS DECIMAL(38,6))) AS DOUBLE)
           |      / COUNT(e.embedding[${j * sub} + d.dim]) AS m
           |  FROM s${j}a$i e, generate_series(1, $sub) AS d(dim)
           |  GROUP BY cell, d.dim),
           |s${j}c$i AS (
           |  SELECT p.cent_id, COALESCE(n.c, p.c) AS c
           |  FROM s${j}c${i - 1} p LEFT JOIN (
           |    SELECT cell AS cent_id, list(m ORDER BY dim) AS c
           |    FROM s${j}m$i GROUP BY cell) n USING (cent_id))""".stripMargin
      }
      (c0 +: its).mkString(",\n")
    }
    def code(j: Int): String =
      s"""(SELECT cent_id FROM s${j}c$e51Iters
         | ORDER BY ${l2(j, s"s${j}c$e51Iters")} ASC, cent_id LIMIT 1) AS code$j""".stripMargin
    s"""WITH ${(0 until 4).map(chain).mkString(",\n")}
       |SELECT e.vec_id, ${code(0)}, ${code(1)}, ${code(2)}, ${code(3)}
       |FROM embeddings e ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- e54
  /** PQ ADC SEARCH — the asymmetric-distance serving path that makes PQ
    * codes queryable: at query time each probe builds a tiny lookup
    * table (4 subspaces × 16 codewords = 64 doubles — the probe-to-
    * codeword L2 distances), and a corpus row's approximate distance is
    * FOUR table lookups summed, never touching the original floats.
    * This is how a trillion-row index serves from the 64×-compressed
    * codes alone (Jégou et al.'s ADC). Spark shape: the LUT inlines
    * into the plan as an array literal per probe (what a broadcast
    * ships at scale), code assignment is the zero-amplification native
    * projection (e50), the scan stays one codegen'd pass, and the only
    * shuffle is the per-probe top-k window — keyed by probe, the
    * natural serving partition. The oracle recomputes codes, LUTs, and
    * the ranked ADC distances in DuckDB; a hash match proves the whole
    * compressed-domain pipeline (assignment, fold order of every L2
    * accumulation, tie-breaks) is bit-exact. */
  private def e54(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cents = centroids(spark, dir)
    val sub = Dim / 4
    def sliceOf(v: Array[Double], j: Int): Array[Double] =
      v.slice(j * sub, (j + 1) * sub)
    // left-to-right fold over ascending dims — the same accumulation
    // order as the oracle's list_reduce, so the doubles match bit-exact
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < a.length) { val t = a(d) - b(d); acc += t * t; d += 1 }
      acc
    }
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter($"vec_id" < 5).orderBy($"vec_id")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val perProbe = probes.map { case (pid, p) =>
      val adc = (0 until 4).map { j =>
        val lutJ = cents.map(c => l2(sliceOf(p, j), sliceOf(c, j)))
        val codeJ = element_at(
          Similarity.nearestSubCells("embedding",
            cents.map(sliceOf(_, j)), 1, j * sub), 1)
        element_at(lit(lutJ), codeJ + lit(1))
      }.reduce(_ + _)
      emb.filter($"vec_id" =!= pid)
        .select(lit(pid).as("probe_id"), $"vec_id", adc.as("adc_dist"))
    }.reduce(_ unionAll _)
    val w = Window.partitionBy($"probe_id").orderBy($"adc_dist".asc, $"vec_id")
    perProbe
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter($"rank" <= 5)
      .orderBy($"probe_id", $"rank")
  }
  private val e54Sql = {
    def l2s(aExpr: String, bExpr: String, j: Int): String = {
      val lo = j * 16 + 1
      val hi = (j + 1) * 16
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | list_transform(list_zip($aExpr[$lo:$hi], $bExpr[$lo:$hi]),
         |   s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE))),
         | (acc, v) -> acc + v)""".stripMargin
    }
    def code(j: Int): String =
      s"""(SELECT cent_id FROM cents
         | ORDER BY ${l2s("e.embedding", "cents.c", j)} ASC, cent_id LIMIT 1) AS code$j""".stripMargin
    def lut(j: Int): String =
      s"(SELECT ${l2s("p.p", "cents.c", j)} FROM cents WHERE cent_id = c.code$j)"
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |codes AS (SELECT e.vec_id, ${code(0)}, ${code(1)}, ${code(2)}, ${code(3)}
       |  FROM embeddings e),
       |probes AS (SELECT vec_id AS probe_id, embedding AS p FROM embeddings WHERE vec_id < 5),
       |adc AS (SELECT p.probe_id, c.vec_id,
       |  ${lut(0)} + ${lut(1)} + ${lut(2)} + ${lut(3)} AS adc_dist
       |  FROM codes c, probes p WHERE c.vec_id <> p.probe_id),
       |ranked AS (SELECT probe_id, vec_id, adc_dist,
       |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adc_dist ASC, vec_id) AS rank
       |  FROM adc)
       |SELECT probe_id, vec_id, adc_dist, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- e55
  /** IVF-PQ SEARCH — the trillion-row serving architecture end-to-end:
    * the coarse quantizer prunes the corpus to the probe's nprobe=2
    * nearest cells' inverted lists (e48's join shape — cell id is the
    * shuffle key, no corpus amplification), and ranking inside the
    * candidate set runs in the COMPRESSED domain via the per-probe ADC
    * lookup tables (e54 — four table lookups per candidate, the
    * original floats never read). At 100 TB this is exactly how the
    * serving path scales: cells bound the candidates, PQ bounds the
    * bytes per candidate, and both prunings compose. One oracle
    * replays cell assignment, probing, PQ codes, LUTs, and the final
    * ranking — bit-exact or the hash breaks. */
  private def e55(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, dir)
    val sub = Dim / 4
    def sliceOf(v: Array[Double], j: Int): Array[Double] =
      v.slice(j * sub, (j + 1) * sub)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < a.length) { val t = a(d) - b(d); acc += t * t; d += 1 }
      acc
    }
    val emb = Tables.embeddings(spark, dir)
    val p = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head().map(_.toDouble)
    // ADC distance from literal LUTs over inline PQ code assignment —
    // a single codegen'd projection per candidate
    val adc = (0 until 4).map { j =>
      val lutJ = cents.map(c => l2(sliceOf(p, j), sliceOf(c, j)))
      val codeJ = element_at(
        Similarity.nearestSubCells("embedding",
          cents.map(sliceOf(_, j)), 1, j * sub), 1)
      element_at(lit(lutJ), codeJ + lit(1))
    }.reduce(_ + _)
    val assigned = emb.select(
      $"vec_id", $"embedding",
      element_at(Similarity.nearestCells("embedding", cents, 1), 1)
        .cast("bigint").as("cell"))
    val probeCells = emb.filter($"vec_id" === 0)
      .select(explode(Similarity.nearestCells("embedding", cents, 2)).as("pc"))
      .select($"pc".cast("bigint").as("pcell"))
    assigned.join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= 0)
      .select($"vec_id", $"cell", adc.as("adc_dist"))
      .orderBy($"adc_dist".asc, $"vec_id")
      .limit(5)
  }
  private val e55Sql = {
    def l2s(aExpr: String, bExpr: String, j: Int): String = {
      val lo = j * 16 + 1
      val hi = (j + 1) * 16
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | list_transform(list_zip($aExpr[$lo:$hi], $bExpr[$lo:$hi]),
         |   s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE))),
         | (acc, v) -> acc + v)""".stripMargin
    }
    def code(j: Int): String =
      s"""(SELECT cent_id FROM cents
         | ORDER BY ${l2s("e.embedding", "cents.c", j)} ASC, cent_id LIMIT 1) AS code$j""".stripMargin
    def lut(j: Int): String =
      s"(SELECT ${l2s("probe.p", "cents.c", j)} FROM cents WHERE cent_id = k.code$j)"
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |codes AS (SELECT e.vec_id, ${code(0)}, ${code(1)}, ${code(2)}, ${code(3)}
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2)
       |SELECT a.vec_id, a.cell,
       | ${lut(0)} + ${lut(1)} + ${lut(2)} + ${lut(3)} AS adc_dist
       |FROM assigned a JOIN codes k ON a.vec_id = k.vec_id, probe
       |WHERE a.cell IN (SELECT cent_id FROM pcells) AND a.vec_id <> 0
       |ORDER BY adc_dist ASC, a.vec_id LIMIT 5""".stripMargin
  }

  // ---------------------------------------------------------------- e56
  /** THE SCALE-CORRECT IVF TRAINER under the oracle — e51's pinned
    * k=16/iters=2 stand-in exists for bit-exact replay; THIS is the
    * production shape (`trainCentroidsSampled`): arbitrary k (32 here),
    * training over a deterministic md5-hash SAMPLE of the corpus
    * (25% — a coarse quantizer converges on a sample; only assignment
    * ever scans the full corpus), convergence-based stopping. The
    * oracle replays the sampled training bit-exact: the md5 keep-rule
    * (first 4 hex nibbles < '4000' ≡ the 16-bit uniform < 0.25·65536),
    * the k-lowest-id seed, two decimal-mean Lloyd iterations over the
    * sample, then full-corpus assignment. eps=0 pins the iteration
    * count for the replay (REQUIREd); the convergence path itself is
    * spec-gated (TrainedIndexSpec). */
  private def e56(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (cents, iters) = trainCentroidsSampled(spark, dir, k = 32,
      sampleFraction = 0.25, maxIters = 2, eps = 0.0)
    require(iters == 2, s"eps=0 must run exactly maxIters; ran $iters")
    Tables.embeddings(spark, dir).select(
        $"vec_id",
        element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1)
          .cast("bigint").as("cell"))
      .withColumn("cell_size",
        count(lit(1)).over(Window.partitionBy($"cell")).cast("bigint"))
      .orderBy($"vec_id")
  }
  private val e56Sql: String =
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '4000'),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cent_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS c
       |  FROM sample ORDER BY vec_id LIMIT 32),
       |${(1 to 2).map(lloydIterSql(_, "sample")).mkString(",\n")},
       |af AS (
       |  SELECT e.vec_id, (
       |    SELECT cent_id FROM c2
       |    ORDER BY ${l2Sql("e.embedding", "c2.c")} ASC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       | CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
       |FROM af ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- e57
  /** FILTERED ANN — metadata-filtered vector search, the production
    * retrieval shape ("nearest neighbors WITHIN lang='en' / this
    * tenant / this date range"): the metadata predicate applies BEFORE
    * any distance math, so the candidate set shrinks at the SCAN
    * (predicate pushdown prunes files; here the filter is the probe's
    * own label, expressed as an equi-join key so Catalyst broadcasts
    * the tiny probe side and the filter rides the join). Per-probe
    * ranking is a window over probe_id — parallelism scales with the
    * probe count, never the corpus. */
  private def e57(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("probe_id"), $"embedding".as("p"),
        $"label".as("plabel"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos_sim".desc, $"vec_id")
    emb.join(broadcast(probes),
        $"label" === $"plabel" && $"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id",
        Similarity.cosine("embedding", "p").as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter($"rank" <= 3)
      .orderBy($"probe_id", $"rank")
  }
  private val e57Sql =
    s"""WITH probes AS (
       |  SELECT vec_id AS probe_id, embedding AS p, label AS plabel
       |  FROM embeddings WHERE vec_id < 5),
       |sims AS (
       |  SELECT probe_id, e.vec_id AS vec_id,
       |    ${Similarity.cosineSql("e.embedding", "p")} AS cos_sim
       |  FROM embeddings e JOIN probes
       |    ON e.label = plabel AND e.vec_id <> probe_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM sims)
       |SELECT probe_id, vec_id, cos_sim, rank FROM ranked
       |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin

  // ---------------------------------------------------------------- e58
  /** ADC SHORTLIST + EXACT RE-RANK — FAISS's refine stage, the missing
    * last step of the e55 serving pipeline: the compressed domain
    * (coarse cells → PQ ADC) is lossy, so production search takes a
    * WIDER shortlist by ADC (k0 = 20 here) and re-ranks just those
    * candidates with EXACT distances over the full-precision vectors,
    * returning the top k = 5. At 100 TB the refine step is what makes
    * PQ compression free in recall terms: the corpus is scanned in the
    * compressed domain only, and full-precision vectors are fetched
    * for k0 rows per probe — a bounded point-lookup, not a scan.
    *
    * Exact distance = ‖a‖² + ‖b‖² − 2·a·b, each term the native
    * one-pass GraftDot fold — bit-identical to the oracle's identical
    * formula over identical folds. */
  private def e58(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, dir)
    val sub = Dim / 4
    def sliceOf(v: Array[Double], j: Int): Array[Double] =
      v.slice(j * sub, (j + 1) * sub)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < a.length) { val t = a(d) - b(d); acc += t * t; d += 1 }
      acc
    }
    val emb = Tables.embeddings(spark, dir)
    val p = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head().map(_.toDouble)
    val adc = (0 until 4).map { j =>
      val lutJ = cents.map(c => l2(sliceOf(p, j), sliceOf(c, j)))
      val codeJ = element_at(
        Similarity.nearestSubCells("embedding",
          cents.map(sliceOf(_, j)), 1, j * sub), 1)
      element_at(lit(lutJ), codeJ + lit(1))
    }.reduce(_ + _)
    val assigned = emb.select(
      $"vec_id", $"embedding",
      element_at(Similarity.nearestCells("embedding", cents, 1), 1)
        .cast("bigint").as("cell"))
    val probeCells = emb.filter($"vec_id" === 0)
      .select(explode(Similarity.nearestCells("embedding", cents, 2)).as("pc"))
      .select($"pc".cast("bigint").as("pcell"))
    val shortlist = assigned
      .join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= 0)
      .select($"vec_id", $"embedding", adc.as("adc_dist"))
      .orderBy($"adc_dist".asc, $"vec_id")
      .limit(20)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    shortlist.crossJoin(broadcast(probe))
      .select($"vec_id", $"adc_dist",
        (Similarity.dot("embedding", "embedding") + Similarity.dot("p", "p")
          - lit(2.0) * Similarity.dot("embedding", "p")).as("l2_dist"))
      .orderBy($"l2_dist".asc, $"vec_id")
      .limit(5)
  }
  private val e58Sql = {
    def l2s(aExpr: String, bExpr: String, j: Int): String = {
      val lo = j * 16 + 1
      val hi = (j + 1) * 16
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | list_transform(list_zip($aExpr[$lo:$hi], $bExpr[$lo:$hi]),
         |   s -> (s[1]::DOUBLE - s[2]::DOUBLE) * (s[1]::DOUBLE - s[2]::DOUBLE))),
         | (acc, v) -> acc + v)""".stripMargin
    }
    def code(j: Int): String =
      s"""(SELECT cent_id FROM cents
         | ORDER BY ${l2s("e.embedding", "cents.c", j)} ASC, cent_id LIMIT 1) AS code$j""".stripMargin
    def lut(j: Int): String =
      s"(SELECT ${l2s("probe.p", "cents.c", j)} FROM cents WHERE cent_id = k.code$j)"
    val exact =
      s"""${Similarity.dotSql("s.embedding", "s.embedding")}
         | + ${Similarity.dotSql("probe.p", "probe.p")}
         | - 2.0 * ${Similarity.dotSql("s.embedding", "probe.p")}""".stripMargin
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |codes AS (SELECT e.vec_id, ${code(0)}, ${code(1)}, ${code(2)}, ${code(3)}
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2),
       |shortlist AS (
       |  SELECT a.vec_id,
       |    ${lut(0)} + ${lut(1)} + ${lut(2)} + ${lut(3)} AS adc_dist
       |  FROM assigned a JOIN codes k ON a.vec_id = k.vec_id, probe
       |  WHERE a.cell IN (SELECT cent_id FROM pcells) AND a.vec_id <> 0
       |  ORDER BY adc_dist ASC, a.vec_id LIMIT 20)
       |SELECT sl.vec_id, sl.adc_dist, ${exact} AS l2_dist
       |FROM shortlist sl JOIN embeddings s ON sl.vec_id = s.vec_id, probe
       |ORDER BY l2_dist ASC, sl.vec_id LIMIT 5""".stripMargin
  }

  // ---------------------------------------------------------------- e63
  /** ANN UNDER DELETIONS — e59's persisted IVF index composed with
    * merge-on-read deletion vectors: the unlearning / right-to-be-
    * forgotten removal path a production vector store needs. A vector
    * slice (every 7th id — the "erase these users" batch) deletes
    * POSITIONALLY: one kilobyte coordinate sidecar, zero data-file
    * rewrites (REQUIREd — at 100 TB an index rebuild per erasure
    * request is a non-starter). Serving then runs e48's probe plan
    * UNCHANGED against the same table: the subtraction happens INSIDE
    * the scan (the k158 columnar-vector machinery), so deleted vectors
    * cannot surface as neighbors and no query-side filter has to
    * remember what was erased. The oracle recomputes the index in
    * DuckDB minus the erased slice. */
  private def e63(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_e63_del").toFile.getAbsolutePath
    try {
      val index = s"$zone/ivf_txn"
      val cents = centroids(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max($"vec_id")).head().getLong(0) / 2L
      def assign(batch: DataFrame): DataFrame = batch.select(
        $"vec_id", $"embedding",
        element_at(Similarity.nearestCells("embedding", cents, 1), 1)
          .cast("bigint").as("cell"))
      assign(emb.filter($"vec_id" <= cut))
        .write.format("graft").option("statsCols", "vec_id,cell")
        .option("mergeOnRead", "true")
        .mode("overwrite").save(index)
      assign(emb.filter($"vec_id" > cut))
        .write.format("graft").mode("append").save(index)
      val before = TxnTable.snapshotFiles(spark, index,
        TxnTable.latestVersion(spark, index).get).toSet
      // the erasure batch: every 7th vector, removed positionally
      TxnTable.deleteWherePos(spark, index, s => s("vec_id") % 7 === 0)
      val after = TxnTable.morState(spark, index,
        TxnTable.latestVersion(spark, index).get)
      require(before.subsetOf(after.files.toSet),
        "erasure must be a deletion vector, never an index rewrite")
      require(after.dels.exists(_.keyCols == TxnTable.PosDelKeyCols),
        "the erasure must have landed as a positional vector")
      val assigned = spark.read.format("graft").load(index)
      val probeCells = emb.filter($"vec_id" === 0)
        .select($"embedding".as("p"),
          explode(Similarity.nearestCells("embedding", cents, 2)).as("pc"))
        .select($"p", $"pc".cast("bigint").as("pcell"))
      val result = assigned
        .join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= 0)
        .select($"vec_id", cosine("embedding", "p").as("cos_sim"))
        .orderBy($"cos_sim".desc, $"vec_id")
        .limit(5)
      val rows = result.collect()
      require(rows.forall(_.getLong(0) % 7L != 0L),
        "an erased vector surfaced as a neighbor")
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // def, not val: e63Sql is defined after `all` (initialization order)

  // ---------------------------------------------------------------- e62
  /** HYBRID RETRIEVAL via Reciprocal Rank Fusion — the standard RAG
    * recipe: run a lexical leg (query-term match counts over the
    * documents table, the cheap spelling of t55's BM25) and a vector
    * leg (e40's brute-force cosine top-k against probe vec_id=0) and
    * fuse by RRF: score(id) = Σ_legs 1/(60 + rank_leg). Fusion uses
    * only RANKS, never the legs' incomparable raw scores — which is
    * exactly why RRF is the default fusion everywhere.
    *
    * Scale shape: each leg ends in TakeOrderedAndProject top-20 (per-
    * partition partials, no global sort); the fusion joins two ≤20-row
    * frames. The document/embedding id spaces are joined 1:1 (the
    * synthetic corpus aligns doc_id and vec_id); a doc missing from a
    * leg contributes 0 from that leg (RRF over the union).
    *
    * Determinism: ranks are integers with doc-id tie-breaks; the fused
    * score adds exactly two doubles in a fixed leg order — bit-stable
    * with no decimal passes needed. */
  private def e62(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    val vec = emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .select($"vec_id".as("id"), cosine("embedding", "p").as("cs"))
      .orderBy($"cs".desc, $"id").limit(20)
      .withColumn("rv",
        row_number().over(Window.orderBy($"cs".desc, $"id")).cast("bigint"))
      .select($"id", $"rv")
    val terms = Seq("window", "merge", "stream").toDF("tok")
    val lex = Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      .join(broadcast(terms), "tok")
      .groupBy($"doc_id").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"doc_id").limit(20)
      .withColumn("rl",
        row_number().over(Window.orderBy($"cnt".desc, $"doc_id"))
          .cast("bigint"))
      .select($"doc_id".as("id"), $"rl")
    rrfFuse(lex, vec)
  }
  // ---------------------------------------------------------------- e64
  /** HYBRID RETRIEVAL FROM THE MAINTAINED INDEXES — e62's RRF fusion
    * re-spelled so BOTH legs serve from PERSISTED incremental indexes
    * after a batch arrival on each, instead of one-shot scans: the
    * composition receipt that the lexical (t56) and vector (e59)
    * maintenance paths actually serve together.
    *
    *   - lexical leg: the t56 postings table (term, doc_id, tf),
    *     bucket(16, term) + blooms, built in TWO ingests; the 3-term
    *     query probes it through [[graft.dedup.DedupOps
    *     .probePersisted]] (literal-key file pruning REQUIREd) and
    *     ranks by Σtf — exactly e62's occurrence count;
    *   - vector leg: the e59 IVF table (vec_id, embedding, cell),
    *     identity-partitioned BY CELL and built in two ingests; the
    *     probe's nprobe=2 shortlist probes ONLY those two cells'
    *     files (literal-key pruning REQUIREd) and ranks by cosine;
    *   - fusion: RRF score(id) = Σ_legs 1/(60 + rank) over the two
    *     ≤20-row leg frames, e62's exact arithmetic.
    *
    * The oracle recomputes the lexical leg over the corpus and the
    * vector leg through the IVF assignment + 2-cell shortlist (e63's
    * CTE shape) — so a leg silently degrading to brute force, a wrong
    * cell assignment, or a fusion-order change all hash-mismatch. */
  private def e64(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val zone = java.nio.file.Files
      .createTempDirectory("graft_e64_hyb").toFile.getAbsolutePath
    try {
      val postings = s"$zone/postings_txn"
      val ivf = s"$zone/ivf_txn"
      // ---- lexical index, two ingests (t56's build)
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val dcut = docs.agg(max($"doc_id")).head().getLong(0) / 2L
      def ingestLex(batch: DataFrame, first: Boolean): Unit = {
        val pw = batch
          .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
          .filter(length($"term") > 0)
          .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
          .write.format("graft")
          .option("statsCols", "term").option("bloomCols", "term")
          .option("optimizedWrite", "true")
        (if (first) pw.option("partitionBy", "bucket(16, term)")
            .mode("overwrite")
         else pw.mode("append")).save(postings)
      }
      ingestLex(docs.filter($"doc_id" <= dcut), first = true)
      ingestLex(docs.filter($"doc_id" > dcut), first = false)
      // ---- vector index, two ingests (e59's build, cell-partitioned)
      val cents = centroids(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val vcut = emb.agg(max($"vec_id")).head().getLong(0) / 2L
      def ingestVec(batch: DataFrame, first: Boolean): Unit = {
        val vw = batch.select($"vec_id", $"embedding",
            element_at(Similarity.nearestCells("embedding", cents, 1), 1)
              .cast("bigint").cast("string").as("cell"))
          .write.format("graft").option("statsCols", "vec_id")
        (if (first) vw.option("partitionBy", "cell").mode("overwrite")
         else vw.mode("append")).save(ivf)
      }
      ingestVec(emb.filter($"vec_id" <= vcut), first = true)
      ingestVec(emb.filter($"vec_id" > vcut), first = false)
      // ---- lexical probe: pruned term buckets, rank by Σtf
      val (lex, (ls, lt)) = graft.text.Text2Ops.lexCountRank(
        spark, postings, Seq("window", "merge", "stream"), cat = "ge64lex")
      require(ls < lt,
        s"the 3-term probe must prune the postings index: $ls/$lt")
      // ---- vector probe: nprobe=2 cell shortlist, pruned cell files
      val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
      val (vecRanked, (vs, vt)) =
        ivfProbe(spark, ivf, cents, probe, k = 20, cat = "ge64vec")
      require(vs < vt,
        s"the 2-cell probe must prune the IVF index: $vs/$vt")
      val vec = vecRanked.select($"vec_id".as("id"), $"rn".as("rv"))
      // ---- e62's RRF fusion, unchanged
      val fused = rrfFuse(lex, vec)
      spark.createDataFrame(
        java.util.Arrays.asList(fused.collect(): _*), fused.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // def, not val: cosineSql-based, defined after `all` (init order)
  private def e64Sql =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${Similarity.cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${Similarity.cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2),
       |vecl AS (
       |  SELECT a.vec_id AS id, ${Similarity.cosineSql("a.embedding", "probe.p")} AS cs
       |  FROM assigned a, probe
       |  WHERE a.cell IN (SELECT cent_id FROM pcells) AND a.vec_id <> 0
       |  ORDER BY cs DESC, id LIMIT 20),
       |vecr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cs DESC, id) AS BIGINT) AS rv FROM vecl),
       |toks AS (SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
       |lexl AS (
       |  SELECT doc_id AS id, COUNT(*) AS cnt FROM toks
       |  WHERE tok IN ('window', 'merge', 'stream') GROUP BY 1
       |  ORDER BY cnt DESC, id LIMIT 20),
       |lexr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, id) AS BIGINT) AS rl FROM lexl),
       |fused AS (
       |  SELECT COALESCE(l.id, v.id) AS id,
       |    COALESCE(1.0 / (60.0 + CAST(rl AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(rv AS DOUBLE)), 0.0) AS rrf
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.id = v.id)
       |SELECT id, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10""".stripMargin

  /** Serve the nprobe=2 shortlist from a PERSISTED cell-partitioned
    * IVF index: derive the probe's two nearest cells, probe the index
    * through [[graft.dedup.DedupOps.probePersisted]] (literal-key
    * file-pruning counts returned for the caller's REQUIREs), and
    * rank the candidates by cosine with vec-id tie-breaks — the
    * returned frame is LAZY (vec_id, cos_sim, rn). `probe` carries
    * one row with the query embedding as column `p`. `excludeId`
    * drops the query's own row from the shortlist when the probe
    * vector lives in the index (the e64/e65/s75/p92 convention: the
    * query is vec 0) — pass None for an external embedding. Shared
    * by e64/e65/s75/p92 — the vector twin of Text2Ops.bm25Probe. */
  private[graft] def ivfProbe(spark: SparkSession, ivf: String,
      cents: Array[Array[Double]], probe: DataFrame, k: Int,
      cat: String, excludeId: Option[Long] = Some(0L))
      : (DataFrame, (Int, Int)) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pcells = probe
      .select(explode(Similarity.nearestCells("p", cents, 2)).as("pc"))
      .select($"pc".cast("bigint").cast("string").as("cell"))
    val (hits, counts) = graft.dedup.DedupOps.probePersisted(
      spark, ivf, pcells.localCheckpoint(),
      joinCols = Seq("cell"), out = Seq("vec_id", "embedding"),
      keyCol = "cell", cat = cat,
      scanPayload = Seq("vec_id", "embedding"))
    val kept = excludeId.fold(hits)(x => hits.filter($"vec_id" =!= x))
    val ranked = kept
      .crossJoin(broadcast(probe))
      .select($"vec_id", cosine("embedding", "p").as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id").limit(k)
      .withColumn("rn", row_number()
        .over(Window.orderBy($"cos_sim".desc, $"vec_id")).cast("bigint"))
      .orderBy($"rn")
    (ranked, counts)
  }

  /** Reciprocal Rank Fusion of a lexical (id, rl) leg and a vector
    * (id, rv) leg: score(id) = Σ 1/(60 + rank) with a leg absent from
    * a doc contributing 0, top-10 with id tie-breaks. ONE definition
    * of the fusion arithmetic for e62/e64/p92 — rank-only, so the
    * legs' incomparable raw scores never mix. */
  private[graft] def rrfFuse(lex: DataFrame, vec: DataFrame): DataFrame = {
    val spark = lex.sparkSession
    import spark.implicits._
    lex.join(vec, Seq("id"), "full_outer")
      .select($"id",
        (coalesce(lit(1.0) / (lit(60.0) + $"rl".cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + $"rv".cast("double")),
            lit(0.0))).as("rrf"))
      .orderBy($"rrf".desc, $"id").limit(10)
  }

  // ---------------------------------------------------------------- e65
  /** IVF INDEX × WRITE-AUDIT-PUBLISH — t58's audit-gate story for the
    * VECTOR index, completing the lifecycle matrix (both maintained
    * indexes now have deletion legs, staging legs, and streaming
    * legs): a suspect embedding batch is ASSIGNED and STAGED on the
    * cell-partitioned IVF table via the stageId writer option, and the
    * same nprobe=2 pruned-probe serving plan runs in both phases —
    * 'staged' must equal ANN over the corpus WITHOUT the holdback (a
    * leaked vector would enter the shortlist and hash-mismatch),
    * 'published' must equal full-corpus ANN after ONE atomic
    * promotion. The production story: embed the crawl, audit the
    * index state it WOULD create, only then serve it — or abort
    * leaving the index byte-identical. */
  private def e65(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    import org.apache.spark.sql.expressions.Window
    val zone = java.nio.file.Files
      .createTempDirectory("graft_e65_wap").toFile.getAbsolutePath
    try {
      val ivf = s"$zone/ivf_txn"
      val cents = centroids(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val maxId = emb.agg(max($"vec_id")).head().getLong(0)
      val cut = maxId / 2L
      val hold = maxId - maxId / 10L // the suspect embedding batch
      def assign(batch: DataFrame): DataFrame = batch.select(
        $"vec_id", $"embedding",
        element_at(Similarity.nearestCells("embedding", cents, 1), 1)
          .cast("bigint").cast("string").as("cell"))
      assign(emb.filter($"vec_id" <= cut))
        .write.format("graft").option("statsCols", "vec_id")
        .option("partitionBy", "cell").mode("overwrite").save(ivf)
      assign(emb.filter($"vec_id" > cut && $"vec_id" <= hold))
        .write.format("graft").mode("append").save(ivf)
      assign(emb.filter($"vec_id" > hold))
        .write.format("graft").option("stageId", "vecs-b0")
        .mode("append").save(ivf)
      val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
      def serve(phase: String): Seq[org.apache.spark.sql.Row] = {
        val (ranked, (scanned, total)) =
          ivfProbe(spark, ivf, cents, probe, k = 5, cat = s"ge65$phase")
        require(scanned < total,
          s"the $phase 2-cell probe must prune the IVF index: " +
            s"$scanned/$total")
        ranked.collect().toSeq
      }
      val staged = serve("stg")
      require(staged.forall(_.getLong(0) <= hold),
        "a staged holdback vector surfaced in the served shortlist")
      val v0 = TxnTable.latestVersion(spark, ivf).get
      TxnTable.publishStage(spark, ivf, "vecs-b0")
      require(TxnTable.latestVersion(spark, ivf).contains(v0 + 1L),
        "the promotion must cost exactly one version")
      val published = serve("pub")
      val out = staged.map(r => ("staged", r.getLong(0), r.getDouble(1),
          r.getLong(2))) ++
        published.map(r => ("published", r.getLong(0), r.getDouble(1),
          r.getLong(2)))
      out.toDF("phase", "vec_id", "cos_sim", "rn")
        .orderBy($"phase", $"rn")
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // def, not val: cosineSql-based, defined after `all` (init order)
  private def e65Sql = {
    def phase(name: String, pred: String) =
      s"""SELECT '$name' AS phase, vec_id, cos_sim, rn FROM (
         |WITH corp AS (SELECT vec_id, embedding FROM embeddings WHERE $pred),
         |cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
         |assigned AS (
         |  SELECT e.vec_id, e.embedding, (
         |    SELECT cent_id FROM cents
         |    ORDER BY ${Similarity.cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
         |  FROM corp e),
         |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
         |pcells AS (
         |  SELECT cent_id FROM cents, probe
         |  ORDER BY ${Similarity.cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2),
         |topl AS (
         |  SELECT a.vec_id, ${Similarity.cosineSql("a.embedding", "probe.p")} AS cos_sim
         |  FROM assigned a, probe
         |  WHERE a.cell IN (SELECT cent_id FROM pcells) AND a.vec_id <> 0
         |  ORDER BY cos_sim DESC, a.vec_id LIMIT 5)
         |SELECT vec_id, cos_sim,
         |  CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
         |FROM topl)""".stripMargin
    s"""WITH mx AS (SELECT MAX(vec_id) AS m FROM embeddings),
       |ph AS (
       |${phase("staged", "vec_id <= (SELECT m - m // 10 FROM mx)")}
       |UNION ALL
       |${phase("published", "TRUE")})
       |SELECT phase, vec_id, cos_sim, rn FROM ph ORDER BY phase, rn""".stripMargin
  }

  private val e62Sql =
    s"""WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |vecl AS (
       |  SELECT vec_id AS id, ${cosineSql("embedding", "p")} AS cs
       |  FROM embeddings, probe WHERE vec_id <> 0
       |  ORDER BY cs DESC, id LIMIT 20),
       |vecr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cs DESC, id) AS BIGINT) AS rv FROM vecl),
       |toks AS (SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
       |lexl AS (
       |  SELECT doc_id AS id, COUNT(*) AS cnt FROM toks
       |  WHERE tok IN ('window', 'merge', 'stream') GROUP BY 1
       |  ORDER BY cnt DESC, id LIMIT 20),
       |lexr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, id) AS BIGINT) AS rl FROM lexl),
       |fused AS (
       |  SELECT COALESCE(l.id, v.id) AS id,
       |    COALESCE(1.0 / (60.0 + CAST(rl AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(rv AS DOUBLE)), 0.0) AS rrf
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.id = v.id)
       |SELECT id, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("e40_cosine_topk", e40, Some(e40Sql), bench = true),
    RQ("e41_knn_join", e41, Some(e41Sql)),
    RQ("e42_embedding_stats", e42, Some(e42Sql)),
    RQ("e44_lsh_buckets", e44, Some(e44Sql)),
    RQ("e45_lsh_ann_topk", e45, Some(e45Sql), bench = true),
    RQ("e46_int8_quantize", e46, Some(e46Sql)),
    RQ("e47_ivf_cells", e47, Some(e47Sql)),
    RQ("e48_ivf_ann_topk", e48, Some(e48Sql), bench = true),
    RQ("e49_ann_recall", e49, Some(e49Sql)),
    RQ("e50_pq_codes", e50, Some(e50Sql)),
    RQ("e51_ivf_trained", e51, Some(e51Sql), bench = true),
    RQ("e52_pq_trained", e52, Some(e52Sql)),
    RQ("e53_ivf_trained_search", e53, Some(e53Sql)),
    RQ("e54_pq_adc_search", e54, Some(e54Sql)),
    RQ("e55_ivfpq_search", e55, Some(e55Sql)),
    RQ("e56_ivf_sampled_trainer", e56, Some(e56Sql)),
    RQ("e57_filtered_ann", e57, Some(e57Sql)),
    RQ("e58_adc_rerank", e58, Some(e58Sql)),
    RQ("e59_incremental_ivf", e59, Some(e59Sql), bench = true),
    RQ("e60_ivf_retrain", e60, Some(e60Sql)),
    RQ("e61_drift_detector", e61, Some(e61Sql)),
    RQ("e62_hybrid_rrf", e62, Some(e62Sql)),
    RQ("e63_ann_under_deletes", e63, Some(e63Sql)),
    RQ("e64_hybrid_maintained", e64, Some(e64Sql)),
    RQ("e65_ivf_wap_staged", e65, Some(e65Sql)))

  // ---------------------------------------------------------------- e59
  /** INCREMENTAL IVF INGEST — index maintenance as a pipeline, the ANN
    * mirror of d47's incremental dedup: the inverted file PERSISTS as
    * a graft table (vec_id, cell, embedding), and each incoming batch
    * of vectors assigns against the FIXED coarse quantizer (the same
    * codegen'd NearestCells projection as e47) and APPENDS —
    * batch-sized work, no re-assignment of the existing corpus
    * (REQUIREd append-only). Queries serve from the persisted index:
    * probe → 2 nearest cells → candidates by cell equi-join, exactly
    * e48's serving plan but against the incrementally-built table.
    * Incremental == from-scratch EXACTLY because assignment is a pure
    * per-row function of the fixed centroids — the oracle (e48's SQL)
    * recomputes the whole index in DuckDB and must agree. */
  private def e59(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_e59_ivf").toFile.getAbsolutePath
    try {
      val index = s"$zone/ivf_txn"
      val cents = centroids(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val cut = emb.agg(max($"vec_id")).head().getLong(0) / 2L
      def assign(batch: DataFrame): DataFrame = batch.select(
        $"vec_id", $"embedding",
        element_at(Similarity.nearestCells("embedding", cents, 1), 1)
          .cast("bigint").as("cell"))
      assign(emb.filter($"vec_id" <= cut))
        .write.format("graft").option("statsCols", "vec_id,cell")
        .mode("overwrite").save(index)
      val before = TxnTable.snapshotFiles(spark, index,
        TxnTable.latestVersion(spark, index).get).toSet
      // day-2 increment: assign ONLY the new vectors, append
      assign(emb.filter($"vec_id" > cut))
        .write.format("graft").mode("append").save(index)
      val after = TxnTable.snapshotFiles(spark, index,
        TxnTable.latestVersion(spark, index).get).toSet
      require(before.subsetOf(after),
        "incremental ingest must append to the index, not rebuild it")
      val assigned = spark.read.format("graft").load(index)
      val probeCells = emb.filter($"vec_id" === 0)
        .select($"embedding".as("p"),
          explode(Similarity.nearestCells("embedding", cents, 2)).as("pc"))
        .select($"p", $"pc".cast("bigint").as("pcell"))
      val result = assigned
        .join(broadcast(probeCells), $"cell" === $"pcell" && $"vec_id" =!= 0)
        .select($"vec_id", cosine("embedding", "p").as("cos_sim"))
        .orderBy($"cos_sim".desc, $"vec_id")
        .limit(5)
      spark.createDataFrame(
        java.util.Arrays.asList(result.collect(): _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // ---------------------------------------------------------------- e60
  /** IVF INDEX MAINTENANCE — the OPTIMIZE-analogue e59 deliberately
    * lacks: e59 pins its coarse quantizer forever (documented,
    * REQUIREd append-only), so under distribution drift new vectors
    * pile into whichever stale cell is least-wrong — recall holds (the
    * probe lands in the same bloated cell) but SERVING degrades: the
    * drifted probes scan a drift-bloated inverted list. e60 runs the
    * maintenance pass:
    *
    *   1. build the index over a DRIFTED corpus (every 3rd vector
    *      re-appears scaled 0.0625 + offset 2.0 — a tight far-away
    *      cluster, the "new domain" shape; both constants are dyadic
    *      so the float arithmetic is bit-identical across engines)
    *      against the STALE seed quantizer
    *   2. measure the serving contract at nprobe=2 on drifted probes:
    *      recall@5 vs brute force, candidates scanned, max cell size
    *   3. RE-TRAIN on the current corpus (the same 2 Lloyd iterations
    *      e51 pins), re-assign everything, and swap the index table
    *      ATOMICALLY via CREATE OR REPLACE (k146's StagingTableCatalog
    *      path — lineage continues, pinned readers keep their snapshot,
    *      REQUIREd)
    *   4. gates: recall must not drop, scanned candidates and max cell
    *      MUST shrink — re-training has to beat the stale quantizer on
    *      the drifted batch, machine-checked, or the swap was pointless
    *
    * At 100 TB: training reads the corpus twice (sampled in production
    * — e56 proves that path), re-assignment is one scan + write, and
    * the swap is one manifest CAS — readers never see a half-built
    * index. The oracle replays drift + 2 Lloyd rounds + assignment
    * from scratch in DuckDB (e51's CTE chain over the drifted corpus),
    * so a wrong retrain, assignment, or swap all hash-mismatch. */
  private def e60(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    import org.apache.spark.sql.expressions.Window
    val zone = java.nio.file.Files
      .createTempDirectory("graft_e60_opt").toFile.getAbsolutePath
    try {
      spark.conf.set("spark.sql.catalog.ge60", "graft.io.GraftTableCatalog")
      spark.conf.set("spark.sql.catalog.ge60.warehouse", zone)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS ge60.db")
      val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
      val mx = emb.agg(max($"vec_id")).head().getLong(0) + 1L
      val corpus = emb.unionByName(
        emb.filter($"vec_id" % 3 === 0).select(
          ($"vec_id" + mx).as("vec_id"),
          transform($"embedding",
            x => x * lit(0.0625f) + lit(2.0f)).as("embedding")))
        .localCheckpoint() // feeds 2 assignments + 2 training scans + gates
      val seed = centroids(spark, dir)
      def assigned(cents: Array[Array[Double]]): DataFrame = corpus.select(
        $"vec_id", $"embedding",
        element_at(Similarity.nearestSubCells("embedding", cents, 1, 0), 1)
          .cast("bigint").as("cell"))
      try {
        assigned(seed).createOrReplaceTempView("ge60_stale")
        spark.sql("CREATE OR REPLACE TABLE ge60.db.ivf USING graft AS " +
          "SELECT * FROM ge60_stale")
        val table = s"$zone/db/ivf"
        val v1 = TxnTable.latestVersion(spark, table).get
        val probes = corpus.filter($"vec_id".isin(mx, mx + 3L, mx + 6L))
          .select($"vec_id".as("probe_id"), $"embedding".as("p"))
          .localCheckpoint()
        val w = Window.partitionBy($"probe_id")
          .orderBy($"cos_sim".desc, $"vec_id")
        def top5(c: DataFrame) = c.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 5).select($"probe_id", $"vec_id")
        // ground truth once, off the corpus (3-row broadcast)
        val brute = top5(corpus.crossJoin(broadcast(probes))
          .filter($"vec_id" =!= $"probe_id")
          .select($"probe_id", $"vec_id",
            cosine("embedding", "p").as("cos_sim"))).localCheckpoint()
        // serving metrics from the PERSISTED index at nprobe=2
        def metrics(cents: Array[Array[Double]]): (Long, Long, Long) = {
          val idx = spark.table("ge60.db.ivf")
          val probeCells = probes.select($"probe_id", $"p",
            explode(Similarity.nearestSubCells("p", cents, 2, 0)).as("pc"))
            .select($"probe_id", $"p", $"pc".cast("bigint").as("pcell"))
          val cand = idx.join(broadcast(probeCells),
            $"cell" === $"pcell" && $"vec_id" =!= $"probe_id")
          val nCand = cand.count()
          val hits = top5(cand.select($"probe_id", $"vec_id",
            cosine("embedding", "p").as("cos_sim"))).intersect(brute).count()
          val maxCell = idx.groupBy($"cell").agg(count(lit(1)).as("n"))
            .agg(max($"n")).head().getLong(0)
          (hits, nCand, maxCell)
        }
        val (hitsStale, candStale, maxStale) = metrics(seed)
        val cents2 = trainedSubCentroidsOn(corpus, seed, e51Iters, 0, Dim)
        assigned(cents2).createOrReplaceTempView("ge60_new")
        spark.sql("CREATE OR REPLACE TABLE ge60.db.ivf USING graft AS " +
          "SELECT * FROM ge60_new")
        require(TxnTable.latestVersion(spark, table).get > v1,
          "the swap must extend the manifest lineage, not restart it")
        require(spark.sql(
            s"SELECT count(*) FROM ge60.db.ivf VERSION AS OF $v1")
            .head().getLong(0) > 0L,
          "the pre-swap index must stay readable for pinned readers")
        val (hitsNew, candNew, maxNew) = metrics(cents2)
        require(hitsNew >= hitsStale,
          s"re-training must not lose recall: $hitsNew < $hitsStale")
        require(candNew < candStale,
          s"re-training must cut the drifted probes' scan cost: " +
            s"$candNew !< $candStale")
        require(maxNew < maxStale,
          s"re-training must re-balance the drift-bloated cell: " +
            s"$maxNew !< $maxStale")
        val result = spark.table("ge60.db.ivf")
          .select($"vec_id", $"cell")
          .withColumn("cell_size",
            count(lit(1)).over(Window.partitionBy($"cell")).cast("bigint"))
          .orderBy($"vec_id")
        spark.createDataFrame(
          java.util.Arrays.asList(result.collect(): _*), result.schema)
      } finally spark.sql("DROP TABLE IF EXISTS ge60.db.ivf")
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // ---------------------------------------------------------------- e61
  /** DRIFT DETECTOR — the "WHEN" for e60's maintenance pass, so index
    * re-training is a measurement-triggered policy instead of a cron
    * guess: a batch's mean L2 distance to its NEAREST cell of the
    * current quantizer is the canonical quantization-error signal —
    * a batch drawn from the served distribution scores like the corpus
    * baseline, a drifted batch's nearest-cell distance balloons. One
    * pure projection per row (min over k per-centroid HOF folds,
    * centroids as plan constants — interpreted lambdas, the
    * bit-stability spelling; swap in a native expression only if a
    * detector pass ever shows in a profile), one decimal-sum aggregate
    * per batch — scales with the batch, never the corpus. Flag fires
    * at 2× the corpus baseline; REQUIREd: the e60-shaped drifted batch
    * trips it, the same-distribution clean batch does not. The oracle
    * recomputes distances, means, and flags bit-exactly (same fold
    * order, same DECIMAL accumulation). */
  private def e61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, dir)
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val mx = emb.agg(max($"vec_id")).head().getLong(0) + 1L
    val batches = emb.select(lit("corpus").as("batch"), $"vec_id", $"embedding")
      .unionByName(emb.filter($"vec_id" % 3 === 1)
        .select(lit("clean").as("batch"), $"vec_id", $"embedding"))
      .unionByName(emb.filter($"vec_id" % 3 === 0)
        .select(lit("drift").as("batch"), ($"vec_id" + mx).as("vec_id"),
          transform($"embedding",
            x => x * lit(0.0625f) + lit(2.0f)).as("embedding")))
    // min over k per-centroid L2 folds — each fold left-to-right like
    // the oracle's list_reduce, centroid literals ride the plan
    def l2To(c: Array[Double]): org.apache.spark.sql.Column = expr(
      s"""aggregate(
         |  zip_with(embedding, array(${c.mkString(", ")}),
         |    (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
    val stats = batches
      .select($"batch", least(cents.map(l2To).toIndexedSeq: _*).as("dist"))
      .groupBy($"batch")
      .agg(count(lit(1)).cast("bigint").as("n"),
        graft.ops.Num.davg($"dist").as("mean_dist"))
    val base = stats.filter($"batch" === "corpus")
      .select($"mean_dist".as("_base"))
    val result = stats.crossJoin(broadcast(base))
      .select($"batch", $"n", $"mean_dist",
        ($"mean_dist" > lit(2.0) * $"_base").as("flagged"))
      .orderBy($"batch")
    val rows = result.collect()
    val byBatch = rows.map(r => r.getString(0) -> r.getBoolean(3)).toMap
    require(byBatch("drift") && !byBatch("clean") && !byBatch("corpus"),
      s"detector must fire on the drifted batch ONLY; got $byBatch")
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
  }
  // def, not val: defined after `all` in initialization order
  private def e61Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cent_id, list_transform(embedding, x -> x::DOUBLE) AS c
       |  FROM embeddings WHERE vec_id < 16),
       |batches AS (
       |  SELECT 'corpus' AS batch, vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT 'clean', vec_id, embedding FROM embeddings WHERE vec_id % 3 = 1
       |  UNION ALL
       |  SELECT 'drift', vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings),
       |    list_transform(embedding,
       |      x -> CAST(CAST(x AS DOUBLE) * 0.0625 + 2.0 AS FLOAT))
       |  FROM embeddings WHERE vec_id % 3 = 0),
       |d AS (
       |  SELECT batch, (
       |    SELECT MIN(${l2Sql("e.embedding", "c0.c")}) FROM c0) AS dist
       |  FROM batches e),
       |s AS (
       |  SELECT batch, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(dist AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
       |      AS mean_dist
       |  FROM d GROUP BY batch)
       |SELECT batch, n, mean_dist,
       |  mean_dist > 2 * (SELECT mean_dist FROM s WHERE batch = 'corpus')
       |    AS flagged
       |FROM s ORDER BY batch""".stripMargin

  // def, not val: defined after `all` in initialization order
  private def e60Sql =
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
       |    list_transform(embedding,
       |      x -> CAST(CAST(x AS DOUBLE) * 0.0625 + 2.0 AS FLOAT)) AS embedding
       |  FROM embeddings WHERE vec_id % 3 = 0),
       |c0 AS (
       |  SELECT vec_id AS cent_id, list_transform(embedding, x -> x::DOUBLE) AS c
       |  FROM corpus WHERE vec_id < 16),
       |${(1 to e51Iters).map(lloydIterSql(_, "corpus")).mkString(",\n")},
       |af AS (
       |  SELECT e.vec_id, (
       |    SELECT cent_id FROM c$e51Iters
       |    ORDER BY ${l2Sql("e.embedding", s"c$e51Iters.c")} ASC, cent_id LIMIT 1) AS cell
       |  FROM corpus e)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       | CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
       |FROM af ORDER BY vec_id""".stripMargin

  // def, not val: defined after `all` in initialization order
  private def e59Sql =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2)
       |SELECT vec_id, ${cosineSql("embedding", "p")} AS cos_sim
       |FROM assigned, probe
       |WHERE cell IN (SELECT cent_id FROM pcells) AND vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  // def, not val: defined after `all` in initialization order
  private def e63Sql =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cosineSql("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cosineSql("probe.p", "cents.c")} DESC, cent_id LIMIT 2)
       |SELECT vec_id, ${cosineSql("embedding", "p")} AS cos_sim
       |FROM assigned, probe
       |WHERE cell IN (SELECT cent_id FROM pcells) AND vec_id <> 0
       |  AND vec_id % 7 <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin
}
