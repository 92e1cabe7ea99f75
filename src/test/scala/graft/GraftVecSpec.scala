package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins graft.functions.GraftDot / GraftCosine (native one-pass kernels)
  * bit-for-bit against the higher-order-function spelling they replaced —
  * the same spelling the DuckDB oracles state. */
class GraftVecSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._
  import graft.sim.Similarity

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong,
        Array.fill(dim)(rnd.nextFloat() * 2 - 1),
        Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("native dot is bit-identical to the HOF fold on random floats") {
    val df = randomVecs(200, 64, seed = 7)
      .select($"id", Similarity.dot("a", "b").as("native"),
        Similarity.dotHof("a", "b").as("hof"))
    // exact comparison: doubleToRawLongBits equality, not tolerance
    val diff = df.filter(
      $"native".isNull =!= $"hof".isNull ||
      ($"native".isNotNull && $"native" =!= $"hof")).count()
    assert(diff == 0)
  }

  test("native cosine equals composed dot/sqrt spelling bit-for-bit") {
    val composed = (a: String, b: String) =>
      Similarity.dotHof(a, b) / (sqrt(Similarity.dotHof(a, a)) * sqrt(Similarity.dotHof(b, b)))
    val df = randomVecs(200, 64, seed = 11)
      .select(Similarity.cosine("a", "b").as("native"), composed("a", "b").as("hof"))
    assert(df.filter($"native" =!= $"hof").count() == 0)
    assert(df.filter($"native".isNull).count() == 0)
  }

  test("null element and length mismatch yield NULL (zip_with semantics)") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),   // ok
      (2L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)), // null elem
      (3L, Seq[java.lang.Float](1f), Seq[java.lang.Float](3f, 4f))        // length mismatch
    ).toDF("id", "a", "b")
      .select($"id", Similarity.dot("a", "b").as("d"), Similarity.cosine("a", "b").as("c"))
      .orderBy($"id").collect()
    assert(!df(0).isNullAt(1) && df(0).getDouble(1) == 11.0)
    assert(df(1).isNullAt(1) && df(1).isNullAt(2))
    assert(df(2).isNullAt(1) && df(2).isNullAt(2))
  }

  test("graft_dot / graft_cosine are SQL-callable after install") {
    graft.functions.GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0)
  }

  test("native expressions stay inside whole-stage codegen") {
    // parquet-backed source: a local relation would be constant-folded
    val emb = graft.io.Tables.embeddings(spark, Spec.sf0001)
    val plan = emb
      .select(Similarity.cosine("embedding", "embedding").as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_cosine"), plan)
  }
}
