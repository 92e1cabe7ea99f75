package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.sim.Similarity

/** GraftNearestCells contracts: agrees with the crossJoin+window argmax
  * it replaced, and plans as a pure projection (no join, no window). */
class NearestCellsSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def cents16 = {
    import spark.implicits._
    Tables.embeddings(spark, Spec.sf0001).filter($"vec_id" < 16)
      .orderBy($"vec_id").select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
  }

  test("nprobe=1 equals the crossJoin+window argmax formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, Spec.sf0001)
    val got = emb.select($"vec_id",
      element_at(Similarity.nearestCells("embedding", cents16, 1), 1)
        .cast("bigint").as("cell"))
      .orderBy($"vec_id").collect()

    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("c"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos_c".desc, $"cent_id")
    val want = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"cent_id",
        Similarity.cosine("embedding", "c").as("cos_c"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"cent_id".as("cell"))
      .orderBy($"vec_id").collect()
    assert(got.length == want.length && got.length > 0)
    assert(got.sameElements(want))
  }

  test("nprobe=2 returns distinct cells ranked by cosine") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, Spec.sf0001)
    val rows = emb.select($"vec_id",
      Similarity.nearestCells("embedding", cents16, 2).as("cells"))
      .as[(Long, Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, cells) =>
      assert(cells.length == 2 && cells(0) != cells(1))
      assert(cells.forall(c => c >= 0 && c < 16))
    }
    // a centroid's own nearest cell is itself (cosine 1.0)
    rows.filter(_._1 < 16).foreach { case (id, cells) =>
      assert(cells.head == id.toInt, s"centroid $id nearest cell ${cells.head}")
    }
  }

  test("cell assignment plans as a projection: no join, no window") {
    import spark.implicits._
    val plan = Tables.embeddings(spark, Spec.sf0001)
      .select($"vec_id",
        element_at(Similarity.nearestCells("embedding", cents16, 1), 1)
          .cast("bigint").as("cell"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearest_cells"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
