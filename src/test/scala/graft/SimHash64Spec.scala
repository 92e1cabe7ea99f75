package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** Semantics of the native SimHash64 expression (graft.functions.SimHash64):
  * pinned against an independent reimplementation, plus the algebraic
  * properties a SimHash must satisfy. */
class SimHash64Spec extends AnyFunSuite {

  lazy val spark = Spec.spark

  /** Independent reference implementation (BigInt bit twiddling, written
    * differently from the production while-loop version on purpose). */
  private def reference(tokens: Seq[String]): Long = {
    val votes = Array.fill(64)(0)
    tokens.foreach { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      for (b <- 0 until 64)
        votes(b) += (if ((h(b / 8) & (1 << (7 - b % 8))) != 0) 1 else -1)
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (votes(b) >= 0) acc | (1L << (63 - b)) else acc
    }
  }

  private def viaSpark(tokens: Seq[String]): Long = {
    import spark.implicits._
    GraftExtensions.install(spark)
    Seq(tokens).toDF("toks")
      .selectExpr("simhash64(toks) AS h").collect()(0).getLong(0)
  }

  test("matches the independent reference implementation (seeded random docs)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val toks = Seq.fill(rnd.nextInt(50))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      assert(viaSpark(toks) == reference(toks), s"tokens=$toks")
    }
  }

  test("is order-invariant (votes commute)") {
    val toks = Seq("spark", "engine", "dedup", "spark", "x")
    assert(viaSpark(toks) == viaSpark(toks.reverse))
  }

  test("near-identical docs have small hamming distance, unrelated large") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val doc = (1 to 200).map(i => s"tok$i")
    val near = doc.updated(5, "CHANGED")
    val far = (1 to 200).map(i => s"other$i")
    assert(hamming(viaSpark(doc), viaSpark(near)) < 16)
    assert(hamming(viaSpark(doc), viaSpark(far)) > 16)
  }

  test("SQL-callable via extension registration and codegen path") {
    GraftExtensions.install(spark)
    val r = spark.sql("SELECT simhash64(array('a', 'b')) AS h").collect()(0).getLong(0)
    assert(r == reference(Seq("a", "b")))
    // null elements are skipped, null array yields null
    assert(spark.sql("SELECT simhash64(array('a', CAST(NULL AS STRING))) AS h")
      .collect()(0).getLong(0) == reference(Seq("a")))
    assert(spark.sql("SELECT simhash64(CAST(NULL AS ARRAY<STRING>)) AS h")
      .collect()(0).isNullAt(0))
  }
}
