package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.ZOrder

/** The z-order layout's REASON TO EXIST, measured: files clustered along
  * the Morton curve of (custkey, orderkey) must carry narrow min/max
  * spans in BOTH dimensions, where a single-column sort layout leaves
  * the other dimension's span at ~full range (so a predicate on it can
  * prune nothing). */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  /** Mean per-file span of `c` over a written layout. */
  private def meanSpan(path: String, c: String): Double =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
      .agg(avg($"span")).as[Double].head()

  test("N-way z-order bounds every dimension; 2-col clusterN matches cluster") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorderN").toString
    try {
      val orders = Tables.orders(spark, Spec.sf0001)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val files = 27 // 3 dims ⇒ ~3×3×3 grid, expected span ~1/3 of range
      ZOrder.clusterN(orders,
        Seq("o_orderkey", "o_custkey", "o_totalprice"), files)
        .write.parquet(s"$base/z3")
      def range(c: String): Double = orders.agg(
        (max(col(c)) - min(col(c))).cast("double")).as[Double].head()
      for (c <- Seq("o_orderkey", "o_custkey", "o_totalprice")) {
        val frac = meanSpan(s"$base/z3", c) / range(c)
        info(f"$c span under 3-way z-order: $frac%.2f of range")
        // every dimension bounded well below full range (grid ~1/3;
        // generous slack for uneven key distributions)
        assert(frac < 0.7, f"$c span $frac%.2f — dimension unclustered")
      }
      assert(spark.read.parquet(s"$base/z3").count() == orders.count())
      // the 2-column N-way interleave is bit-identical to the proven
      // 2-column path: same lane width, same bit placement
      val a = ZOrder.cluster(orders, "o_custkey", "o_orderkey", 8)
        .withColumn("f", spark_partition_id())
      val b = ZOrder.clusterN(orders, Seq("o_custkey", "o_orderkey"), 8)
        .withColumn("f", spark_partition_id())
      assert(a.select("o_orderkey", "f").except(
        b.select("o_orderkey", "f")).isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("z-ordered files are narrow in both dimensions; linear sort is not") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      val orders = Tables.orders(spark, Spec.sf0001)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val files = 16
      // layout A: classic single-column sort by orderkey
      orders.repartitionByRange(files, $"o_orderkey")
        .sortWithinPartitions($"o_orderkey")
        .write.parquet(s"$base/linear")
      // layout B: z-order on (custkey, orderkey)
      ZOrder.zorderWrite(orders, s"$base/zorder", "o_custkey", "o_orderkey", files)

      val custRange = orders.agg(
        (max($"o_custkey") - min($"o_custkey")).cast("double")).as[Double].head()
      val linCust = meanSpan(s"$base/linear", "o_custkey")
      val zCust = meanSpan(s"$base/zorder", "o_custkey")
      val zKey = meanSpan(s"$base/zorder", "o_orderkey")
      val keyRange = orders.agg(
        (max($"o_orderkey") - min($"o_orderkey")).cast("double")).as[Double].head()
      info(f"custkey span: linear ${linCust / custRange}%.2f of range, " +
        f"z-order ${zCust / custRange}%.2f")
      info(f"orderkey span under z-order: ${zKey / keyRange}%.2f of range")
      // linear-by-orderkey leaves custkey unclustered: ~full range per file
      assert(linCust > custRange * 0.8)
      // the z-curve bounds BOTH dimensions well below the full range —
      // i.e. min/max footer stats can prune files for predicates on
      // either column (16 files ≈ 4×4 grid ⇒ ~1/4 span; allow slack)
      assert(zCust < custRange * 0.55,
        f"z-order custkey span too wide: $zCust vs range $custRange")
      assert(zKey < keyRange * 0.55,
        f"z-order orderkey span too wide: $zKey vs range $keyRange")
      // row counts identical — layout only
      assert(spark.read.parquet(s"$base/zorder").count() == orders.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("zvalue folds negative keys like pmod — never a garbage curve position") {
    // a sign-preserving % would feed negative values into the spread
    // masks; every z-value must land in [0, 2^32) and equal the
    // explicitly pmod-folded spelling
    val keys = Seq(
      (-1L, -65536L), (-123L, 456L), (-65537L, -2L),
      (Long.MinValue + 10, Long.MaxValue - 10), (0L, 0L), (65535L, 65535L))
    val rows = keys.toDF("x", "y")
      .select(
        ZOrder.zvalue($"x", $"y").as("z"),
        ZOrder.zvalue(pmod($"x", lit(65536L)), pmod($"y", lit(65536L))).as("zp"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 32), s"out of range: $r")
      assert(r.getLong(0) == r.getLong(1), s"negative fold mismatch: $r")
    }
  }
}
