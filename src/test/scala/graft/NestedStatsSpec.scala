package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** NESTED-FIELD DATA SKIPPING: `statsCols = "m.n"` collects per-file
  * min/max/null stats for a field inside a struct column, and pushed
  * predicates on the nested field prune files on BOTH read paths —
  * Spark pushes nested predicates to DSv2 sources with dotted names,
  * and the one shared `typeAt` resolution keeps write-side
  * normalization and read-side pruning in agreement. At 100 TB this is
  * what makes struct-payload event tables (the common log shape)
  * skippable without flattening. */
class NestedStatsSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_nstat").toFile
    try body(s"${root.getAbsolutePath}/t")
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  private def dsv2ScanCounts(
      q: org.apache.spark.sql.DataFrame): Seq[Int] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
      p.flatMap {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: graft.io.GraftScanFiles => Seq(g.scannedFileCount)
            case _ => Nil
          }
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case _ => Nil
      }
    q.count()
    walk(q.queryExecution.executedPlan)
  }

  test("a range predicate on a nested field prunes files by manifest stats") {
    withZone { table =>
      import spark.implicits._
      // four disjoint-range files on the NESTED field m.n
      Seq.tabulate(4) { b =>
        Seq.range(b * 100L, b * 100L + 100L)
          .map(n => (n, s"p$b"))
          .toDF("n", "p")
          .select($"n".as("id"), struct($"n", $"p").as("m")).coalesce(1)
      }.foreach(_.write.format("graft").option("statsCols", "m.n")
        .mode(if (new java.io.File(table).exists) "append" else "overwrite")
        .save(table))
      val st = TxnTable.latestVersion(spark, table).get
      assert(TxnTable.snapshotFiles(spark, table, st).size == 4)
      // the manifest carries per-file stats keyed by the dotted path
      val stats = TxnTable.fileStats(spark, table, st)
      assert(stats.nonEmpty &&
        stats.values.forall(_.exists(_.col == "m.n")),
        s"expected m.n stats on every file; got $stats")

      val q = spark.read.format("graft").load(table)
        .filter($"m.n" >= 250L && $"m.n" < 280L)
      assert(q.count() == 30L)
      val scans = dsv2ScanCounts(
        spark.read.format("graft").load(table)
          .filter($"m.n" >= 250L && $"m.n" < 280L))
      assert(scans.nonEmpty && scans.sum == 1,
        s"nested range must prune 4 files to 1; scan counts: $scans")

      // the LIBRARY read path (delete-applying groups ride it) prunes
      // on the same stats: a merge-on-read table with a live vector
      // still skips by the nested predicate
      TxnTable.deleteWherePos(spark, table, df => df("id") === 399L)
      val after = spark.read.format("graft").load(table)
        .filter($"m.n" >= 250L && $"m.n" < 280L)
      assert(after.count() == 30L)
      assert(spark.read.format("graft").load(table).count() == 399L)
    }
  }

  test("a point lookup on a nested string field prunes by bloom sidecars") {
    withZone { table =>
      import spark.implicits._
      // every file spans the same lexicographic range on m.p — min/max
      // stats can't prune a point lookup BY CONSTRUCTION; only the
      // nested bloom sidecars can
      Seq.tabulate(4) { b =>
        Seq.range(0, 50).map(i => (b * 50L + i, s"${i % 7}_$b"))
          .toDF("id", "p")
          .select($"id", struct($"p").as("m")).coalesce(1)
      }.foreach(_.write.format("graft").option("bloomCols", "m.p")
        .mode(if (new java.io.File(table).exists) "append" else "overwrite")
        .save(table))
      def q() = spark.read.format("graft").load(table)
        .filter($"m.p" === "3_2")
      assert(q().count() == 7L) // i % 7 == 3 within file b=2
      val scans = dsv2ScanCounts(q())
      assert(scans.nonEmpty && scans.sum == 1,
        s"nested bloom probe must prune 4 files to 1; scan counts: $scans")
    }
  }

  test("ZORDER BY nested fields re-clusters; nested scoped OPTIMIZE runs") {
    withZone { table =>
      import spark.implicits._
      // 4 files, each spanning m.a's WHOLE range — unprunable until the
      // z-order on the nested curve dimensions re-clusters them
      Seq.range(0L, 400L).map(i => (i, i % 20L, i / 20L))
        .toDF("id", "a", "b")
        .select($"id", struct($"a", $"b").as("m"))
        .repartition(4)
        .write.format("graft").option("statsCols", "m.a")
        .mode("overwrite").save(table)
      val wide = dsv2ScanCounts(spark.read.format("graft").load(table)
        .filter($"m.a" < 5L))
      assert(wide.sum == 4, s"pre-zorder every file spans m.a: $wide")

      spark.sql(s"OPTIMIZE '$table' ZORDER BY (m.a, m.b) INTO 4 FILES")
      val df = spark.read.format("graft").load(table)
      assert(df.count() == 400L)
      val narrow = dsv2ScanCounts(spark.read.format("graft").load(table)
        .filter($"m.a" < 5L))
      assert(narrow.sum <= 2,
        s"post-zorder a nested range must prune; scan counts: $narrow")

      // nested scoped OPTIMIZE parses and preserves the table
      spark.sql(s"OPTIMIZE '$table' WHERE m.a BETWEEN 0 AND 19")
      assert(spark.read.format("graft").load(table).count() == 400L)
    }
  }

  test("nested stats survive evolution: add field, stat it, then widen") {
    withZone { table =>
      import spark.implicits._
      Seq((1L, 10), (2L, 20)).toDF("id", "x")
        .select($"id", struct($"x").as("m")).coalesce(1)
        .write.format("graft").option("statsCols", "id")
        .mode("overwrite").save(table)
      TxnTable.addNestedColumn(spark, table, "m.score",
        org.apache.spark.sql.types.IntegerType)
      // appends can stat the evolved nested field immediately
      Seq((3L, 30, 7), (4L, 40, 9)).toDF("id", "x", "score")
        .select($"id", struct($"x", $"score").as("m"))
        .write.format("graft").option("statsCols", "id,m.score")
        .mode("append").save(table)
      val stats = TxnTable.fileStats(spark, table,
        TxnTable.latestVersion(spark, table).get)
      assert(stats.values.exists(_.exists(_.col == "m.score")),
        s"evolved nested field must carry stats; got $stats")
      // widen m.score: stats keep working (numeric envelope is
      // type-free), reads promote in-scan
      TxnTable.alterColumnType(spark, table, "m.score",
        org.apache.spark.sql.types.LongType)
      val got = spark.read.format("graft").load(table)
        .filter($"m.score" === 9L).select($"id").as[Long].collect()
      assert(got.toSeq == Seq(4L))
    }
  }
}
