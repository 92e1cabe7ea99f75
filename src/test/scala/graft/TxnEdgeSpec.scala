package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.TxnTable

/** Log-edge contracts called out by review: the `versionAt` upgrade
  * boundary (manifests written before the `#ts=` header existed have
  * only mtimes, which a copied/restored table can leave OUT OF ORDER
  * with recorded times — the binary search must detect the mix and
  * fall back to the exhaustive scan), and the `skipChangeCommits`
  * caveat (a MERGE co-commits its INSERTS with the rewrite it skips,
  * so an append-only incremental consumer silently misses them — the
  * change data feed is the complete channel and must deliver them). */
class TxnEdgeSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_edge").toFile
    try f(zone.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(zone)
    }
  }

  private def manifestFile(table: String, v: Long) =
    new java.io.File(table, f"_v$v%05d.manifest")

  private def recordedTs(table: String, v: Long): Long = {
    val lines = java.nio.file.Files
      .readAllLines(manifestFile(table, v).toPath)
    import scala.jdk.CollectionConverters._
    lines.asScala.find(_.startsWith("#ts=")).get.stripPrefix("#ts=").toLong
  }

  test("versionAt falls back to the linear scan across the #ts upgrade boundary") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      for (v <- 1 to 4) {
        TxnTable.commitAppend(Seq((v.toLong, s"r$v")).toDF("id", "s"), table)
        Thread.sleep(15) // distinct recorded commit times
      }
      val ts3 = recordedTs(table, 3L)
      val ts4 = recordedTs(table, 4L)
      // simulate the upgrade boundary on a COPIED table: v1/v2 predate
      // the #ts header (strip it) and their file mtimes land AFTER every
      // recorded time (the copy rewrote them) — the worst ordering mix
      for (v <- 1L to 2L) {
        val f = manifestFile(table, v)
        val kept = java.nio.file.Files.readAllLines(f.toPath)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.write(f.toPath,
          kept.asScala.filterNot(_.startsWith("#ts=")).asJava)
        assert(f.setLastModified(ts4 + 3600L * 1000L))
      }
      // recorded region still resolves exactly…
      assert(TxnTable.versionAt(spark, table, ts4) == Some(4L))
      assert(TxnTable.versionAt(spark, table, ts3).exists(v => v == 3L || v == 4L))
      // …and a time BEFORE the recorded region must NOT surface v1/v2
      // via their bogus future mtimes (the naive binary search over
      // mixed sources could): with no trustworthy time at or below the
      // probe, the only sound answer is None
      assert(TxnTable.versionAt(spark, table, ts3 - 2L).isEmpty ||
        TxnTable.versionAt(spark, table, ts3 - 2L).exists(_ >= 3L))
    }
  }

  test("skipChangeCommits misses MERGE co-committed inserts; the change feed delivers them") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      TxnTable.commitOverwrite(
        Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
          .repartition(1),
        table, statsCols = Seq("id"), cdf = Some(true))
      // v2: a MERGE that UPDATES id=2 (rewrite) and INSERTS id=9 in the
      // SAME remove+add commit
      TxnTable.merge(Seq((2L, 21.0), (9L, 90.0)).toDF("id", "v"),
        table, "id")
      assert(TxnTable.read(spark, table).count() == 4L)
      // an append-only incremental read refuses the rewrite outright…
      val refused = intercept[IllegalArgumentException] {
        TxnTable.readChanges(spark, table, sinceVersion = 1L)
      }
      assert(refused.getMessage.contains("append-only"))
      // …and the skipChangeCommits escape hatch skips the WHOLE commit:
      // the documented caveat is that the co-committed INSERT (id=9) is
      // never delivered on this channel
      val (skipped, cursor) =
        TxnTable.readChanges(spark, table, sinceVersion = 1L,
          skipChangeCommits = true)
      assert(cursor == 2L && skipped.isEmpty)
      // the change data feed is the lossless channel: it classifies the
      // same commit exactly — including the insert
      val changes = spark.sql(s"SELECT * FROM graft_changes('$table', 1)")
      val inserted = changes
        .filter(col(TxnTable.ChangeTypeCol) === "insert")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(inserted == Set(9L))
      val updated = changes
        .filter(col(TxnTable.ChangeTypeCol) === "update_postimage")
        .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1))
        .toMap
      assert(updated == Map(2L -> 21.0))
    }
  }
}
