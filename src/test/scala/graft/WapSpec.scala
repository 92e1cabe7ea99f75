package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Tables, TxnTable}

/** Write-audit-publish staged commits: invisibility until publish,
  * by-reference publication (no data rewrite), the publish-time audit
  * gate (constraints added DURING the audit window), idempotent
  * replays, abort reclamation, vacuum pinning of unpublished stages,
  * and the schema-conflict refusal. */
class WapSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  private def withZone(f: String => Unit): Unit = {
    val zone = java.nio.file.Files.createTempDirectory("graft_wap").toFile
    try f(s"${zone.getAbsolutePath}/t")
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(); ()
      }
      rm(new java.io.File(zone.getAbsolutePath))
    }
  }

  private def base(table: String): Unit = {
    val cust = Tables.customer(spark, Spec.sf0001)
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
    TxnTable.commitOverwrite(cust.filter($"c_custkey" <= 50), table,
      statsCols = Seq("c_custkey"))
    ()
  }

  test("staged rows are invisible until publish; publish is by reference") {
    withZone { table =>
      base(table)
      val n0 = TxnTable.read(spark, table).count()
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 80)
      val t0 = System.currentTimeMillis()
      val id = TxnTable.stageAppend(batch, table,
        statsCols = Seq("c_custkey"))
      val t1 = System.currentTimeMillis()
      // invisible: same row count, same version
      assert(TxnTable.read(spark, table).count() == n0)
      val v1 = TxnTable.latestVersion(spark, table).get
      // the audit sees the union
      val audit = TxnTable.readStaged(spark, table, id)
      assert(audit.count() == n0 + batch.count())
      assert(TxnTable.stagedIds(spark, table) == Seq(id))
      // the auditor's SQL listing: SHOW STAGES / graft_stages agree
      val shown = spark.sql(s"SHOW STAGES ON '$table'").collect()
      assert(shown.length == 1 && shown(0).getString(0) == id &&
        shown(0).getLong(2) == batch.count() &&
        shown(0).getLong(3) == v1)
      assert(spark.sql(s"SELECT * FROM graft_stages('$table')")
        .collect().map(_.getString(0)).toSeq == Seq(id))
      // stage AGE: both spellings carry staged_at inside the stage
      // call's wall-clock window — abandoned vacuum-pinned stages are
      // findable by policy, not by a human noticing
      val shownAt = shown(0).getTimestamp(4)
      assert(shownAt != null &&
        shownAt.getTime >= t0 && shownAt.getTime <= t1,
        s"staged_at $shownAt outside the stage window [$t0, $t1]")
      assert(spark.sql(s"SELECT staged_at FROM graft_stages('$table')")
        .head().getTimestamp(0) == shownAt,
        "SHOW STAGES and graft_stages disagree on staged_at")
      // publish: files carry BY REFERENCE (no rewrite)
      val before = TxnTable.snapshotFiles(spark, table, v1).toSet
      val v2 = TxnTable.publishStage(spark, table, id)
      val after = TxnTable.snapshotFiles(spark, table, v2).toSet
      assert(before.subsetOf(after), "publish must never rewrite")
      assert(TxnTable.read(spark, table).count() == n0 + batch.count())
      // stats came along: a point read on the published range prunes
      val stats = TxnTable.fileStats(spark, table, v2)
      assert((after -- before).forall(f =>
        stats.getOrElse(f, Nil).exists(_.col == "c_custkey")),
        "published files must carry their staged stats")
      // the staged manifest is gone; replay returns the same version
      assert(TxnTable.stagedIds(spark, table).isEmpty)
      assert(TxnTable.publishStage(spark, table, id) == v2 ||
        // replay path: marker already present → current version
        TxnTable.latestVersion(spark, table).contains(v2))
    }
  }

  test("publish replay is idempotent even with the staged manifest intact") {
    withZone { table =>
      base(table)
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 60)
      val id = TxnTable.stageAppend(batch, table)
      val v = TxnTable.publishStage(spark, table, id)
      val n = TxnTable.read(spark, table).count()
      // a crashed publisher that died between CAS and manifest cleanup
      // re-offers: marker wins, no double append
      assert(TxnTable.publishStage(spark, table, id) == v)
      assert(TxnTable.read(spark, table).count() == n)
      assert(TxnTable.latestVersion(spark, table).contains(v))
    }
  }

  test("a constraint added during the audit window gates the publish") {
    withZone { table =>
      base(table)
      val bad = Seq((9001L, -5.0, "BAD")).toDF(
        "c_custkey", "c_acctbal", "c_mktsegment")
      val id = TxnTable.stageAppend(bad, table)
      // auditor adds a constraint AFTER the stage landed
      TxnTable.addCheck(spark, table, "pos_bal", "c_acctbal >= 0",
        validateExisting = false)
      val e = intercept[IllegalArgumentException] {
        TxnTable.publishStage(spark, table, id)
      }
      assert(e.getMessage.contains("pos_bal"))
      // nothing leaked; abort reclaims the staged files
      val vBefore = TxnTable.latestVersion(spark, table).get
      TxnTable.abortStage(spark, table, id)
      assert(TxnTable.stagedIds(spark, table).isEmpty)
      assert(TxnTable.latestVersion(spark, table).contains(vBefore))
      assert(TxnTable.read(spark, table)
        .filter($"c_custkey" === 9001L).count() == 0L)
    }
  }

  test("vacuum KEEP 0 pins an unpublished stage's files") {
    withZone { table =>
      base(table)
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 70)
      val nb = batch.count()
      val id = TxnTable.stageAppend(batch, table)
      // churn history so vacuum has something real to reap
      TxnTable.commitAppend(Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 100 && $"c_custkey" <= 110), table)
      TxnTable.compact(spark, table)
      TxnTable.vacuum(spark, table, keep = 0)
      // the stage survived the most aggressive vacuum and still publishes
      assert(TxnTable.readStaged(spark, table, id).count() ==
        TxnTable.read(spark, table).count() + nb)
      val v = TxnTable.publishStage(spark, table, id)
      assert(TxnTable.readVersion(spark, table, v).count() ==
        TxnTable.read(spark, table).count())
      // once published, the pin is the chain's: a new vacuum keeps them
      TxnTable.vacuum(spark, table, keep = 0)
      assert(TxnTable.read(spark, table)
        .filter($"c_custkey" > 50 && $"c_custkey" <= 70).count() == nb)
    }
  }

  test("schema evolution during the audit window refuses the publish") {
    withZone { table =>
      base(table)
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 55)
      val id = TxnTable.stageAppend(batch, table)
      // an evolving append lands during the audit
      TxnTable.commitAppend(
        Seq((8001L, 1.0, "SEG", "note")).toDF(
          "c_custkey", "c_acctbal", "c_mktsegment", "c_note"), table)
      val e = intercept[IllegalArgumentException] {
        TxnTable.publishStage(spark, table, id)
      }
      assert(e.getMessage.contains("schema changed"))
      TxnTable.abortStage(spark, table, id)
    }
  }

  test("concurrent ordinary appends and a publish all survive the CAS") {
    withZone { table =>
      base(table)
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      val id = TxnTable.stageAppend(
        cust.filter($"c_custkey" > 50 && $"c_custkey" <= 60), table)
      // same-schema appends interleave with the publish
      TxnTable.commitAppend(
        cust.filter($"c_custkey" > 100 && $"c_custkey" <= 105), table)
      val v = TxnTable.publishStage(spark, table, id)
      TxnTable.commitAppend(
        cust.filter($"c_custkey" > 105 && $"c_custkey" <= 110), table)
      val want = cust.filter($"c_custkey" <= 60 ||
        ($"c_custkey" > 100 && $"c_custkey" <= 110)).count()
      assert(TxnTable.read(spark, table).count() == want)
      assert(TxnTable.readVersion(spark, table, v).count() ==
        cust.filter($"c_custkey" <= 60 ||
          ($"c_custkey" > 100 && $"c_custkey" <= 105)).count())
    }
  }

  test("the change feed surfaces a publish as plain appended rows") {
    withZone { table =>
      base(table)
      val vPre = TxnTable.latestVersion(spark, table).get
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 65)
      val id = TxnTable.stageAppend(batch, table)
      // staging alone is NOT a change
      val (none, _) = TxnTable.readChanges(spark, table, vPre)
      assert(none.count() == 0L)
      TxnTable.publishStage(spark, table, id)
      val (changed, upTo) = TxnTable.readChanges(spark, table, vPre)
      assert(upTo == TxnTable.latestVersion(spark, table).get)
      assert(changed.select($"c_custkey").as[Long].collect().sorted.toSeq ==
        batch.select($"c_custkey").as[Long].collect().sorted.toSeq,
        "the published batch must be the exact change set")
    }
  }

  test("staging works on partitioned tables with hostile partition values") {
    withZone { table =>
      val mk = (ids: Range, tag: String) =>
        ids.map(i => (i.toLong, i * 1.5, s"$tag")).toDF(
          "c_custkey", "c_acctbal", "c_mktsegment")
      // partition values exercising URI-escaping: space, percent,
      // fragment and query chars (non-ASCII is untestable here — the
      // forked JVM's POSIX locale cannot host such paths at all)
      val b0 = mk(1 to 20, "SEG A").unionByName(mk(21 to 40, "P%25X"))
        .unionByName(mk(41 to 60, "A#B?C"))
      TxnTable.commitOverwrite(b0, table, statsCols = Seq("c_custkey"),
        partitionCols = Seq("c_mktsegment"))
      val staged = mk(61 to 80, "SEG A").unionByName(mk(81 to 90, "P%2FQ"))
      val id = TxnTable.stageAppend(staged, table,
        statsCols = Seq("c_custkey"))
      assert(TxnTable.readStaged(spark, table, id).count() == 90L)
      val v = TxnTable.publishStage(spark, table, id)
      val got = TxnTable.readVersion(spark, table, v)
      assert(got.count() == 90L)
      assert(got.filter($"c_mktsegment" === "P%2FQ").count() == 10L)
      assert(got.filter($"c_mktsegment" === "SEG A").count() == 40L)
      // partition stats (single-valued files) carried: segment
      // predicates prune published files too
      val stats = TxnTable.fileStats(spark, table, v)
      assert(stats.values.flatten.exists(s =>
        s.col == "c_mktsegment" && s.minV == "P%2FQ" && s.maxV == "P%2FQ"))
    }
  }

  test("publishStages lands several audited batches in ONE atomic commit") {
    withZone { table =>
      base(table)
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      val ida = TxnTable.stageAppend(
        cust.filter($"c_custkey" > 50 && $"c_custkey" <= 60), table)
      val idb = TxnTable.stageAppend(
        cust.filter($"c_custkey" > 60 && $"c_custkey" <= 70), table)
      val v0 = TxnTable.latestVersion(spark, table).get
      val v = TxnTable.publishStages(spark, table, Seq(ida, idb))
      assert(v == v0 + 1L, "two batches must cost exactly one version")
      assert(TxnTable.read(spark, table).count() ==
        cust.filter($"c_custkey" <= 70).count())
      // no intermediate snapshot holds only one batch
      assert(TxnTable.readVersion(spark, table, v0).count() ==
        cust.filter($"c_custkey" <= 50).count())
      // full-set replay heals; mixed-set replay refuses
      assert(TxnTable.publishStages(spark, table, Seq(ida, idb)) == v)
      val idc = TxnTable.stageAppend(
        cust.filter($"c_custkey" > 70 && $"c_custkey" <= 75), table)
      val e = intercept[IllegalArgumentException] {
        TxnTable.publishStages(spark, table, Seq(ida, idc))
      }
      assert(e.getMessage.contains("already published separately"))
      TxnTable.abortStage(spark, table, idc)
    }
  }

  test("the typed change feed classifies a publish as plain inserts") {
    withZone { table =>
      base(table)
      val vPre = TxnTable.latestVersion(spark, table).get
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 62)
      val id = TxnTable.stageAppend(batch, table)
      TxnTable.publishStage(spark, table, id)
      // the op-classified feed (commitChanges), not just the file diff
      val cf = TxnTable.changeFeed(spark, table, vPre)
      assert(cf.filter($"_change_type" === "insert").count() ==
        batch.count())
      assert(cf.filter($"_change_type" =!= "insert").count() == 0L)
    }
  }

  test("idempotent stage ids: a retried micro-batch re-offers one stage") {
    withZone { table =>
      base(table)
      val n0 = TxnTable.read(spark, table).count()
      val batch = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .filter($"c_custkey" > 50 && $"c_custkey" <= 58)
      val id1 = TxnTable.stageAppend(batch, table, stageId = Some("b7"))
      // the retry after a crash between stage and checkpoint
      val id2 = TxnTable.stageAppend(batch, table, stageId = Some("b7"))
      assert(id1 == "b7" && id2 == "b7")
      assert(TxnTable.stagedIds(spark, table) == Seq("b7"))
      TxnTable.publishStage(spark, table, "b7")
      assert(TxnTable.read(spark, table).count() == n0 + batch.count(),
        "the retried batch must land exactly once")
      // an id that EVER published refuses fresh data: a later publish
      // would replay-heal and silently discard it (the restarted-from-
      // scratch checkpoint case must fail loudly, not lose a batch)
      val e = intercept[IllegalArgumentException] {
        TxnTable.stageAppend(batch, table, stageId = Some("b7"))
      }
      assert(e.getMessage.contains("already published"))
    }
  }

  test("abort releases the pin; the orphaned data reclaims on vacuum") {
    withZone { table =>
      base(table)
      val n0 = TxnTable.read(spark, table).count()
      val id = TxnTable.stageAppend(
        Tables.customer(spark, Spec.sf0001)
          .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
          .filter($"c_custkey" > 50 && $"c_custkey" <= 60), table)
      TxnTable.abortStage(spark, table, id)
      // abort deletes no data itself (the publish/abort race must
      // never leave a snapshot referencing deleted bytes) — the next
      // retention pass reclaims the unpinned orphan
      TxnTable.vacuum(spark, table, keep = 0)
      assert(TxnTable.vacuumDryRun(spark, table, keep = 0).isEmpty,
        "the aborted stage's files must be reclaimable orphans")
      assert(TxnTable.read(spark, table).count() == n0)
    }
  }

  test("field-id tables refuse an atomic publish of two evolving stages") {
    withZone { table =>
      val cust = Tables.customer(spark, Spec.sf0001)
        .select($"c_custkey", $"c_acctbal")
      TxnTable.commitOverwrite(
        TxnTable.withFieldIds(cust.filter($"c_custkey" <= 50)), table)
      val a = TxnTable.stageAppend(
        cust.filter($"c_custkey" > 50 && $"c_custkey" <= 55)
          .withColumn("xa", lit(1L)), table)
      val b = TxnTable.stageAppend(
        cust.filter($"c_custkey" > 55 && $"c_custkey" <= 60)
          .withColumn("yb", lit(2L)), table)
      // both minted their new column's id from the same base floor —
      // an atomic publish would commit duplicate field ids
      val e = intercept[IllegalArgumentException] {
        TxnTable.publishStages(spark, table, Seq(a, b))
      }
      assert(e.getMessage.contains("minted against the same base"))
      // published separately: the second hits the schema-changed rule
      TxnTable.publishStage(spark, table, a)
      val e2 = intercept[IllegalArgumentException] {
        TxnTable.publishStage(spark, table, b)
      }
      assert(e2.getMessage.contains("schema changed"))
      TxnTable.abortStage(spark, table, b)
    }
  }

  private def seg(lo: Int, hi: Int) =
    Tables.customer(spark, Spec.sf0001)
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      .filter($"c_custkey" > lo && $"c_custkey" <= hi)

  private def latestManifestText(table: String): String = {
    val dir = new java.io.File(table)
    val m = dir.listFiles().filter(_.getName.endsWith(".manifest"))
      .maxBy(_.getName)
    new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8")
  }

  test("batch-shaped stage ids collapse to ONE high-water marker per " +
      "prefix — manifests stay O(metadata) under continuous ingest") {
    withZone { table =>
      base(table)
      val n0 = TxnTable.read(spark, table).count()
      val a = TxnTable.stageAppend(seg(50, 55), table,
        stageId = Some("qx-b0"))
      val b = TxnTable.stageAppend(seg(55, 60), table,
        stageId = Some("qx-b1"))
      TxnTable.publishStages(spark, table, Seq(a, b))
      val c = TxnTable.stageAppend(seg(60, 65), table,
        stageId = Some("qx-b2"))
      TxnTable.publishStage(spark, table, c)
      val txt = latestManifestText(table)
      assert(txt.contains("graft.wapseq.qx"),
        "the per-prefix high-water marker must be carried")
      assert(!txt.contains("graft.wap.qx-b"),
        "no per-batch marker lines — one line per QUERY, not per batch")
      assert(TxnTable.read(spark, table).count() == n0 + 15)
      // the reuse refusal survives the collapse: any ordinal at or
      // below the high-water mark refuses fresh data loudly
      val e = intercept[IllegalArgumentException] {
        TxnTable.stageAppend(seg(65, 70), table, stageId = Some("qx-b1"))
      }
      assert(e.getMessage.contains("already published"))
      // a replay of a published set still heals to the same version
      val v = TxnTable.latestVersion(spark, table).get
      assert(TxnTable.publishStages(spark, table, Seq(a, b)) == v)
    }
  }

  test("a crashed publisher's leftover staged manifest cannot eat a " +
      "restarted checkpoint's fresh batch") {
    withZone { table =>
      base(table)
      val id = TxnTable.stageAppend(seg(50, 55), table,
        stageId = Some("crash1"))
      val staged = new java.io.File(s"$table/_staged/$id.manifest")
      val bytes = java.nio.file.Files.readAllBytes(staged.toPath)
      TxnTable.publishStage(spark, table, id)
      // simulate the crash window: marker committed, manifest cleanup
      // never ran — both artifacts exist
      java.nio.file.Files.write(staged.toPath, bytes)
      // a from-scratch restart reusing the id must FAIL LOUDLY, not
      // silently re-offer the stale stage and discard its new rows
      val e = intercept[IllegalArgumentException] {
        TxnTable.stageAppend(seg(55, 60), table, stageId = Some(id))
      }
      assert(e.getMessage.contains("already published"))
      assert(!staged.exists,
        "the refusal reaps the now-redundant crash-residue manifest")
    }
  }

  test("abortStagesOlderThan reaps only stale stages; published " +
      "residue is skipped but its manifest still clears") {
    withZone { table =>
      base(table)
      val a = TxnTable.stageAppend(seg(50, 55), table,
        stageId = Some("stale-a"))
      val b = TxnTable.stageAppend(seg(55, 60), table,
        stageId = Some("stale-b"))
      // a generous threshold reaps nothing — both stages are young
      assert(TxnTable.abortStagesOlderThan(spark, table,
        60L * 60L * 1000L).isEmpty)
      assert(TxnTable.stagedIds(spark, table).sorted == Seq(a, b).sorted)
      // crash residue: c published but its manifest cleanup never ran
      val c = TxnTable.stageAppend(seg(60, 65), table,
        stageId = Some("stale-c"))
      val mc = new java.io.File(s"$table/_staged/$c.manifest")
      val bytes = java.nio.file.Files.readAllBytes(mc.toPath)
      TxnTable.publishStage(spark, table, c)
      java.nio.file.Files.write(mc.toPath, bytes)
      val n = TxnTable.read(spark, table).count()
      Thread.sleep(15) // every stage is now strictly older than "now"
      val reaped = TxnTable.abortStagesOlderThan(spark, table, 0L)
      // the published residue is NOT reported aborted (its rows are
      // live) but its redundant manifest clears with the sweep
      assert(reaped.sorted == Seq(a, b).sorted, reaped)
      assert(TxnTable.stagedIds(spark, table).isEmpty)
      assert(TxnTable.read(spark, table).count() == n,
        "the sweep must not touch published rows")
      // batch-shaped AMBIGUITY: policy never auto-decides it — a
      // published ordinal's crash residue reaps without being REPORTED
      // aborted (a compaction could have broken the membership
      // heuristic and live rows must never read as discarded), and a
      // SKIPPED ordinal stays listed for the operator's abortStage
      val b0 = TxnTable.stageAppend(seg(65, 70), table,
        stageId = Some("amb-b0"))
      val b1 = TxnTable.stageAppend(seg(70, 75), table,
        stageId = Some("amb-b1"))
      val mb1 = new java.io.File(s"$table/_staged/$b1.manifest")
      val bytes1 = java.nio.file.Files.readAllBytes(mb1.toPath)
      TxnTable.publishStage(spark, table, b1) // b0 is now SKIPPED
      java.nio.file.Files.write(mb1.toPath, bytes1) // b1 crash residue
      Thread.sleep(15)
      val reaped2 = TxnTable.abortStagesOlderThan(spark, table, 0L)
      assert(reaped2.isEmpty, reaped2)
      assert(!mb1.exists,
        "published batch residue reaps without an aborted report")
      assert(TxnTable.stagedIds(spark, table) == Seq(b0),
        "the skipped ordinal must stay listed for the operator")
      TxnTable.abortStage(spark, table, b0) // the documented remedy
      assert(TxnTable.stagedIds(spark, table).isEmpty)
      // SQL parity: the policy's ALTER TABLE spelling (VACUUM's
      // RETAIN shape applied to audits)
      val d = TxnTable.stageAppend(seg(75, 78), table,
        stageId = Some("stale-d"))
      assert(TxnTable.stagedIds(spark, table) == Seq(d))
      Thread.sleep(15)
      spark.sql(
        s"ALTER TABLE '$table' ABORT STAGES OLDER THAN 0 SECONDS")
        .collect()
      assert(TxnTable.stagedIds(spark, table).isEmpty,
        "the SQL sweep spelling must reap the stale stage")
    }
  }

  test("a crashed BATCH-shaped publisher's residue reaps on refusal; " +
      "a skipped ordinal's stage stays pinned for abort") {
    withZone { table =>
      base(table)
      // crash residue: b0 published (seq high-water only — no per-id
      // marker), manifest cleanup never ran
      val b0 = TxnTable.stageAppend(seg(50, 55), table,
        stageId = Some("crashb-b0"))
      val m0 = new java.io.File(s"$table/_staged/$b0.manifest")
      val bytes = java.nio.file.Files.readAllBytes(m0.toPath)
      TxnTable.publishStage(spark, table, b0)
      java.nio.file.Files.write(m0.toPath, bytes)
      val e = intercept[IllegalArgumentException] {
        TxnTable.stageAppend(seg(55, 60), table, stageId = Some(b0))
      }
      assert(e.getMessage.contains("already published"))
      assert(!m0.exists, "batch-shaped residue (all staged files live " +
        "in the snapshot) must reap on the refusal path — otherwise a " +
        "restarted-from-scratch pipeline pins vacuum forever")
      // the OTHER direction: b1 staged but SKIPPED (b2 published past
      // it) — its files are NOT live, so the refusal must keep the
      // manifest pinned; abortStage is the documented remedy
      val b1 = TxnTable.stageAppend(seg(60, 65), table,
        stageId = Some("crashb-b1"))
      val b2 = TxnTable.stageAppend(seg(65, 70), table,
        stageId = Some("crashb-b2"))
      TxnTable.publishStage(spark, table, b2)
      val m1 = new java.io.File(s"$table/_staged/$b1.manifest")
      intercept[IllegalArgumentException] {
        TxnTable.stageAppend(seg(70, 75), table, stageId = Some(b1))
      }
      assert(m1.exists, "a skipped ordinal's never-published files are " +
        "not residue — the stage must stay for abortStage, not reap")
      TxnTable.abortStage(spark, table, b1)
      assert(!m1.exists)
    }
  }

  test("abortStage on batch-shaped crash residue reports the live rows " +
      "instead of claiming a clean abort") {
    withZone { table =>
      base(table)
      val id = TxnTable.stageAppend(seg(50, 55), table,
        stageId = Some("abres-b0"))
      val m = new java.io.File(s"$table/_staged/$id.manifest")
      val bytes = java.nio.file.Files.readAllBytes(m.toPath)
      TxnTable.publishStage(spark, table, id)
      val n = TxnTable.read(spark, table).count()
      java.nio.file.Files.write(m.toPath, bytes)
      // the rows ARE live (seq marker, files in the snapshot): abort
      // must remove the redundant manifest but throw, not report a
      // successful abort of live data — and the residue check happens
      // AFTER the delete, so a publish racing into the gap is seen
      val e = intercept[IllegalStateException] {
        TxnTable.abortStage(spark, table, id)
      }
      assert(e.getMessage.contains("rows are live"), e.getMessage)
      assert(!m.exists)
      assert(TxnTable.read(spark, table).count() == n)
    }
  }

  test("out-of-order publish of a SKIPPED lower ordinal refuses " +
      "loudly instead of replay-dropping its rows") {
    withZone { table =>
      base(table)
      val lo = TxnTable.stageAppend(seg(50, 55), table,
        stageId = Some("ooo-b0"))
      val hi = TxnTable.stageAppend(seg(55, 60), table,
        stageId = Some("ooo-b1"))
      TxnTable.publishStage(spark, table, hi)
      // b0's rows never landed; a silent replay-return would lose them
      val e = intercept[IllegalArgumentException] {
        TxnTable.publishStage(spark, table, lo)
      }
      assert(e.getMessage.contains("non-decreasing"))
      // the documented remedy: abort the skipped stage (its rows are
      // NOT live, so abort must not claim otherwise), re-stage fresh
      TxnTable.abortStage(spark, table, lo)
      assert(TxnTable.stagedIds(spark, table).isEmpty)
    }
  }

  test("a STOCK df.write with option(stageId) stages invisibly and " +
      "publishes by reference; misuse spellings refuse") {
    withZone { table =>
      base(table)
      val n0 = TxnTable.read(spark, table).count()
      val batch = seg(50, 60)
      batch.write.format("graft").option("stageId", "opt1")
        .mode("append").save(table)
      assert(TxnTable.read(spark, table).count() == n0,
        "the option write must be invisible until publish")
      assert(TxnTable.stagedIds(spark, table) == Seq("opt1"))
      // SQL INSERT ... STAGE rides the same path
      seg(60, 65).createOrReplaceTempView("wapspec_src")
      try {
        spark.sql(s"INSERT INTO '$table' STAGE 'opt2' " +
          "SELECT * FROM wapspec_src").collect()
      } finally spark.catalog.dropTempView("wapspec_src")
      assert(TxnTable.read(spark, table).count() == n0)
      assert(TxnTable.stagedIds(spark, table).sorted == Seq("opt1", "opt2"))
      TxnTable.publishStages(spark, table, Seq("opt1", "opt2"))
      assert(TxnTable.read(spark, table).count() == n0 + 15)
      // staging an overwrite, or doubling up with txn idempotence,
      // must refuse loudly — both would silently change semantics
      intercept[IllegalArgumentException] {
        seg(65, 70).write.format("graft").option("stageId", "bad")
          .mode("overwrite").save(table)
      }
      intercept[IllegalArgumentException] {
        seg(65, 70).write.format("graft").option("stageId", "bad")
          .option("txnAppId", "a").option("txnVersion", "1")
          .mode("append").save(table)
      }
      // sticky table flags and a divergent partitioning refuse too —
      // a staged append can neither toggle mergeOnRead/CDF nor land in
      // a layout the table doesn't record
      intercept[IllegalArgumentException] {
        seg(65, 70).write.format("graft").option("stageId", "bad")
          .option("mergeOnRead", "true").mode("append").save(table)
      }
      intercept[IllegalArgumentException] {
        seg(65, 70).write.format("graft").option("stageId", "bad")
          .option("partitionBy", "c_mktsegment")
          .mode("append").save(table)
      }
      assert(TxnTable.stagedIds(spark, table).isEmpty,
        "refused staged writes must leave nothing staged")
      ()
    }
  }

  test("identity tables refuse staging; missing stages fail loudly") {
    withZone { table =>
      val df = TxnTable.withIdentityColumn(
        Tables.customer(spark, Spec.sf0001)
          .select($"c_acctbal").limit(5), "rid")
      TxnTable.commitOverwrite(df, table)
      val e = intercept[IllegalArgumentException] {
        TxnTable.stageAppend(
          Tables.customer(spark, Spec.sf0001).select($"c_acctbal").limit(2),
          table)
      }
      assert(e.getMessage.contains("IDENTITY"))
      intercept[IllegalArgumentException] {
        TxnTable.publishStage(spark, table, "nope")
      }
      ()
    }
  }
}
