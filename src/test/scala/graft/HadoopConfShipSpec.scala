package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TxnTable

/** Records FileSystem.open calls made through a conf that carried the
  * driver's custom keys: instantiated (instead of plain LocalFileSystem)
  * only when the OPENING code resolved its FileSystem from a conf that
  * had `fs.file.impl` set — i.e. a conf that actually shipped from the
  * driver. A bare executor-side `new Configuration()` never sees the
  * override and opens through the default filesystem, recording
  * nothing. */
class ProbeLocalFs extends org.apache.hadoop.fs.LocalFileSystem {
  private var probe: String = _
  override def initialize(uri: java.net.URI,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    probe = conf.get("graft.test.probe")
  }
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    // the thread name separates EXECUTOR-task opens (what these specs
    // assert on — local mode runs tasks on "Executor task launch
    // worker-N" threads) from driver-side opens, which use the session
    // conf directly and would otherwise mask a missing broadcast
    ProbeLocalFs.opens.add(
      (f.toString, String.valueOf(probe), Thread.currentThread().getName))
    super.open(f, bufferSize)
  }
}
object ProbeLocalFs {
  val opens =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
}

/** The driver's session Hadoop configuration (spark.hadoop.* keys,
  * object-store credentials, custom FS impls) must reach EVERY
  * executor-side filesystem access the engine makes outside Spark's
  * own scan machinery — the positional-vector sidecar GETs inside the
  * DSv2 partition readers and DEEP CLONE's distributed copy tasks. A
  * bare `new Configuration()` there reads core-site defaults only and
  * breaks on any non-default filesystem (the engine's stated target).
  *
  * Mechanism under test: both paths broadcast
  * `spark.sessionState.newHadoopConf()` via SerializableConfiguration.
  * The check is end-to-end: a custom `fs.file.impl` + marker key set
  * on the driver's Hadoop conf must be VISIBLE inside the task — the
  * probe FileSystem only records opens when the task-side conf carried
  * both keys. */
class HadoopConfShipSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private def withZone(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_hconf").toFile
    try body(root.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }

  /** Run `body` with the probe FS + marker installed on the DRIVER's
    * Hadoop conf (the source newHadoopConf() copies from), restoring
    * the conf and draining the recorder afterwards. */
  private def withProbeConf(body: => Unit): Seq[(String, String, String)] = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.test.probe", "xyz42")
    hc.set("fs.file.impl", classOf[ProbeLocalFs].getName)
    // the FileSystem CACHE keys on (scheme, ugi) only — without this a
    // pre-probe LocalFileSystem instance would be returned regardless
    // of fs.file.impl and the probe would never instantiate
    hc.set("fs.file.impl.disable.cache", "true")
    ProbeLocalFs.opens.clear()
    try {
      body
      ProbeLocalFs.opens.toArray(Array.empty[(String, String, String)]).toSeq
    } finally {
      ProbeLocalFs.opens.clear()
      hc.unset("graft.test.probe")
      hc.unset("fs.file.impl")
      hc.unset("fs.file.impl.disable.cache")
    }
  }

  test("positional-vector sidecar reads see the driver's hadoop conf") {
    withZone { zone =>
      import spark.implicits._
      val table = s"$zone/t"
      Seq.range(0L, 40L).map(k => (k, k % 4)).toDF("k", "g")
        .repartitionByRange(4, $"k")
        .write.format("graft").option("statsCols", "k")
        .option("mergeOnRead", "true").mode("overwrite").save(table)
      assert(TxnTable.deleteWherePos(spark, table, df => df("g") === 1) > 0L)
      val opens = withProbeConf {
        // vector-gated DSv2 read: each gated partition reader loads its
        // sidecar ordinals through the BROADCAST driver conf. SUM, not
        // COUNT — a count answers from manifest metadata (driver-side
        // vector subtraction) without ever creating partition readers
        assert(spark.read.format("graft").load(table)
          .agg(sum("k")).head().getLong(0) ==
          (0L until 40L).filter(_ % 4 != 1).sum)
      }
      // executor-task opens ONLY: the driver also reads sidecars (for
      // metadata counts / exact scan stats) with its own session conf,
      // which would mask a partition reader still on new Configuration()
      val sidecarOpens = opens.filter(o =>
        o._1.contains("/_del/") && o._3.contains("Executor task launch"))
      assert(sidecarOpens.nonEmpty,
        s"no EXECUTOR-side sidecar open went through the shipped conf; " +
          s"saw: $opens")
      assert(sidecarOpens.forall(_._2 == "xyz42"),
        s"sidecar opens lost the driver's marker key: $sidecarOpens")
    }
  }

  test("DEEP CLONE copy tasks see the driver's hadoop conf") {
    withZone { zone =>
      import spark.implicits._
      val src = s"$zone/src"
      val dst = s"$zone/dst"
      Seq.range(0L, 20L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(2, $"k")
        .write.format("graft").option("statsCols", "k")
        .mode("overwrite").save(src)
      val opens = withProbeConf {
        assert(TxnTable.cloneDeep(spark, src, dst) == 1L)
      }
      val copyOpens = opens.filter(o =>
        o._1.contains("/src/") && o._1.endsWith(".parquet") &&
          o._3.contains("Executor task launch"))
      assert(copyOpens.nonEmpty,
        s"no EXECUTOR-side source-file open went through the shipped " +
          s"conf; saw: $opens")
      assert(copyOpens.forall(_._2 == "xyz42"),
        s"copy-task opens lost the driver's marker key: $copyOpens")
      // and the clone is intact
      assert(spark.read.format("graft").load(dst).count() == 20L)
    }
  }
}
