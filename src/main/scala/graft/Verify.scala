package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name substrings — run only matching
    // queries (local iteration aid; the driver always runs the full set)
    val only: String => Boolean =
      if (args.length > 2) { val pats = args(2).split(",").toSeq
        name => pats.exists(name.contains)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // µs parquet timestamps (not INT96) so dumped results carry the same
      // logical type DuckDB produces for the oracle side.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // analyzer-level extensions (SQL UPDATE/MERGE INTO lowering) only
      // exist on the config path; install() below covers the rest
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic engine setup: native functions, strategies, rewrites
    graft.functions.GraftExtensions.install(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A crashing query must surface as a RED row in the driver's
        // report, never a silent omission: write a one-row marker frame
        // whose schema can't match any oracle, so rows/schema/hash all
        // mismatch and the failure is visible in CORRECTNESS_r{N}.json.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // the marker write itself can fail (full disk, unwritable outDir —
        // plausibly the same cause as the query failure); never let that
        // abort the remaining queries
        try {
          import spark.implicits._
          val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
          Seq(msg).toDF("_graft_query_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name marker write also failed: ${m.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // a NULL oracle string (the classic cause: a `val xSql` declared
    // AFTER the registry `all` it feeds — initialization order) must
    // cost ONE red row, not the whole dump: dropping it here makes the
    // driver record that query as oracle-less/mismatched while every
    // other result still gets compared
    val (nullSql, liveSql) = SparkEntry.oracleSql.partition(_._2 == null)
    nullSql.keys.foreach(k => System.err.println(
      s"[verify] $k has a NULL oracle (val-vs-def initialization " +
        "order?) — dropped from oracle_sql.json"))
    val json = liveSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
