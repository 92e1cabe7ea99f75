package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q => RQ}
import graft.io.Tables
import graft.text.TextFunctions._

/** The COMPOSED training-data pipeline — the operators proven one-by-one
  * elsewhere (exact dedup d34, quality scoring t32, chunking t41) chained
  * into the single pass a real corpus build runs:
  *
  *   documents → fingerprint dedup keep-first → quality score →
  *   drop low-quality (threshold 0.32, ≈ the corpus P90) → sliding-window chunk → per-doc chunk stats
  *
  * The point of registering the composite: a library whose operators only
  * work in isolation isn't a pipeline engine. The oracle replays the same
  * chain as one CTE stack, so the hash gate covers the COMPOSITION
  * (filter-after-dedup ordering, quality threshold on bit-identical
  * doubles, chunk-count arithmetic), not just the stages.
  *
  * Shape at 100 TB: one shuffle (the fingerprint keep-first, a
  * map-side-combinable MIN — a mass-duplicated fingerprint collapses
  * before the exchange instead of pinning a window reducer), then pure
  * per-row projections/explodes and one keyed count — the same plan the
  * stages have individually; composition adds no new exchanges. */
object PipelineOps {

  private def inSql(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  private def p90(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deduped = Tables.documents(spark, dir)
      .withColumn("fp", fingerprint($"text"))
      .groupBy($"fp")
      .agg(min(struct($"doc_id", $"text")).as("best"))
      .select($"best.doc_id".as("doc_id"), $"best.text".as("text"))
    val scored = deduped
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("ttr",
        size(array_distinct($"toks")).cast("double") / $"n_tokens")
      .withColumn("stop_ratio",
        wordSetCount("toks", stopwords("en")).cast("double") / $"n_tokens")
      .withColumn("quality",
        lit(0.35) * least(lit(1.0), $"n_tokens" / lit(200.0)) +
          lit(0.35) * $"ttr" + lit(0.30) * $"stop_ratio")
      .filter($"quality" >= 0.32)
    scored
      .select($"doc_id", $"n_tokens", $"quality",
        explode(sequence(lit(0), greatest(length($"text") - 1, lit(0)),
          lit(160))).as("start"))
      .groupBy($"doc_id")
      .agg(
        max($"n_tokens").cast("bigint").as("n_tokens"),
        max($"quality").as("quality"),
        count(lit(1)).cast("bigint").as("n_chunks"))
      .orderBy($"doc_id")
  }
  private val p90Sql =
    s"""WITH dd AS (
       |  SELECT doc_id, text,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY md5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))))
       |      ORDER BY doc_id) AS rn
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, text,
       |    LEN(string_split(text, ' ')) AS n_tokens,
       |    CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / LEN(string_split(text, ' ')) AS ttr,
       |    CAST(LEN(list_filter(string_split(text, ' '), t -> t IN (${inSql(stopwords("en"))}))) AS DOUBLE)
       |      / LEN(string_split(text, ' ')) AS stop_ratio
       |  FROM dd WHERE rn = 1),
       |scored AS (
       |  SELECT doc_id, text, n_tokens,
       |    CAST(0.35 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), n_tokens / CAST(200.0 AS DOUBLE))
       |      + CAST(0.35 AS DOUBLE) * ttr + CAST(0.30 AS DOUBLE) * stop_ratio AS quality
       |  FROM base)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
       | CAST(FLOOR(GREATEST(LEN(text) - 1, 0) / 160.0) + 1 AS BIGINT) AS n_chunks
       |FROM scored WHERE quality >= 0.32
       |ORDER BY doc_id""".stripMargin

  /** Data-quality EXPECTATIONS gate (the Delta-Live-Tables `EXPECT`
    * shape): evaluate named boolean rules over every row in ONE
    * distributed projection — no per-rule pass, no shuffle. Each row is
    * annotated with the array of rule names it VIOLATES (`__violations`)
    * and an overall `__pass`; violating rows are retained with their
    * reasons, never silently dropped — the caller chooses quarantine
    * (`filter(!$"__pass")`) vs flow-on. NULL rule results count as
    * violations (a rule that cannot be evaluated has not been met).
    * At 100 TB this is the ingest gate in front of every pipeline:
    * pure codegen'd row work, metrics from one aggregate. */
  def expectations(df: DataFrame,
                   rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val viol = array_compact(array(rules.map { case (name, cond) =>
      when(!coalesce(cond, lit(false)), lit(name))
        .otherwise(lit(null).cast("string"))
    }: _*))
    df.withColumn("__violations", viol)
      .withColumn("__pass", size(col("__violations")) === 0)
  }

  // ---------------------------------------------------------------- p91
  /** The expectations gate over documents, metrics under the oracle:
    * one row per rule (violation count + rate) plus the pass-all
    * summary. Rules mix always-true invariants (consistency checks
    * whose zero counts verify the arithmetic isn't vacuous by
    * construction) with a length gate that actually fires. */
  private val p91Rules: Seq[(String, String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.functions.{col, length}
    Seq(
      ("chars_consistent", "n_chars = LENGTH(text)",
        col("n_chars") === length(col("text"))),
      ("lang_known", "lang IN ('de','en','es','fr','zh')",
        col("lang").isin("de", "en", "es", "fr", "zh")),
      ("min_length_100", "n_chars >= 100", col("n_chars") >= 100),
      ("text_present", "text IS NOT NULL AND LENGTH(text) > 0",
        col("text").isNotNull && length(col("text")) > 0))
  }

  private def p91(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val annotated = expectations(
      Tables.documents(spark, dir), p91Rules.map(r => (r._1, r._3)))
    val aggs =
      p91Rules.map { case (n, _, _) =>
        sum(when(array_contains($"__violations", n), 1L).otherwise(0L)).as(s"v_$n") } ++
        Seq(sum(when($"__pass", 1L).otherwise(0L)).as("clean"),
          count(lit(1)).as("total"))
    val r = annotated.agg(aggs.head, aggs.tail: _*).head()
    val total = r.getAs[Long]("total")
    val rows =
      (("_passed_all", r.getAs[Long]("clean")) +:
        p91Rules.map { case (n, _, _) => (n, r.getAs[Long](s"v_$n")) })
        .map { case (n, v) =>
          org.apache.spark.sql.Row(n, v, v.toDouble / total) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rule",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rate",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }
  private val p91Sql = {
    val perRule = p91Rules.map { case (n, sql, _) =>
      s"""SELECT '$n' AS rule,
         | CAST(COUNT(*) FILTER (WHERE NOT COALESCE($sql, FALSE)) AS BIGINT) AS n,
         | CAST(COUNT(*) FILTER (WHERE NOT COALESCE($sql, FALSE)) AS DOUBLE)
         |   / COUNT(*) AS rate
         |FROM documents""".stripMargin }
    val passAll = {
      val conj = p91Rules.map(r => s"COALESCE(${r._2}, FALSE)").mkString(" AND ")
      s"""SELECT '_passed_all' AS rule,
         | CAST(COUNT(*) FILTER (WHERE $conj) AS BIGINT) AS n,
         | CAST(COUNT(*) FILTER (WHERE $conj) AS DOUBLE) / COUNT(*) AS rate
         |FROM documents""".stripMargin }
    (passAll +: perRule).mkString("\nUNION ALL\n") + "\nORDER BY rule"
  }

  val all: Seq[RQ] = Seq(
    RQ("p90_training_pipeline", p90, Some(p90Sql), bench = true),
    RQ("p91_dq_expectations", p91, Some(p91Sql)))
}
