package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Queries exercising graft's custom whole-operators. */
object PlanOps {

  // ---------------------------------------------------------------- c60
  /** Top-3 orders per customer through the native TopKPerKey operator
    * (bounded heaps, no per-group sort). The oracle states the same
    * semantics in the classic ROW_NUMBER form — so the driver proves the
    * custom physical operator is semantically identical to the window
    * plan it replaces. */
  private def c60(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    TopK.perKey(o, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
  }
  private val c60Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- c61
  /** Point-in-time lookup through the native AsOfJoin operator: every
    * click joined to the user's latest purchase at-or-before it. The
    * oracle states the same semantics as a per-row LATERAL top-1 — which
    * is exactly the O(n·m) rescan shape the one-pass merge replaces. */
  private def c61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event_id"), $"user_id".as("p_user_id"), $"ts".as("p_ts"))
    AsOf.join(clicks, purchases, "user_id", "p_user_id", "ts", "p_ts",
        rightTieBreak = Seq("p_event_id"))
      .select($"event_id", $"user_id", $"ts", $"p_event_id", $"p_ts")
      .orderBy($"event_id")
  }
  private val c61Sql =
    """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |purchases AS (SELECT event_id AS p_event_id, user_id AS p_user_id, ts AS p_ts
      |              FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.p_ts
      |FROM clicks c LEFT JOIN LATERAL (
      |  SELECT p_event_id, p_ts FROM purchases p
      |  WHERE p.p_user_id = c.user_id AND p.p_ts <= c.ts
      |  ORDER BY p_ts DESC, p_event_id DESC LIMIT 1) p ON TRUE
      |ORDER BY c.event_id""".stripMargin

  // ---------------------------------------------------------------- c62
  /** The idiomatic ROW_NUMBER window top-k, written exactly as a user
    * would — but with GraftExtensions installed, the RewriteTopKWindow
    * optimizer rule replaces the window+filter with the native TopKPerKey
    * operator (PlanRewriteSpec asserts the exec actually appears).
    * Same oracle as c60: identical semantics, better plan, zero user
    * code change. */
  private def c62(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftExtensions.install(spark)
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .drop("rn")
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
  }

  // ---------------------------------------------------------------- c63
  /** QUALITY-TOP-K PER SOURCE — the curation cut a training pipeline
    * runs over every crawl snapshot: keep each source's k best
    * documents by the composite quality score (t32's exact formula).
    * `source` has a HANDFUL of distinct values, so the idiomatic
    * ROW_NUMBER window would serialize the corpus through #sources
    * tasks; the native TopKPerKey operator keeps bounded per-key heaps
    * in every map task and merges partial heaps — parallelism scales
    * with the data, state with k·#sources. The oracle states the same
    * semantics in the window form. */
  private def c63(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.text.TextFunctions.{stopwords, tokens, wordSetCount}
    val base = Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("ttr", size(array_distinct($"toks")).cast("double") / $"n_tokens")
      .withColumn("stop_ratio",
        wordSetCount("toks", stopwords("en")).cast("double") / $"n_tokens")
      .withColumn("quality",
        lit(0.35) * least(lit(1.0), $"n_tokens" / lit(200.0)) +
          lit(0.35) * $"ttr" + lit(0.30) * $"stop_ratio")
      .select($"source", $"doc_id", $"quality")
    TopK.perKey(base, Seq("source"),
        Seq("quality" -> false, "doc_id" -> true), k = 5)
      .orderBy($"source", $"quality".desc, $"doc_id")
  }
  private val c63Sql = {
    import graft.text.TextFunctions.stopwords
    val inSql = stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH scored AS (
       |  SELECT source, doc_id,
       |    CAST(0.35 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE),
       |        LEN(string_split(text, ' ')) / CAST(200.0 AS DOUBLE))
       |      + CAST(0.35 AS DOUBLE) * (CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |          / LEN(string_split(text, ' ')))
       |      + CAST(0.30 AS DOUBLE) * (CAST(LEN(list_filter(string_split(text, ' '),
       |            t -> t IN ($inSql))) AS DOUBLE)
       |          / LEN(string_split(text, ' '))) AS quality
       |  FROM documents),
       |ranked AS (
       |  SELECT source, doc_id, quality,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY quality DESC, doc_id) AS rn
       |  FROM scored)
       |SELECT source, doc_id, quality FROM ranked WHERE rn <= 5
       |ORDER BY source, quality DESC, doc_id""".stripMargin
  }

  val all: Seq[RQ] = Seq(
    RQ("c60_topk_custom_operator", c60, Some(c60Sql), bench = true),
    RQ("c61_asof_join_operator", c61, Some(c61Sql), bench = true),
    RQ("c62_topk_window_rewrite", c62, Some(c60Sql)),
    RQ("c63_quality_topk_per_source", c63, Some(c63Sql), bench = true))
}
