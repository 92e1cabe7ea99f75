package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables
import TextFunctions._

/** Registered text-analysis queries over the documents table.
  * Every ratio/score is derived from integers identical on both engines,
  * so doubles are bit-exact (see TextFunctions scaladoc). */
object TextOps {

  private def inSql(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  // ---------------------------------------------------------------- t30
  /** Token counting + surface statistics (n_chars/n_tokens/TTR/densities).
    * avg_token_len exploits the corpus being single-space separated:
    * token chars = length - (n_tokens - 1). */
  private def t30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Par.spread(Tables.documents(spark, dir))
      .withColumn("toks", tokens($"text"))
      .select(
        $"doc_id",
        length($"text").cast("bigint").as("n_chars_calc"),
        size($"toks").cast("bigint").as("n_tokens"),
        size(array_distinct($"toks")).cast("bigint").as("n_unique"),
        (size(array_distinct($"toks")).cast("double") / size($"toks")).as("ttr"),
        ((length($"text") - (size($"toks") - 1)).cast("double") / size($"toks")).as("avg_token_len"),
        wordSetCount("toks", stopwords("en")).cast("bigint").as("n_stop_en"),
        (wordSetCount("toks", stopwords("en")).cast("double") / size($"toks")).as("stop_ratio"),
        length(regexp_replace($"text", "[^0-9]", "")).cast("bigint").as("n_digits"))
      .orderBy($"doc_id")
  }
  private val t30Sql =
    s"""SELECT doc_id,
       | CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
       | CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       | CAST(LEN(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
       | CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE) / LEN(string_split(text, ' ')) AS ttr,
       | CAST(LENGTH(text) - (LEN(string_split(text, ' ')) - 1) AS DOUBLE) / LEN(string_split(text, ' ')) AS avg_token_len,
       | CAST(LEN(list_filter(string_split(text, ' '), t -> t IN (${inSql(stopwords("en"))}))) AS BIGINT) AS n_stop_en,
       | CAST(LEN(list_filter(string_split(text, ' '), t -> t IN (${inSql(stopwords("en"))}))) AS DOUBLE) / LEN(string_split(text, ' ')) AS stop_ratio,
       | CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t31
  /** Heuristic language ID: stopword-hit argmax over 4 language profiles
    * (n-gram-free variant that is exactly mirrorable in SQL). */
  private def t31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("s_en", wordSetCount("toks", stopwords("en")).cast("bigint"))
      .withColumn("s_es", wordSetCount("toks", stopwords("es")).cast("bigint"))
      .withColumn("s_fr", wordSetCount("toks", stopwords("fr")).cast("bigint"))
      .withColumn("s_de", wordSetCount("toks", stopwords("de")).cast("bigint"))
    scored.select(
      $"doc_id", $"lang", $"s_en", $"s_es", $"s_fr", $"s_de",
      langPredicted($"s_en", $"s_es", $"s_fr", $"s_de").as("lang_pred"),
      (langPredicted($"s_en", $"s_es", $"s_fr", $"s_de") === $"lang").as("agrees"))
      .orderBy($"doc_id")
  }
  private val t31Sql = {
    def s(l: String) =
      s"CAST(LEN(list_filter(string_split(text, ' '), t -> t IN (${inSql(stopwords(l))}))) AS BIGINT)"
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    ${s("en")} AS s_en, ${s("es")} AS s_es, ${s("fr")} AS s_fr, ${s("de")} AS s_de
       |  FROM documents)
       |SELECT doc_id, lang, s_en, s_es, s_fr, s_de,
       | CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
       |      WHEN s_en >= GREATEST(s_es, s_fr, s_de) THEN 'en'
       |      WHEN s_es >= GREATEST(s_fr, s_de) THEN 'es'
       |      WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS lang_pred,
       | (CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
       |      WHEN s_en >= GREATEST(s_es, s_fr, s_de) THEN 'en'
       |      WHEN s_es >= GREATEST(s_fr, s_de) THEN 'es'
       |      WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END) = lang AS agrees
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t32
  /** Composite quality score: length saturation + lexical diversity +
    * stopword naturalness, bucketed high/medium/low. */
  private def t32(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("ttr", size(array_distinct($"toks")).cast("double") / $"n_tokens")
      .withColumn("stop_ratio",
        wordSetCount("toks", stopwords("en")).cast("double") / $"n_tokens")
    val score = lit(0.35) * least(lit(1.0), $"n_tokens" / lit(200.0)) +
      lit(0.35) * $"ttr" + lit(0.30) * $"stop_ratio"
    base.select(
      $"doc_id", $"n_tokens".cast("bigint").as("n_tokens"), $"ttr", $"stop_ratio",
      score.as("quality"),
      when(score >= 0.6, "high").when(score >= 0.4, "medium").otherwise("low").as("quality_bucket"))
      .orderBy($"doc_id")
  }
  private val t32Sql =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    LEN(string_split(text, ' ')) AS n_tokens,
       |    CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE) / LEN(string_split(text, ' ')) AS ttr,
       |    CAST(LEN(list_filter(string_split(text, ' '), t -> t IN (${inSql(stopwords("en"))}))) AS DOUBLE)
       |      / LEN(string_split(text, ' ')) AS stop_ratio
       |  FROM documents)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, ttr, stop_ratio,
       | CAST(0.35 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), n_tokens / CAST(200.0 AS DOUBLE))
       |   + CAST(0.35 AS DOUBLE) * ttr + CAST(0.30 AS DOUBLE) * stop_ratio AS quality,
       | CASE WHEN CAST(0.35 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), n_tokens / CAST(200.0 AS DOUBLE))
       |   + CAST(0.35 AS DOUBLE) * ttr + CAST(0.30 AS DOUBLE) * stop_ratio >= 0.6 THEN 'high'
       |      WHEN CAST(0.35 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), n_tokens / CAST(200.0 AS DOUBLE))
       |   + CAST(0.35 AS DOUBLE) * ttr + CAST(0.30 AS DOUBLE) * stop_ratio >= 0.4 THEN 'medium'
       |      ELSE 'low' END AS quality_bucket
       |FROM base ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t38
  /** SimHash (16-bit portable variant): per-token MD5 bit votes → sign
    * bits. The 64-bit production variant is the native Catalyst expression
    * (graft.functions); this one is exactly SQL-mirrorable. */
  private def t38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("hs", expr("transform(toks, t -> md5(t))"))
      .select($"doc_id", simhashBits("hs", 16).as("simhash16"))
      .orderBy($"doc_id")
  }
  private val t38Sql = {
    val bits = (0 until 16).map { b =>
      val nibble = b / 4 + 1
      val shift = 3 - b % 4
      s"""CASE WHEN (SELECT SUM(CASE WHEN ((STRPOS('0123456789abcdef', SUBSTR(h, $nibble, 1)) - 1 >> $shift) & 1) = 1 THEN 1 ELSE -1 END)
         |  FROM UNNEST(list_transform(string_split(text, ' '), t -> md5(t))) AS u(h)) >= 0 THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")
    s"""SELECT doc_id, $bits AS simhash16
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t39
  /** BPE-ish regex tokenization: letter runs / digit runs / single
    * punctuation, the pre-tokenizer shape BPE vocabularies train on —
    * vs plain whitespace tokens (t30). Same RE2-safe pattern in both
    * engines. */
  private def t39(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    graft.ops.Par.spread(Tables.documents(spark, dir))
      .select(
        $"doc_id",
        size(expr(s"regexp_extract_all(text, '$pat', 0)")).cast("bigint").as("n_bpe_tokens"),
        size(array_distinct(expr(s"regexp_extract_all(text, '$pat', 0)"))).cast("bigint").as("n_bpe_unique"),
        size(split($"text", " ")).cast("bigint").as("n_ws_tokens"))
      .orderBy($"doc_id")
  }
  private val t39Sql =
    """SELECT doc_id,
      | CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
      | CAST(LEN(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS n_bpe_unique,
      | CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t40
  /** Polynomial rolling-hash fingerprint over the first 64 characters
    * (h ← (h·257 + codepoint) mod 1e9+7): pure BIGINT arithmetic, so the
    * fingerprint is identical on every engine — the cheap streaming
    * alternative to MD5 for content-defined chunking. */
  private def t40(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Par.spread(Tables.documents(spark, dir))
      .select(
        $"doc_id",
        expr(
          """aggregate(
            | transform(split(substring(text, 1, 64), ''), ch -> ascii(ch)),
            | CAST(0 AS BIGINT),
            | (h, c) -> (h * 257 + c) % 1000000007)""".stripMargin)
          .as("rolling_hash64c"))
      .orderBy($"doc_id")
  }
  private val t40Sql =
    """SELECT doc_id,
      | list_reduce(list_prepend(CAST(0 AS BIGINT),
      |   [CAST(unicode(x) AS BIGINT) for x in string_split(substring(text, 1, 64), '')]),
      |   (h, c) -> (h * 257 + c) % 1000000007) AS rolling_hash64c
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("t30_text_stats", t30, Some(t30Sql), bench = true),
    RQ("t31_lang_id", t31, Some(t31Sql)),
    RQ("t32_quality_score", t32, Some(t32Sql)),
    RQ("t38_simhash16", t38, Some(t38Sql)),
    RQ("t39_bpe_tokens", t39, Some(t39Sql)),
    RQ("t40_rolling_hash", t40, Some(t40Sql)))
}
