package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Text batch 2 (round 2): document chunking with overlap, PII redaction,
  * and TF-IDF term ranking — the remaining text stages of an LLM
  * training-data pipeline (after t30-t40's stats/lang-ID/quality/tokens).
  *
  * All three are per-row expressions or standard keyed aggregations:
  * chunking explodes bounded windows (no shuffle), redaction is a scalar
  * regexp pass, TF-IDF is two hash aggregations + one broadcastable join —
  * each shape survives 100 TB unchanged.
  */
object Text2Ops {

  // ---------------------------------------------------------------- t41
  /** Sliding-window chunking: 200-char chunks, stride 160 (40-char
    * overlap) — the context-window prep step before embedding/tokenizing.
    * Chunk starts are a bounded per-row sequence explode; empty docs
    * produce one empty chunk (start 0) so no document is silently
    * dropped. */
  private def t41(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text",
        explode(sequence(lit(0), greatest(length($"text") - 1, lit(0)), lit(160)))
          .as("start"))
      .select(
        $"doc_id",
        $"start".cast("bigint").as("start"),
        expr("substring(text, start + 1, 200)").as("chunk"))
      .select(
        $"doc_id", $"start",
        length($"chunk").cast("bigint").as("n_chunk_chars"),
        md5($"chunk").as("chunk_md5"))
      .orderBy($"doc_id", $"start")
  }
  private val t41Sql =
    """SELECT doc_id, CAST(start AS BIGINT) AS start,
      | CAST(LENGTH(substr(text, start + 1, 200)) AS BIGINT) AS n_chunk_chars,
      | MD5(substr(text, start + 1, 200)) AS chunk_md5
      |FROM documents,
      | LATERAL (SELECT UNNEST(range(0, GREATEST(LENGTH(text), 1), 160)) AS start) t
      |ORDER BY doc_id, start""".stripMargin

  // ---------------------------------------------------------------- t42
  /** PII redaction: emails and long digit runs replaced by placeholder
    * tags, with per-row match counts. The input synthesizes one email and
    * one numeric id per document (the corpus itself is digit-free), so the
    * redaction path is provably non-vacuous; the md5 of the redacted text
    * proves byte-identical rewriting across engines. Regexes use only
    * character classes — the portable subset of Java regex and RE2. */
  private def t42(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[.][a-zA-Z][a-zA-Z]+"
    val numRe = "[0-9][0-9][0-9][0-9]+"
    Tables.documents(spark, dir)
      .withColumn("raw",
        concat($"text", lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail.example.com ref "), ($"doc_id" * 7919).cast("string")))
      .select(
        $"doc_id",
        size(expr(s"regexp_extract_all(raw, '$emailRe', 0)")).cast("bigint").as("n_emails"),
        size(expr(s"regexp_extract_all(regexp_replace(raw, '$emailRe', '<EMAIL>'), '$numRe', 0)"))
          .cast("bigint").as("n_longnums"),
        md5(regexp_replace(
          regexp_replace($"raw", emailRe, "<EMAIL>"), numRe, "<NUM>")).as("redacted_md5"))
      .orderBy($"doc_id")
  }
  private val t42Sql = {
    val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[.][a-zA-Z][a-zA-Z]+"
    val numRe = "[0-9][0-9][0-9][0-9]+"
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |         || '@mail.example.com ref ' || CAST(doc_id * 7919 AS VARCHAR) AS raw
       |  FROM documents)
       |SELECT doc_id,
       | CAST(LEN(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS n_emails,
       | CAST(LEN(regexp_extract_all(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'), '$numRe')) AS BIGINT) AS n_longnums,
       | MD5(regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'), '$numRe', '<NUM>', 'g')) AS redacted_md5
       |FROM raw ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t43
  /** TF-IDF term ranking: top-3 terms per document (docs 0-49) scored by
    * tf · (N/df). The idf is the RATIONAL form (no logarithm): Spark's
    * Math.log and DuckDB's libm log can differ in the last ulp, while
    * int/int division and one multiply are IEEE-identical — same ordering,
    * oracle-exact scores. df is computed over the FULL corpus (the part
    * that matters at scale: one distinct-aggregation shuffle), tf only
    * over the probed docs. */
  private def t43(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .filter(length($"term") > 0)
    val tf = toks.filter($"doc_id" < 50)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select($"doc_id", $"term",
        ($"tf".cast("double") * ($"n".cast("double") / $"df".cast("double"))).as("score"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter($"rn" <= 3)
      .orderBy($"doc_id", $"rn")
  }
  private val t43Sql =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS term FROM documents),
      |tok AS (SELECT doc_id, term FROM toks WHERE LENGTH(term) > 0),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE doc_id < 50 GROUP BY doc_id, term),
      |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.term,
      |    CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score
      |  FROM tf JOIN dfreq ON tf.term = dfreq.term, n),
      |ranked AS (
      |  SELECT doc_id, term, score,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rn
      |  FROM scored)
      |SELECT doc_id, term, score, rn FROM ranked WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- t44
  /** Repetition quality signal (the Gopher/fineweb-style filter): per
    * document, the share of bigram occurrences taken by the single most
    * repeated bigram, and the distinct-bigram ratio — high top-bigram
    * share / low distinct ratio flags boilerplate and degenerate text.
    * Shape: bounded per-row explode → two keyed aggregations (doc_id ×
    * gram, then doc_id) — no joins, scales linearly. Ratios are single
    * divisions of exact integers, so they are bit-equal cross-engine. */
  private def t44(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.text.TextFunctions.{tokens, tokenNgrams}
    Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .select($"doc_id", explode(tokenNgrams("toks", 2)).as("g"))
      .groupBy($"doc_id", $"g")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(
        sum($"c").cast("bigint").as("n_bigrams"),
        (max($"c").cast("double") / sum($"c").cast("double"))
          .as("top_bigram_frac"),
        (count(lit(1)).cast("double") / sum($"c").cast("double"))
          .as("distinct_bigram_ratio"))
      .orderBy($"doc_id")
  }
  private val t44Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |    unnest([string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |            for i in range(1, len(string_split(text,' ')))]) AS g
      |  FROM documents),
      |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
      |SELECT doc_id,
      | CAST(SUM(c) AS BIGINT) AS n_bigrams,
      | CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac,
      | CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_bigram_ratio
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t45
  /** UNICODE CANONICALIZATION — the normalize-before-fingerprint step a
    * multilingual corpus needs: NFC composition (decomposed `e`+COMBINING
    * ACUTE and precomposed `é` are byte-different, dedup-identical),
    * zero-width character stripping (ZWSP/ZWNJ/ZWJ/BOM — invisible
    * dedup-defeating bytes common in scraped text), and whitespace
    * collapse. The corpus is ASCII, so the fixture first INJECTS the
    * pathologies deterministically (a→a+U+0301, e→e+ZWSP) and the
    * pipeline must undo them; the oracle (DuckDB `nfc_normalize`) agrees
    * or the hash breaks. NFC runs as graft's native codegen'd `nfc`
    * expression whose ASCII fast path returns the input by reference —
    * at 100 TB the normalizer walk is paid only by the non-ASCII
    * minority. */
  private def t45(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    def nfc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      GraftBridge.column(graft.functions.NfcNormalize(GraftBridge.expression(c)))
    val dirty = Tables.documents(spark, dir).select($"doc_id",
      regexp_replace(regexp_replace($"text", "a", "á"), "e", "e​")
        .as("raw"))
    dirty.select(
      $"doc_id",
      length($"raw").cast("bigint").as("n_raw"),
      nfc(regexp_replace(
        regexp_replace($"raw", "[​‌‍﻿]", ""),
        "\\s+", " "))
        .as("clean"))
      .withColumn("n_clean", length($"clean").cast("bigint"))
      .orderBy($"doc_id")
  }
  private val t45Sql =
    """WITH dirty AS (
      |  SELECT doc_id,
      |    replace(replace(text, 'a', 'a' || chr(769)), 'e', 'e' || chr(8203)) AS raw
      |  FROM documents)
      |SELECT doc_id,
      | CAST(LEN(raw) AS BIGINT) AS n_raw,
      | nfc_normalize(regexp_replace(
      |   regexp_replace(raw, '[​‌‍﻿]', '', 'g'),
      |   '\s+', ' ', 'g')) AS clean,
      | CAST(LEN(nfc_normalize(regexp_replace(
      |   regexp_replace(raw, '[​‌‍﻿]', '', 'g'),
      |   '\s+', ' ', 'g'))) AS BIGINT) AS n_clean
      |FROM dirty ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t46
  /** EDIT-DISTANCE near-dup kernel: Levenshtein between consecutive
    * documents' 80-char prefixes (bounded cost — the O(n²) DP runs on
    * fixed-size prefixes, the right discipline at corpus scale), with a
    * near-dup verdict at a relative threshold. The pairwise kernel
    * composes with LSH candidates (d37) exactly like the Jaccard kernel
    * (d35); integer distances make the oracle exact. Uses Spark's
    * built-in codegen'd `levenshtein` — both engines implement the
    * same DP, so the hash must agree. */
  private def t46(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", substring($"text", 1, 80).as("pfx"))
    val a = docs.select($"doc_id".as("doc_a"), $"pfx".as("pfx_a"))
    val b = docs.select($"doc_id".as("doc_b"), $"pfx".as("pfx_b"))
    a.join(b, $"doc_b" === $"doc_a" + 1)
      .select($"doc_a", $"doc_b",
        levenshtein($"pfx_a", $"pfx_b").cast("bigint").as("dist"),
        (levenshtein($"pfx_a", $"pfx_b") <= 24).as("near_dup"))
      .orderBy($"doc_a")
  }
  private val t46Sql =
    """WITH p AS (SELECT doc_id, substr(text, 1, 80) AS pfx FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist,
      | levenshtein(a.pfx, b.pfx) <= 24 AS near_dup
      |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
      |ORDER BY doc_a""".stripMargin

  // ---------------------------------------------------------------- t47
  /** SEQUENCE PACKING — the last hop before a pretraining run: pack
    * documents, in deterministic (lang, doc_id) order, into fixed
    * token-budget training sequences (concat-then-chunk at 512 tokens,
    * the streaming-concatenation packing GPT-style pipelines use).
    * `seq_id = floor(tokens-before-this-doc / 512)` via one window
    * cumulative sum — a document always joins the sequence its START
    * falls into, so packing is reproducible regardless of partitioning.
    * Scale shape: the window partitions by (lang, bucket) where
    * `bucket = floor(doc_id / bucketSize)` — a coarse range bucket that
    * keeps the cumulative sum embarrassingly parallel instead of
    * serializing the whole corpus through one task per language. Each
    * bucket packs independently (a sequence never crosses a bucket
    * boundary — acceptable padding loss of < 1 sequence per bucket).
    * bucketSize here is 100 so the test data exercises multiple buckets;
    * a 100 TB run uses the same plan with bucketSize ~10M. */
  private[graft] def sequencePack(docs: DataFrame, bucketSize: Long,
                                  budget: Double): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang", $"bucket").orderBy($"doc_id")
    docs
      .withColumn("bucket", floor($"doc_id" / bucketSize).cast("bigint"))
      .withColumn("cum_before", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("seq_id", floor($"cum_before" / budget).cast("bigint"))
      .groupBy($"lang", $"bucket", $"seq_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum($"n_tokens").cast("bigint").as("n_tokens"),
        min($"doc_id").cast("bigint").as("first_doc"),
        max($"doc_id").cast("bigint").as("last_doc"))
      .orderBy($"lang", $"bucket", $"seq_id")
  }
  private def t47(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(TextFunctions.tokens($"text")).cast("bigint").as("n_tokens"))
    sequencePack(docs, bucketSize = 100L, budget = 512.0)
  }
  private val t47Sql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(FLOOR(doc_id / 100) AS BIGINT) AS bucket,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, lang, bucket, n_tokens,
      |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id)
      |                - n_tokens) / 512.0) AS BIGINT) AS seq_id
      |  FROM d)
      |SELECT lang, bucket, seq_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |FROM p GROUP BY lang, bucket, seq_id ORDER BY lang, bucket, seq_id""".stripMargin

  // ---------------------------------------------------------------- t48
  /** TOKEN-BUDGET CORPUS CUT — the data-mixing primitive: cap each
    * source at a token budget, keeping documents in deterministic
    * doc_id order (a doc is kept iff the tokens BEFORE it within its
    * source fit the budget — reproducible regardless of partitioning).
    *
    * Scale shape: an EXACT per-source running sum without a per-source
    * serial window. Two passes, GlobalOrder-style: (1) one map-side-
    * combinable groupBy gives per-(source, bucket) token totals — a
    * TINY frame; a window over THAT frame yields each bucket's global
    * offset within its source; (2) the offsets broadcast-join back and
    * a window partitioned by (source, bucket) — embarrassingly
    * parallel — adds the local running sum. The corpus-wide pass never
    * serializes through #sources tasks. */
  private def t48(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val budget = 10240L
    val bucketSize = 100L
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        floor($"doc_id" / bucketSize).cast("bigint").as("bucket"),
        size(TextFunctions.tokens($"text")).cast("bigint").as("n_tokens"))
    // pass 1: per-bucket totals (tiny) -> global offset of each bucket
    val wOff = Window.partitionBy($"source").orderBy($"bucket")
    val offsets = docs.groupBy($"source", $"bucket")
      .agg(sum($"n_tokens").as("bt"))
      .withColumn("offset", sum($"bt").over(wOff) - $"bt")
      .select($"source", $"bucket", $"offset")
    // pass 2: local running sum + broadcast offset = exact global prefix
    val wLoc = Window.partitionBy($"source", $"bucket").orderBy($"doc_id")
    docs.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_before",
        $"offset" + sum($"n_tokens").over(wLoc) - $"n_tokens")
      .filter($"cum_before" < budget)
      .groupBy($"source")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum($"n_tokens").cast("bigint").as("kept_tokens"),
        min($"doc_id").cast("bigint").as("first_doc"),
        max($"doc_id").cast("bigint").as("last_doc"))
      .orderBy($"source")
  }
  private val t48Sql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
      |      - n_tokens AS cum_before
      |  FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |FROM p WHERE cum_before < 10240
      |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t49
  /** UNIGRAM CROSS-ENTROPY quality score (the CCNet / Wikipedia-LM
    * filtering signal): score each document by the mean negative
    * log-probability of its tokens under the corpus's OWN unigram
    * distribution — fluent, typical text scores low; gibberish,
    * boilerplate and OOV-heavy text scores high. The language-model
    * cousin of t32's heuristic quality score, and the standard
    * perplexity-bucket pre-filter before an expensive model-based one.
    *
    * Scale shape: one explode → one map-side-combinable keyed agg on
    * token (the vocab build) → one hash join tokens⋈vocab on the token
    * key (AQE broadcasts it when the vocab is small; at web scale it
    * stays a well-distributed shuffle join — token frequency skew is
    * bounded because the join key is the token, and even "the" hashes
    * to one partition only alongside its own occurrences) → one keyed
    * agg on doc_id. No window, no driver state, no corpus-wide sort.
    *
    * Determinism: each ln passes through DECIMAL(38,6) before the sum
    * ([[graft.ops.Num]]'s order-independence trick), so the score is
    * bit-stable across engines, partitionings and cluster sizes. */
  private def t49(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") > 0)
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum($"c").as("total"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select($"doc_id",
        log($"c").cast(dec).as("lnc"),
        log($"total".cast("double")).cast(dec).cast("double").as("lnt"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_tokens"),
        sum($"lnc").cast("double").as("sum_ln"),
        first($"lnt").as("lnt"))
      .select($"doc_id", $"n_tokens",
        ($"lnt" - $"sum_ln" / $"n_tokens".cast("double")).as("xent"))
      .orderBy($"doc_id")
  }
  private val t49Sql =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
      |tok AS (SELECT doc_id, tok FROM toks WHERE LENGTH(tok) > 0),
      |vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1),
      |tot AS (SELECT SUM(c) AS total FROM vocab),
      |s AS (
      |  SELECT doc_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |    CAST(SUM(CAST(LN(c) AS DECIMAL(38,6))) AS DOUBLE) AS sum_ln
      |  FROM tok JOIN vocab USING (tok) GROUP BY 1)
      |SELECT doc_id, n_tokens,
      |  CAST(CAST(LN(CAST(total AS DOUBLE)) AS DECIMAL(38,6)) AS DOUBLE)
      |    - sum_ln / CAST(n_tokens AS DOUBLE) AS xent
      |FROM s, tot ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t50
  /** SHUFFLED SEQUENCE PACKING — t47's packing composed with the
    * DETERMINISTIC CORPUS SHUFFLE every pretraining run does first:
    * training order must be random with respect to crawl/source order
    * (adjacent documents are correlated), yet reproducible across
    * reruns and engines. The shuffle key is md5(doc_id) — a
    * deterministic permutation, no RNG — and its first two hex digits
    * double as the pack bucket, so randomization and parallelism come
    * from the SAME hash: 256 buckets per language, each packing its
    * hash-ordered slice independently. Contrast t47, which packs in
    * doc_id (i.e. crawl) order with an arbitrary range bucket.
    *
    * Scale shape: one hash projection, one keyed window per
    * (lang, bucket) — parallelism scales with the bucket count, the
    * corpus never funnels through a serial cumsum. */
  private def t50(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val budget = 512.0
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(TextFunctions.tokens($"text")).cast("bigint").as("n_tokens"),
        md5($"doc_id".cast("string")).as("h"))
      .withColumn("bucket", substring($"h", 1, 2))
    val w = Window.partitionBy($"lang", $"bucket").orderBy($"h", $"doc_id")
    docs
      .withColumn("cum_before", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("seq_id", floor($"cum_before" / budget).cast("bigint"))
      .groupBy($"lang", $"bucket", $"seq_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum($"n_tokens").cast("bigint").as("n_tokens"),
        min($"doc_id").cast("bigint").as("min_doc"),
        max($"doc_id").cast("bigint").as("max_doc"))
      .orderBy($"lang", $"bucket", $"seq_id")
  }
  private val t50Sql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    MD5(CAST(doc_id AS VARCHAR)) AS h,
      |    SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, lang, bucket, n_tokens,
      |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY h, doc_id)
      |                - n_tokens) / 512.0) AS BIGINT) AS seq_id
      |  FROM d)
      |SELECT lang, bucket, seq_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_doc
      |FROM p GROUP BY lang, bucket, seq_id
      |ORDER BY lang, bucket, seq_id""".stripMargin

  // ---------------------------------------------------------------- t51
  /** DOMAIN-MIXING WEIGHTS — temperature sampling over corpus sources
    * (the mT5/XLM-R recipe, τ = 2): sampling share p_i ∝ sqrt(n_i/N),
    * so under-represented domains up-weight without letting a huge
    * domain drown the mixture. Per-row weight = p_i / natural share,
    * i.e. the resampling factor a data loader applies per source.
    * Scale shape: one map-side-combinable groupBy(source) collapses
    * the corpus to #sources rows; the two global reductions (total
    * tokens, sqrt-share normalizer) broadcast back — no second pass
    * over the data, no window over the corpus. The intermediate sqrt
    * share is pinned through DECIMAL(38,6) so the normalizer sum is
    * order-independent and bit-stable across engines. */
  private def t51(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val per = Tables.documents(spark, dir)
      .select($"source",
        size(TextFunctions.tokens($"text")).cast("bigint").as("t"))
      .groupBy($"source")
      .agg(sum($"t").cast("bigint").as("n_tokens"))
    val tot = per.agg(sum($"n_tokens").cast("bigint").as("total"))
    val shared = per.crossJoin(broadcast(tot))
      .withColumn("nat_share",
        $"n_tokens".cast("double") / $"total".cast("double"))
      .withColumn("s", sqrt($"nat_share").cast(dec).cast("double"))
    val norm = shared.agg(sum($"s".cast(dec)).cast("double").as("norm"))
    shared.crossJoin(broadcast(norm))
      .select(
        $"source", $"n_tokens",
        $"nat_share",
        ($"s" / $"norm").as("samp_share"),
        (($"s" / $"norm") / $"nat_share").as("weight"))
      .orderBy($"source")
  }
  private val t51Sql =
    """WITH per AS (
      |  SELECT source,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per),
      |sh AS (
      |  SELECT source, n_tokens,
      |    CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS nat_share,
      |    CAST(CAST(SQRT(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE))
      |      AS DECIMAL(38,6)) AS DOUBLE) AS s
      |  FROM per, tot),
      |nm AS (SELECT CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS norm
      |       FROM sh)
      |SELECT source, n_tokens, nat_share,
      |  s / norm AS samp_share,
      |  (s / norm) / nat_share AS weight
      |FROM sh, nm ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t52
  /** GROUP-AWARE train/eval split — the leakage-safe form of a37's
    * row-hash split: the split unit is the SOURCE, not the document.
    * Near-duplicates cluster within a source (mirrors, templates,
    * boilerplate), so hashing per document leaks eval n-grams into
    * train through a sibling copy; hashing the group key puts every
    * document of a source on one side by construction. Portable split:
    * first hex digit of md5(source) (the cross-engine-stable hash a37
    * established), 12/16 → train. Scale shape: the decision is a pure
    * projection — the group key is already ON the row, so group-aware
    * costs no join and no shuffle beyond the reporting aggregate. */
  private def t52(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val split = when(
      instr(lit("0123456789abcdef"),
        substring(md5($"source"), 1, 1)) <= 12, "train")
      .otherwise("eval")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source")
      .withColumn("split", split)
      .groupBy($"split")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        countDistinct($"source").cast("bigint").as("n_sources"),
        sum($"doc_id").cast("bigint").as("id_sum"))
      .orderBy($"split")
  }
  private val t52Sql =
    """SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM (
      |  SELECT doc_id, source,
      |    CASE WHEN STRPOS('0123456789abcdef', SUBSTR(MD5(source), 1, 1)) <= 12
      |         THEN 'train' ELSE 'eval' END AS split
      |  FROM documents) t
      |GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- t53
  /** MIXTURE MATERIALIZATION — turn t51's τ=2 temperature shares into
    * an actual sampled corpus, deterministically. The largest total T
    * the corpus can realize without over-drawing any source is
    * T = min_s(docs_s / p_s); each source then contributes its
    * floor(T · p_s) docs with the SMALLEST md5(doc_id) — hash-ranked
    * selection, so the sample is pseudorandom yet bit-reproducible
    * across engines and runs, and re-materializing with a grown
    * corpus keeps prior picks stable modulo quota growth.
    *
    * Scale shape: the quota math collapses the corpus to #sources rows
    * (map-side-combinable agg) and broadcasts back; selection is ONE
    * window shuffle keyed on source. A pathologically large source
    * making its window partition hot would swap exact ranking for a
    * two-pass hash-threshold selection (estimate the m-th smallest
    * hash, filter, exact-rank only the boundary sliver); shares pin
    * through DECIMAL(38,6) so quotas are order-independent. */
  private def t53(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(TextFunctions.tokens($"text")).cast("bigint").as("t"))
    val per = docs.groupBy($"source").agg(
      count(lit(1)).cast("bigint").as("c"),
      sum($"t").cast("bigint").as("n_tokens"))
    val tot = per.agg(sum($"n_tokens").cast("bigint").as("total"))
    val shared = per.crossJoin(broadcast(tot))
      .withColumn("s",
        sqrt($"n_tokens".cast("double") / $"total".cast("double"))
          .cast(dec).cast("double"))
    val norm = shared.agg(sum($"s".cast(dec)).cast("double").as("norm"))
    val quota = shared.crossJoin(broadcast(norm))
      .withColumn("p", $"s" / $"norm")
      .withColumn("cap", $"c".cast("double") / $"p")
    val tMin = quota.agg(min($"cap").as("tmin"))
    val quotas = quota.crossJoin(broadcast(tMin))
      .select($"source", $"c",
        floor($"p" * $"tmin").cast("bigint").as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    docs.join(broadcast(quotas), Seq("source"))
      .withColumn("rk", row_number().over(w))
      .groupBy($"source")
      .agg(
        max($"c").cast("bigint").as("n_docs"),
        sum(when($"rk" <= $"m", 1L).otherwise(0L)).cast("bigint")
          .as("n_sampled"),
        sum(when($"rk" <= $"m", $"doc_id")).cast("bigint").as("id_sum"))
      .orderBy($"source")
  }
  private val t53Sql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t
      |  FROM documents),
      |per AS (
      |  SELECT source, COUNT(*) AS c,
      |    CAST(SUM(t) AS BIGINT) AS n_tokens FROM d GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per),
      |sh AS (
      |  SELECT source, c,
      |    CAST(CAST(SQRT(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE))
      |      AS DECIMAL(38,6)) AS DOUBLE) AS s
      |  FROM per, tot),
      |nm AS (SELECT CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS norm
      |       FROM sh),
      |q AS (
      |  SELECT source, c, s / norm AS p,
      |    CAST(c AS DOUBLE) / (s / norm) AS cap
      |  FROM sh, nm),
      |tm AS (SELECT MIN(cap) AS tmin FROM q),
      |quotas AS (
      |  SELECT source, c, CAST(FLOOR(p * tmin) AS BIGINT) AS m FROM q, tm),
      |rk AS (
      |  SELECT d.doc_id, d.source, q.c, q.m,
      |    ROW_NUMBER() OVER (PARTITION BY d.source
      |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
      |  FROM d JOIN quotas q ON q.source = d.source)
      |SELECT source,
      |  CAST(MAX(c) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN rk <= m THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN rk <= m THEN doc_id END) AS BIGINT) AS id_sum
      |FROM rk GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t54
  /** BPE pair-merge TRAINER — the iterative argmax merge loop of
    * Sennrich et al. 2016 ("Neural Machine Translation of Rare Words
    * with Subword Units", public algorithm), distributed: t39 TOKENIZES
    * against a fixed merge table; this TRAINS one from the corpus.
    *
    * Scale shape: the working set collapses to the VOCABULARY in one
    * corpus pass (distinct lowercase words + frequencies — bounded by
    * language, not corpus bytes; at 100 TB it persists as a table and
    * every round below is O(vocab), never O(corpus)). Each merge round
    * is one keyed partial aggregation over adjacent symbol pairs
    * (map-side combinable, weighted by word count) + a 1-row argmax to
    * the driver (count DESC, then lexicographic pair — bit-stable),
    * then one codegen'd `aggregate` fold re-pairing every word
    * left-to-right non-overlapping. localCheckpoint per round keeps the
    * plan from nesting N folds deep.
    *
    * ORACLE: the training loop has no recursive-CTE spelling (the
    * per-round argmax aggregates over the working state, which
    * recursive terms forbid), but the merge count is a FIXED constant
    * — so the oracle UNROLLS it: one generated CTE block per rank
    * (pair-count aggregate → 1-row argmax → greedy re-pair), see
    * [[bpeOracleCtes]]. BpeTrainSpec's in-JVM reference property check
    * over random collision-heavy corpora carries the
    * arbitrary-merge-count case. */
  private[graft] def bpeTrain(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select(split($"w", "").as("syms"), $"cnt")
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val top = words
        .where(size($"syms") >= 2)
        .select($"cnt", explode(expr(
          """transform(sequence(1, size(syms) - 1),
            | i -> struct(element_at(syms, i) AS l,
            |             element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"cnt").as("c"))
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val m = l + rr
        out += ((r + 1, l, rr, m, c))
        words = words.select(rePair(l, rr, m), $"cnt").localCheckpoint()
        r += 1
      }
    }
    out.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
      .select($"rank".cast("int").as("rank"), $"left", $"right", $"merged",
        $"pair_count".cast("bigint").as("pair_count"))
      .orderBy($"rank")
  }

  /** One merge's GREEDY left-to-right non-overlapping re-pair over a
    * `syms` array column — a codegen'd fold (symbols are [a-z]+ only,
    * so the literals need no escaping). Shared by the trainer's round
    * step and [[bpeApply]]. */
  private def rePair(l: String, r: String,
                     m: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(syms,
         |  struct(CAST(array() AS array<string>) AS out,
         |         CAST(NULL AS string) AS carry),
         |  (acc, c) -> CASE
         |    WHEN acc.carry = '$l' AND c = '$r'
         |      THEN struct(array_append(acc.out, '$m') AS out,
         |                  CAST(NULL AS string) AS carry)
         |    WHEN acc.carry IS NULL
         |      THEN struct(acc.out AS out, c AS carry)
         |    ELSE struct(array_append(acc.out, acc.carry) AS out,
         |                c AS carry) END,
         |  acc -> CASE WHEN acc.carry IS NULL THEN acc.out
         |         ELSE array_append(acc.out, acc.carry) END)""".stripMargin)
      .as("syms")

  private def bpeRounds = 24
  private def t54(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(Tables.documents(spark, dir), merges = bpeRounds)

  /** APPLY a trained merge table to `docs`: per distinct vocabulary
    * word, fold the merges in rank order (the same greedy left-to-right
    * non-overlapping re-pair the trainer uses), then join the per-word
    * subword count back onto the corpus — application work is O(vocab ×
    * merges), never O(corpus × merges), and the final join broadcasts
    * the vocabulary. Returns (doc_id, n_words, n_subwords); documents
    * with no [a-z]+ word contribute no row (both engines explode). */
  private[graft] def bpeApply(docs: DataFrame,
                              merges: Seq[(String, String, String)])
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
    var vocab = words.distinct()
      .select($"w", split($"w", "").as("syms")).localCheckpoint()
    merges.foreach { case (l, r, m) =>
      vocab = vocab.select($"w", rePair(l, r, m)).localCheckpoint()
    }
    val nsub = vocab.select($"w", size($"syms").cast("bigint").as("nsub"))
    docs.select($"doc_id", explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .join(nsub, Seq("w"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_words"),
        sum($"nsub").cast("bigint").as("n_subwords"))
      .orderBy($"doc_id")
  }

  // ------------------------------------------------------------- t54b
  /** Trainer output feeding an ORACLED consumer: re-tokenize the corpus
    * with the merge table t54 just trained, per-doc word and subword
    * counts. End-to-end checkable in DuckDB because the oracle derives
    * the SAME merge table via the unrolled training CTEs and applies it
    * to the same vocabulary — a wrong trained merge (rank, pair, or
    * tie-break) shifts subword counts and hash-mismatches. */
  private def t54b(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = bpeTrain(docs, merges = bpeRounds).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    bpeApply(docs, merges)
  }

  /** The UNROLLED training rounds as a DuckDB CTE chain, shared by the
    * t54 and t54b oracles. Per rank k (from the round-(k-1) vocabulary
    * `v(k-1)`):
    *
    *   - `u{k}`: every (word, position) of the current symbol arrays;
    *   - `m{k}`: the argmax adjacent pair, weighted by word frequency
    *     (ORDER BY c DESC, l, r LIMIT 1 — the trainer's tie-break);
    *   - `s{k}`: the GREEDY non-overlapping match positions, via
    *     gaps-and-islands parity: valid positions (syms[i]=l ∧
    *     syms[i+1]=r) within a run of consecutive i take odd ranks —
    *     exactly the left-to-right scan, because selecting p removes
    *     p+1 from candidacy and a merged symbol (l||r ≠ l, ≠ r) can
    *     never re-match the same pair mid-pass;
    *   - `v{k}`: the re-paired vocabulary — selected positions emit the
    *     merged symbol, positions following a selected one drop. The
    *     UNION ALL leg carries v(k-1) verbatim when m{k} is EMPTY
    *     (pair exhaustion on degenerate corpora), mirroring the
    *     trainer's early stop.
    *
    * MATERIALIZED is load-bearing: every CTE here is referenced more
    * than once, and DuckDB inlines plain CTEs per reference — 24
    * rounds would nest exponentially (and re-open the parquet per
    * inline). */
  private def bpeOracleCtes(rounds: Int): String = {
    val b = new StringBuilder
    b ++= """v0 AS MATERIALIZED (
      |  SELECT w, string_split(w, '') AS syms, cnt FROM (
      |    SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |      FROM documents) uw GROUP BY w) vc)""".stripMargin
    (1 to rounds).foreach { k =>
      b ++= s""",
        |u$k AS MATERIALIZED (
        |  SELECT w, syms, cnt, unnest(range(1, len(syms) + 1)) AS i
        |  FROM v${k - 1}),
        |m$k AS MATERIALIZED (
        |  SELECT l, r, l || r AS m, c FROM (
        |    SELECT u.syms[u.i] AS l, u.syms[u.i + 1] AS r,
        |      CAST(SUM(u.cnt) AS BIGINT) AS c
        |    FROM u$k u WHERE u.i < len(u.syms) GROUP BY 1, 2) pc
        |  ORDER BY c DESC, l, r LIMIT 1),
        |s$k AS MATERIALIZED (
        |  SELECT w, i FROM (
        |    SELECT w, i,
        |      ROW_NUMBER() OVER (PARTITION BY w, i - rn ORDER BY i) AS q
        |    FROM (SELECT u.w, u.i,
        |            ROW_NUMBER() OVER (PARTITION BY u.w ORDER BY u.i) AS rn
        |          FROM u$k u, m$k m
        |          WHERE u.i < len(u.syms) AND u.syms[u.i] = m.l
        |            AND u.syms[u.i + 1] = m.r) t1) t2
        |  WHERE q % 2 = 1),
        |v$k AS MATERIALIZED (
        |  SELECT u.w,
        |    list(CASE WHEN s.i IS NOT NULL THEN m.m
        |         ELSE u.syms[u.i] END ORDER BY u.i) AS syms,
        |    u.cnt AS cnt
        |  FROM u$k u CROSS JOIN m$k m
        |  LEFT JOIN s$k s ON s.w = u.w AND s.i = u.i
        |  LEFT JOIN s$k s2 ON s2.w = u.w AND s2.i = u.i - 1
        |  WHERE s2.w IS NULL
        |  GROUP BY u.w, u.cnt
        |  UNION ALL
        |  SELECT w, syms, cnt FROM v${k - 1}
        |  WHERE NOT EXISTS (SELECT 1 FROM m$k))""".stripMargin
    }
    b.result()
  }

  // def, not val: defined after `all` in initialization order
  private def t54Sql = {
    val ranks = (1 to bpeRounds).map(k =>
      s"""SELECT CAST($k AS INT) AS rank, l AS "left", r AS "right",
         |  m AS merged, c AS pair_count FROM m$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeOracleCtes(bpeRounds)}\n" +
      s"SELECT * FROM (\n$ranks) am ORDER BY rank"
  }

  // def, not val: defined after `all` in initialization order
  private def t54bSql =
    s"""WITH ${bpeOracleCtes(bpeRounds)},
       |fin AS (SELECT w, len(syms) AS nsub FROM v$bpeRounds),
       |docw AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents)
       |SELECT d.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.nsub) AS BIGINT) AS n_subwords
       |FROM docw d JOIN fin f USING (w)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- t55
  /** BM25 RANKED RETRIEVAL (Okapi, k1=1.2 b=0.75) for a fixed 3-term
    * query — the lexical scorer behind every classic search stack and
    * the lexical leg of hybrid retrieval (e62). Differs from t43's
    * tf-idf in both saturation (tf's contribution is bounded by k1+1)
    * and length normalization (long documents are penalized toward the
    * corpus mean length).
    *
    * Scale shape: one explode → keyed agg for document lengths; the
    * query terms broadcast into tf and df (both aggs see ONLY posting
    * rows of the 3 terms, not the corpus vocabulary); a 2-row global
    * aggregate broadcasts into the per-term idf; final ranking is
    * TakeOrderedAndProject (per-partition partial top-k, no global
    * sort, no corpus-wide window).
    *
    * Determinism: idf's ln and each per-term contribution pass through
    * DECIMAL(38,6) before the per-document sum (t49's order-
    * independence trick), so scores are bit-stable across engines and
    * partitionings; ties rank by doc_id. */
  private val bm25Terms = Seq("window", "merge", "stream")
  private def t55(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") > 0)
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val glob = dl.agg(count(lit(1)).as("n"), sum($"dl").as("sumdl"))
    val terms = bm25Terms.toDF("tok")
    val posting = toks.join(broadcast(terms), "tok")
    val dfreq = posting.select($"tok", $"doc_id").distinct()
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val tf = posting.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val idf = dfreq.crossJoin(broadcast(glob))
      .select($"tok",
        log(lit(1.0) +
            (($"n".cast("double") - $"df".cast("double") + lit(0.5)) /
              ($"df".cast("double") + lit(0.5))))
          .cast(dec).cast("double").as("idf"),
        ($"sumdl".cast("double") / $"n".cast("double")).as("avgdl"))
    val perTerm = tf.join(dl, "doc_id").join(broadcast(idf), "tok")
      .select($"doc_id",
        ($"idf" * ($"tf".cast("double") * lit(2.2)) /
          ($"tf".cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * ($"dl".cast("double") / $"avgdl"))))
          .cast(dec).as("contrib"))
    val top = perTerm.groupBy($"doc_id")
      .agg(sum($"contrib").cast("double").as("score"))
      .orderBy($"score".desc, $"doc_id").limit(20)
    top.withColumn("rn",
        row_number().over(Window.orderBy($"score".desc, $"doc_id"))
          .cast("bigint"))
      .orderBy($"rn")
  }
  private val t55Sql =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
      |tok AS (SELECT doc_id, tok FROM toks WHERE LENGTH(tok) > 0),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
      |corp AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
      |q AS (SELECT UNNEST(['window', 'merge', 'stream']) AS tok),
      |posting AS (SELECT doc_id, tok FROM tok JOIN q USING (tok)),
      |dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM posting GROUP BY 1),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM posting GROUP BY 1, 2),
      |idf AS (
      |  SELECT tok,
      |    CAST(CAST(LN(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |      / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(38,6)) AS DOUBLE) AS idf,
      |    CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl
      |  FROM dfreq, corp),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(idf * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
      |      AS DECIMAL(38,6))) AS DOUBLE) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN idf USING (tok) GROUP BY doc_id),
      |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
      |SELECT doc_id, score,
      |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn
      |FROM top ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- t56
  /** INCREMENTAL BM25 INDEX MAINTENANCE — t55's scorer served from a
    * PERSISTED inverted index maintained across batch arrivals, the
    * lexical twin of the d47/e59 incremental family:
    *
    *   - postings table (term, doc_id, tf), bucket(16, term) with term
    *     stats + blooms: each batch appends ITS postings (docs never
    *     straddle batches, so per-(doc,term) tf is complete per batch
    *     and appends compose) — batch-sized work, never a corpus
    *     rebuild;
    *   - doc-length table (doc_id, dl) appends alongside;
    *   - serving probes the index with the query terms through
    *     probePersisted (broadcast batch keys, literal-key file
    *     pruning REQUIREd — a 3-term query reads only the buckets and
    *     bloom-positive files that can hold those terms); df IS the
    *     probed posting count per term, N/avgdl come from the
    *     doc-length table; scoring is t55's decimal-stabilized
    *     formula, ranking TakeOrdered;
    *   - OPTIMIZE equivalence: after `compactSmall` (layout-preserving
    *     bin-pack of the append-churned index), the SAME query
    *     REQUIREs the identical top-20 from no-more files — index
    *     maintenance compacts without a correctness or layout cost.
    *
    * The oracle is the one-shot rule over the whole corpus: batch
    * boundaries cannot show through because tf/dl/df are per-doc and
    * per-term SUMS of disjoint batch contributions. */
  private val bm25IncTerms = Seq("join", "filter", "sort")

  /** Serve t55's decimal-stabilized BM25 top-20 from PERSISTED
    * postings + doc-length tables: [[graft.dedup.DedupOps
    * .probePersisted]] over the query terms (literal-key file-pruning
    * counts returned for the caller's REQUIREs), df from the probed
    * postings, N/avgdl from the doc-length table — all of which read
    * through MoR masks, so deletions and staged-but-unpublished
    * batches never show. Shared by t56/t57/t58 and s74. */
  private[graft] def bm25Probe(spark: SparkSession, postings: String,
      dlT: String, terms: Seq[String], cat: String)
      : (Seq[org.apache.spark.sql.Row], Int, Int) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val (hits, (scanned, total)) = graft.dedup.DedupOps.probePersisted(
      spark, postings, terms.toDF("term").localCheckpoint(),
      joinCols = Seq("term"), out = Seq("term", "doc_id", "tf"),
      keyCol = "term", cat = cat, scanPayload = Seq("doc_id", "tf"))
    val dl = spark.read.format("graft").load(dlT)
    val glob = dl.agg(count(lit(1)).as("n"), sum($"dl").as("sumdl"))
    val dfreq = hits.groupBy($"term").agg(count(lit(1)).as("df"))
    val idf = dfreq.crossJoin(broadcast(glob))
      .select($"term",
        log(lit(1.0) +
            (($"n".cast("double") - $"df".cast("double") + lit(0.5)) /
              ($"df".cast("double") + lit(0.5))))
          .cast(dec).cast("double").as("idf"),
        ($"sumdl".cast("double") / $"n".cast("double")).as("avgdl"))
    val top = hits.join(dl, "doc_id").join(broadcast(idf), "term")
      .select($"doc_id",
        ($"idf" * ($"tf".cast("double") * lit(2.2)) /
          ($"tf".cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * ($"dl".cast("double") / $"avgdl"))))
          .cast(dec).as("contrib"))
      .groupBy($"doc_id")
      .agg(sum($"contrib").cast("double").as("score"))
      .orderBy($"score".desc, $"doc_id").limit(20)
    val out = top.withColumn("rn",
        row_number().over(Window.orderBy($"score".desc, $"doc_id"))
          .cast("bigint"))
      .orderBy($"rn").collect().toSeq
    (out, scanned, total)
  }
  /** e62's cheap lexical retrieval leg served from a PERSISTED
    * postings table: probe the query terms (literal-key pruning counts
    * returned for the caller's REQUIREs) and rank by Σtf — e62's
    * occurrence count — with doc-id tie-breaks. Returns a LAZY
    * (id, rl) frame ready for RRF fusion. Shared by e64/p92. */
  private[graft] def lexCountRank(spark: SparkSession, postings: String,
      terms: Seq[String], cat: String): (DataFrame, (Int, Int)) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (hits, counts) = graft.dedup.DedupOps.probePersisted(
      spark, postings, terms.toDF("term").localCheckpoint(),
      joinCols = Seq("term"), out = Seq("doc_id", "tf"),
      keyCol = "term", cat = cat, scanPayload = Seq("doc_id", "tf"))
    val ranked = hits.groupBy($"doc_id").agg(sum($"tf").as("cnt"))
      .orderBy($"cnt".desc, $"doc_id").limit(20)
      .withColumn("rl",
        row_number().over(Window.orderBy($"cnt".desc, $"doc_id"))
          .cast("bigint"))
      .select($"doc_id".as("id"), $"rl")
    (ranked, counts)
  }

  private[graft] val bm25Schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("rn",
      org.apache.spark.sql.types.LongType)))

  private def t56(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_t56_inc").toFile.getAbsolutePath
    try {
      val postings = s"$zone/postings_txn"
      val dlT = s"$zone/dl_txn"
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val maxId = docs.agg(max($"doc_id")).head().getLong(0)
      val cut = maxId / 2L
      val cut2 = math.max(cut + 1L, maxId - 5L)
      def ingest(batch: DataFrame, first: Boolean): Unit = {
        val toks = batch
          .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
          .filter(length($"term") > 0).localCheckpoint()
        val pw = toks.groupBy($"term", $"doc_id")
          .agg(count(lit(1)).as("tf"))
          .write.format("graft")
          .option("statsCols", "term").option("bloomCols", "term")
          .option("optimizedWrite", "true")
        (if (first) pw.option("partitionBy", "bucket(16, term)")
            .mode("overwrite")
         else pw.mode("append")).save(postings)
        toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
          .write.format("graft").option("statsCols", "doc_id")
          .mode(if (first) "overwrite" else "append").save(dlT)
      }
      ingest(docs.filter($"doc_id" <= cut), first = true)
      ingest(docs.filter($"doc_id" > cut && $"doc_id" <= cut2),
        first = false)
      ingest(docs.filter($"doc_id" > cut2), first = false)
      def serve(): (Seq[org.apache.spark.sql.Row], Int, Int) =
        bm25Probe(spark, postings, dlT, bm25IncTerms, cat = "gt56spj")
      val (r1, s1, t1) = serve()
      require(s1 < t1,
        s"a 3-term probe must prune the bucketed index: read $s1 of $t1")
      // OPTIMIZE the append-churned index; the query must not notice
      TxnTable.compactSmall(spark, postings, smallBytes = 1L << 40)
      val (r2, s2, t2) = serve()
      require(r1 == r2,
        "compaction changed the query result — the index is corrupt")
      require(t2 <= t1,
        s"compaction must not grow the index file count ($t1 -> $t2)")
      spark.createDataFrame(
        java.util.Arrays.asList(r2: _*), bm25Schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  private val t56Sql =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
      |tok AS (SELECT doc_id, tok FROM toks WHERE LENGTH(tok) > 0),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
      |corp AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
      |q AS (SELECT UNNEST(['join', 'filter', 'sort']) AS tok),
      |posting AS (SELECT doc_id, tok FROM tok JOIN q USING (tok)),
      |dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM posting GROUP BY 1),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM posting GROUP BY 1, 2),
      |idf AS (
      |  SELECT tok,
      |    CAST(CAST(LN(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |      / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(38,6)) AS DOUBLE) AS idf,
      |    CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl
      |  FROM dfreq, corp),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(idf * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
      |      AS DECIMAL(38,6))) AS DOUBLE) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN idf USING (tok) GROUP BY doc_id),
      |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
      |SELECT doc_id, score,
      |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn
      |FROM top ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- t57
  /** BM25 INDEX UNDER DELETIONS — t56's maintained inverted index
    * composed with merge-on-read deletion vectors: the right-to-be-
    * forgotten path for a LEXICAL index (e63's move applied to the
    * postings store). A document slice (every 7th doc_id — the "erase
    * these users" batch) deletes POSITIONALLY from BOTH index tables:
    * the postings rows (term, doc_id, tf) and the doc-length rows
    * (doc_id, dl) each land as a coordinate sidecar with ZERO data-
    * file rewrites (REQUIREd — at 100 TB re-building an inverted
    * index per erasure request is a non-starter). Serving then runs
    * t56's probe plan UNCHANGED: the subtraction happens INSIDE the
    * scans, so dead doc_ids cannot surface in the top-k, df counts
    * only surviving postings, and N/avgdl aggregate only surviving
    * doc lengths — no query-side filter has to remember what was
    * erased. The oracle recomputes one-shot BM25 over the SURVIVING
    * corpus in DuckDB. */
  private def t57(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    import org.apache.spark.sql.expressions.Window
    val zone = java.nio.file.Files
      .createTempDirectory("graft_t57_del").toFile.getAbsolutePath
    try {
      val postings = s"$zone/postings_txn"
      val dlT = s"$zone/dl_txn"
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val cut = docs.agg(max($"doc_id")).head().getLong(0) / 2L
      def ingest(batch: DataFrame, first: Boolean): Unit = {
        val toks = batch
          .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
          .filter(length($"term") > 0).localCheckpoint()
        val pw = toks.groupBy($"term", $"doc_id")
          .agg(count(lit(1)).as("tf"))
          .write.format("graft")
          .option("statsCols", "term").option("bloomCols", "term")
          .option("optimizedWrite", "true")
        (if (first) pw.option("partitionBy", "bucket(16, term)")
            .option("mergeOnRead", "true").mode("overwrite")
         else pw.mode("append")).save(postings)
        val dw = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
          .write.format("graft").option("statsCols", "doc_id")
        (if (first) dw.option("mergeOnRead", "true").mode("overwrite")
         else dw.mode("append")).save(dlT)
      }
      ingest(docs.filter($"doc_id" <= cut), first = true)
      ingest(docs.filter($"doc_id" > cut), first = false)
      // the erasure batch, positional in BOTH tables: one coordinate
      // sidecar each, zero postings/doc-length file rewrites
      val beforeP = TxnTable.snapshotFiles(spark, postings,
        TxnTable.latestVersion(spark, postings).get).toSet
      TxnTable.deleteWherePos(spark, postings,
        s => s("doc_id") % 7 === 0)
      TxnTable.deleteWherePos(spark, dlT, s => s("doc_id") % 7 === 0)
      val afterP = TxnTable.morState(spark, postings,
        TxnTable.latestVersion(spark, postings).get)
      require(beforeP.subsetOf(afterP.files.toSet),
        "doc erasure must be a deletion vector, never an index rewrite")
      require(afterP.dels.exists(_.keyCols == TxnTable.PosDelKeyCols),
        "the erasure must have landed as a positional vector")
      // t56's serving plan, byte-identical — the masks do the work
      val (rows, scanned, total) =
        bm25Probe(spark, postings, dlT, bm25Terms, cat = "gt57spj")
      require(scanned < total,
        s"a 3-term probe must prune the bucketed index: $scanned/$total")
      require(rows.forall(_.getLong(0) % 7L != 0L),
        "an erased document surfaced in the served top-k")
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), bm25Schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  private val t57Sql =
    """WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
      |toks AS (
      |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM corp),
      |tok AS (SELECT doc_id, tok FROM toks WHERE LENGTH(tok) > 0),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
      |ctot AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
      |q AS (SELECT UNNEST(['window', 'merge', 'stream']) AS tok),
      |posting AS (SELECT doc_id, tok FROM tok JOIN q USING (tok)),
      |dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM posting GROUP BY 1),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM posting GROUP BY 1, 2),
      |idf AS (
      |  SELECT tok,
      |    CAST(CAST(LN(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |      / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(38,6)) AS DOUBLE) AS idf,
      |    CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl
      |  FROM dfreq, ctot),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(idf * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
      |      AS DECIMAL(38,6))) AS DOUBLE) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN idf USING (tok) GROUP BY doc_id),
      |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
      |SELECT doc_id, score,
      |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn
      |FROM top ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- t58
  /** BM25 INDEX × WRITE-AUDIT-PUBLISH — the maintained lexical index
    * (t56) composed with staged ingest (k164/k166): a holdback batch's
    * postings and doc-length rows are STAGED on their index tables,
    * and the SAME serving plan is run in both phases:
    *
    *   - phase 'staged': the staged batch is invisible — the served
    *     top-20 equals BM25 over the corpus WITHOUT the holdback
    *     (df/N/avgdl included; a leaked posting or doc-length row
    *     would shift scores and hash-mismatch);
    *   - phase 'published': one atomic promotion per table, and the
    *     identical query now equals full-corpus BM25.
    *
    * This is the index-maintenance audit story: a suspect crawl batch
    * can be indexed, audited against the WOULD-BE index state, and
    * only then exposed to every search — or aborted leaving the index
    * byte-identical. The oracle restates both phases closed-form. */
  private val bm25WapTerms = Seq("group", "window", "join")
  private def t58(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_t58_wap").toFile.getAbsolutePath
    try {
      val postings = s"$zone/postings_txn"
      val dlT = s"$zone/dl_txn"
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val maxId = docs.agg(max($"doc_id")).head().getLong(0)
      val cut = maxId / 2L
      val hold = maxId - maxId / 10L // the suspect crawl batch
      def postingsOf(batch: DataFrame): (DataFrame, DataFrame) = {
        val toks = batch
          .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
          .filter(length($"term") > 0).localCheckpoint()
        (toks.groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf")),
          toks.groupBy($"doc_id").agg(count(lit(1)).as("dl")))
      }
      def ingest(batch: DataFrame, first: Boolean): Unit = {
        val (pf, df) = postingsOf(batch)
        val pw = pf.write.format("graft")
          .option("statsCols", "term").option("bloomCols", "term")
          .option("optimizedWrite", "true")
        (if (first) pw.option("partitionBy", "bucket(16, term)")
            .mode("overwrite")
         else pw.mode("append")).save(postings)
        df.write.format("graft").option("statsCols", "doc_id")
          .mode(if (first) "overwrite" else "append").save(dlT)
      }
      ingest(docs.filter($"doc_id" <= cut), first = true)
      ingest(docs.filter($"doc_id" > cut && $"doc_id" <= hold),
        first = false)
      // the holdback stages on BOTH index tables (k166's ergonomics)
      val (hp, hd) = postingsOf(docs.filter($"doc_id" > hold))
      hp.write.format("graft").option("stageId", "crawl-b0")
        .option("statsCols", "term").option("bloomCols", "term")
        .mode("append").save(postings)
      hd.write.format("graft").option("stageId", "crawl-b0")
        .option("statsCols", "doc_id").mode("append").save(dlT)
      def serve(phase: String): Seq[org.apache.spark.sql.Row] = {
        val (rows, scanned, total) = bm25Probe(spark, postings, dlT,
          bm25WapTerms, cat = s"gt58$phase")
        require(scanned < total,
          s"the $phase probe must prune the bucketed index: " +
            s"$scanned/$total")
        rows
      }
      val staged = serve("stg")
      require(staged.forall(_.getLong(0) <= hold),
        "a staged holdback doc surfaced in the served top-k")
      val vP = TxnTable.latestVersion(spark, postings).get
      TxnTable.publishStage(spark, postings, "crawl-b0")
      TxnTable.publishStage(spark, dlT, "crawl-b0")
      require(TxnTable.latestVersion(spark, postings).contains(vP + 1L),
        "the postings promotion must cost exactly one version")
      val published = serve("pub")
      val out = staged.map(r => ("staged", r.getLong(0), r.getDouble(1),
          r.getLong(2))) ++
        published.map(r => ("published", r.getLong(0), r.getDouble(1),
          r.getLong(2)))
      out.toDF("phase", "doc_id", "score", "rn")
        .orderBy($"phase", $"rn")
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  private val t58Sql = {
    def phase(name: String, pred: String) =
      s"""SELECT '$name' AS phase, doc_id, score, rn FROM (
         |WITH corp AS (SELECT doc_id, text FROM documents WHERE $pred),
         |toks AS (
         |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM corp),
         |tok AS (SELECT doc_id, tok FROM toks WHERE LENGTH(tok) > 0),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
         |ctot AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
         |q AS (SELECT UNNEST(['group', 'window', 'join']) AS tok),
         |posting AS (SELECT doc_id, tok FROM tok JOIN q USING (tok)),
         |dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM posting GROUP BY 1),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM posting GROUP BY 1, 2),
         |idf AS (
         |  SELECT tok,
         |    CAST(CAST(LN(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |      / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(38,6)) AS DOUBLE) AS idf,
         |    CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl
         |  FROM dfreq, ctot),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(idf * (CAST(tf AS DOUBLE) * 2.2)
         |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
         |      AS DECIMAL(38,6))) AS DOUBLE) AS score
         |  FROM tf JOIN dl USING (doc_id) JOIN idf USING (tok) GROUP BY doc_id),
         |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
         |SELECT doc_id, score,
         |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn
         |FROM top)""".stripMargin
    s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
       |ph AS (
       |${phase("staged",
          "doc_id <= (SELECT m - m // 10 FROM mx)")}
       |UNION ALL
       |${phase("published", "TRUE")})
       |SELECT phase, doc_id, score, rn FROM ph ORDER BY phase, rn""".stripMargin
  }

  val all: Seq[RQ] = Seq(
    RQ("t41_chunk_overlap", t41, Some(t41Sql)),
    RQ("t42_pii_redact", t42, Some(t42Sql)),
    RQ("t43_tfidf_topterms", t43, Some(t43Sql), bench = true),
    RQ("t44_repetition_signal", t44, Some(t44Sql)),
    RQ("t45_unicode_clean", t45, Some(t45Sql)),
    RQ("t46_edit_distance", t46, Some(t46Sql)),
    RQ("t47_sequence_pack", t47, Some(t47Sql)),
    RQ("t48_token_budget", t48, Some(t48Sql), bench = true),
    RQ("t49_unigram_logprob", t49, Some(t49Sql), bench = true),
    RQ("t50_shuffled_pack", t50, Some(t50Sql)),
    RQ("t51_domain_mix_weights", t51, Some(t51Sql)),
    RQ("t52_group_split", t52, Some(t52Sql)),
    RQ("t53_mixture_sample", t53, Some(t53Sql)),
    // oracled by UNROLLING the fixed-count training loop into one
    // generated CTE block per rank (see bpeOracleCtes) — plus t54b,
    // the trained-merges-feeding-an-oracled-consumer end-to-end check
    RQ("t54_bpe_train", t54, Some(t54Sql)),
    RQ("t54b_bpe_retokenize", t54b, Some(t54bSql)),
    RQ("t55_bm25_rank", t55, Some(t55Sql), bench = true),
    RQ("t56_incremental_bm25", t56, Some(t56Sql)),
    RQ("t57_bm25_under_deletions", t57, Some(t57Sql)),
    RQ("t58_bm25_wap_staged", t58, Some(t58Sql)))
}
