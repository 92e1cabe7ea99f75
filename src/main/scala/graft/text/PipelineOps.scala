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

  // ---------------------------------------------------------------- p92
  /** THE MAINTAINED-CORPUS LIFECYCLE, END TO END — the round's
    * lifecycle legs (incremental dedup, index maintenance, deletion
    * vectors, pruned-probe serving, hybrid fusion) chained the way a
    * real RAG/training corpus runs them, and oracled as ONE closed
    * form:
    *
    *   1. INGEST: two id-ranged batches (every 25th doc carries its
    *      predecessor's text — injected exact dups) flow through
    *      d47's incremental keep-first dedup: losers die by
    *      positional vector at their arrival;
    *   2. INDEX: the t56-shape postings table and the e59-shape
    *      cell-partitioned IVF table build over the DEDUPED corpus
    *      (the masked read is the input — a loser's postings never
    *      exist);
    *   3. FORGET: a right-to-be-forgotten batch (surviving ids
    *      % 70 = 0) erases from the corpus AND BOTH indexes as
    *      positional vectors (zero data-file rewrites REQUIREd);
    *   4. SERVE: hybrid RRF from the two maintained indexes (e64's
    *      probes, both literal-key-pruned, REQUIREd) — dead ids
    *      cannot surface (REQUIREd).
    *
    * The oracle replays the whole composition in DuckDB: the minhash
    * keep-first rule over the shifted corpus, minus the erasure, then
    * both retrieval legs and the fusion. A leaked loser posting, an
    * unmasked erased vector, or a fusion-order change all
    * hash-mismatch. The point of registering the composite: the
    * lifecycle legs proven one-by-one (d47, t56/t57, e59/e63, e64)
    * also compose — one pipeline, five maintained artifacts, no
    * rebuilds anywhere.
    *
    * Cross-table contract: transactions are PER-TABLE (the
    * Delta/Iceberg model), so the step-3 erasure is three independent
    * positional commits and a crash mid-takedown can leave an index
    * not yet erased. The remedy is the standard at-least-once janitor
    * rule: each leg is IDEMPOTENT (re-running the positional delete
    * over the masked read matches nothing), so the takedown driver
    * simply re-runs its whole batch until every table confirms —
    * never partial-order-sensitive, never a rebuild. */
  private def p92(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_p92_life").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/corpus_txn"
      val sigs = s"$zone/sigs_txn"
      val postings = s"$zone/postings_txn"
      val ivf = s"$zone/ivf_txn"
      val base = Tables.documents(spark, dir).select($"doc_id", $"text")
      val maxId = base.agg(max($"doc_id")).head().getLong(0)
      val cut = maxId / 2L
      val shifted = base.as("a")
        .join(base.as("b"), col("b.doc_id") === col("a.doc_id") - 1,
          "left")
        .select(col("a.doc_id").as("doc_id"),
          when(col("a.doc_id") % 25 === 0 && col("a.doc_id") > 0,
            coalesce(col("b.text"), col("a.text")))
            .otherwise(col("a.text")).as("text"))
        .localCheckpoint()
      graft.dedup.DedupOps.d47Ingest(spark, corpus, sigs,
        shifted.filter($"doc_id" <= cut), first = true,
        col("doc_id") >= 0L && col("doc_id") <= cut)
      graft.dedup.DedupOps.d47Ingest(spark, corpus, sigs,
        shifted.filter($"doc_id" > cut), first = false,
        col("doc_id") > cut && col("doc_id") <= maxId)
      val surv = spark.read.format("graft").load(corpus)
      val toks = surv
        .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
        .filter(length($"term") > 0).localCheckpoint()
      toks.groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
        .write.format("graft")
        .option("partitionBy", "bucket(16, term)")
        .option("statsCols", "term").option("bloomCols", "term")
        .option("optimizedWrite", "true").option("mergeOnRead", "true")
        .mode("overwrite").save(postings)
      val cents = graft.sim.SimilarityOps.centroids(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      emb.join(surv.select($"doc_id".as("vec_id")), Seq("vec_id"),
          "left_semi")
        .select($"vec_id", $"embedding",
          element_at(
            graft.sim.Similarity.nearestCells("embedding", cents, 1), 1)
            .cast("bigint").cast("string").as("cell"))
        .write.format("graft").option("statsCols", "vec_id")
        .option("partitionBy", "cell").option("mergeOnRead", "true")
        .mode("overwrite").save(ivf)
      // the right-to-be-forgotten batch as a FRAME, never a collected
      // isin literal list (the d50 rule): each leg is a semi-join →
      // positional delete, so a million-id takedown plans like this one
      val erase = surv.filter($"doc_id" % 70 === 0)
        .select($"doc_id").localCheckpoint()
      require(erase.limit(1).count() > 0,
        "the erasure batch must be non-empty")
      val beforeP = TxnTable.snapshotFiles(spark, postings,
        TxnTable.latestVersion(spark, postings).get).toSet
      val beforeV = TxnTable.snapshotFiles(spark, ivf,
        TxnTable.latestVersion(spark, ivf).get).toSet
      TxnTable.deleteFromPos(spark, corpus, erase, Seq("doc_id"))
      TxnTable.deleteFromPos(spark, postings, erase, Seq("doc_id"))
      TxnTable.deleteFromPos(spark, ivf,
        erase.select($"doc_id".as("vec_id")), Seq("vec_id"))
      require(beforeP.subsetOf(TxnTable.morState(spark, postings,
          TxnTable.latestVersion(spark, postings).get).files.toSet) &&
        beforeV.subsetOf(TxnTable.morState(spark, ivf,
          TxnTable.latestVersion(spark, ivf).get).files.toSet),
        "erasure must be deletion vectors on both indexes, not rewrites")
      val (lex, (ls, lt)) = graft.text.Text2Ops.lexCountRank(
        spark, postings, Seq("window", "merge", "stream"),
        cat = "gp92lex")
      require(ls < lt,
        s"the 3-term probe must prune the postings index: $ls/$lt")
      val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
      val (vecRanked, (vs, vt)) = graft.sim.SimilarityOps.ivfProbe(
        spark, ivf, cents, probe, k = 20, cat = "gp92vec")
      require(vs < vt,
        s"the 2-cell probe must prune the IVF index: $vs/$vt")
      val vec = vecRanked.select($"vec_id".as("id"), $"rn".as("rv"))
      val fused = graft.sim.SimilarityOps.rrfFuse(lex, vec)
      val rows = fused.collect()
      require(rows.forall(_.getLong(0) % 70L != 0L),
        "an erased doc surfaced in the served fusion")
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), fused.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // def, not val: cosineSql-based, defined after `all` (init order)
  private def p92Sql = {
    def mh(i: Int) =
      s"list_aggregate(list_transform(sh, s -> md5('$i:' || s)), 'min')"
    val cos = graft.sim.Similarity.cosineSql _
    s"""WITH shifted AS (
       |  SELECT a.doc_id,
       |    CASE WHEN a.doc_id % 25 = 0 AND a.doc_id > 0
       |      THEN COALESCE(b.text, a.text) ELSE a.text END AS text
       |  FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id - 1),
       |sh AS (
       |  SELECT doc_id,
       |    [string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]
       |     for i in range(1, len(string_split(text,' ')) - 1)] AS sh
       |  FROM shifted),
       |sig AS (
       |  SELECT doc_id,
       |   md5(${mh(1)} || ${mh(2)}) AS band1,
       |   md5(${mh(3)} || ${mh(4)}) AS band2,
       |   md5(${mh(5)} || ${mh(6)}) AS band3,
       |   md5(${mh(7)} || ${mh(8)}) AS band4
       |  FROM sh),
       |dups AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM sig a JOIN sig b ON a.doc_id > b.doc_id AND
       |    (a.band1 = b.band1 OR a.band2 = b.band2 OR
       |     a.band3 = b.band3 OR a.band4 = b.band4)),
       |kept AS (
       |  SELECT doc_id, text FROM shifted
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dups)
       |    AND doc_id % 70 <> 0),
       |toks AS (
       |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok
       |  FROM kept),
       |lexl AS (
       |  SELECT doc_id AS id, COUNT(*) AS cnt FROM toks
       |  WHERE tok IN ('window', 'merge', 'stream') GROUP BY 1
       |  ORDER BY cnt DESC, id LIMIT 20),
       |lexr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, id) AS BIGINT) AS rl FROM lexl),
       |cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cos("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e JOIN kept k ON e.vec_id = k.doc_id),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cos("probe.p", "cents.c")} DESC, cent_id LIMIT 2),
       |vecl AS (
       |  SELECT a.vec_id AS id, ${cos("a.embedding", "probe.p")} AS cs
       |  FROM assigned a, probe
       |  WHERE a.cell IN (SELECT cent_id FROM pcells) AND a.vec_id <> 0
       |  ORDER BY cs DESC, id LIMIT 20),
       |vecr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cs DESC, id) AS BIGINT) AS rv FROM vecl),
       |fused AS (
       |  SELECT COALESCE(l.id, v.id) AS id,
       |    COALESCE(1.0 / (60.0 + CAST(rl AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(rv AS DOUBLE)), 0.0) AS rrf
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.id = v.id)
       |SELECT id, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------- p93
  /** CDF-DRIVEN INDEX MAINTENANCE — indexes SUBSCRIBE to the corpus
    * instead of every writer enumerating indexes. p92's takedown
    * spells the production problem: its driver must know every index
    * that exists (three explicit erasure legs). Here the corpus
    * carries a change data feed, the takedown touches ONLY the
    * corpus (one positional delete), and an AvailableNow drain of
    * `readChangeFeed` erases the delete-typed rows from BOTH
    * maintained indexes — a new index subscribes to the feed instead
    * of every writer learning its name. REQUIREd: the drain's
    * erasures are deletion vectors (zero index rewrites), the live
    * index contents EQUAL the explicit-delete state (= the index
    * recomputed over the surviving corpus — postings are per
    * (term,doc) and cells per vec, so set equality is exact), and
    * both serving probes stay pruned. The oracle replays retrieval
    * over the surviving corpus through the IVF shortlist, so a
    * leaked posting, an unmasked vector, or a silently brute-forced
    * vector leg all hash-mismatch.
    *
    * Shape at 100 TB: the feed delivers exactly the changed rows
    * (O(batch), never a corpus diff), each index erasure is a
    * broadcast semi-join → one coordinate sidecar, and the drain is
    * an idempotent foreachBatch (deleteFromPos re-matching nothing on
    * replay), so a crashed subscriber resumes from its checkpoint
    * without double-erasing. */
  private def p93(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    import org.apache.spark.sql.streaming.Trigger
    val zone = java.nio.file.Files
      .createTempDirectory("graft_p93_cdf").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/corpus_txn"
      val postings = s"$zone/postings_txn"
      val ivf = s"$zone/ivf_txn"
      val cp = s"$zone/cp"
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      // the corpus carries the change feed — the ONE table writers see
      TxnTable.commitOverwrite(docs, corpus, statsCols = Seq("doc_id"),
        cdf = Some(true), mor = Some(true))
      val v1 = TxnTable.latestVersion(spark, corpus).get
      def postingsOf(c: DataFrame): DataFrame = c
        .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
        .filter(length($"term") > 0)
        .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      postingsOf(spark.read.format("graft").load(corpus))
        .write.format("graft")
        .option("partitionBy", "bucket(16, term)")
        .option("statsCols", "term").option("bloomCols", "term")
        .option("optimizedWrite", "true").option("mergeOnRead", "true")
        .mode("overwrite").save(postings)
      val cents = graft.sim.SimilarityOps.centroids(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      def assignedOf(c: DataFrame): DataFrame = emb
        .join(c.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_semi")
        .select($"vec_id", $"embedding",
          element_at(
            graft.sim.Similarity.nearestCells("embedding", cents, 1), 1)
            .cast("bigint").cast("string").as("cell"))
      assignedOf(spark.read.format("graft").load(corpus))
        .write.format("graft").option("statsCols", "vec_id")
        .option("partitionBy", "cell").option("mergeOnRead", "true")
        .mode("overwrite").save(ivf)
      val beforeP = TxnTable.snapshotFiles(spark, postings,
        TxnTable.latestVersion(spark, postings).get).toSet
      val beforeV = TxnTable.snapshotFiles(spark, ivf,
        TxnTable.latestVersion(spark, ivf).get).toSet
      // the takedown touches ONLY the corpus — no index named anywhere
      val erase = spark.read.format("graft").load(corpus)
        .filter($"doc_id" % 9 === 0).select($"doc_id").localCheckpoint()
      require(erase.limit(1).count() > 0,
        "the erasure batch must be non-empty")
      TxnTable.deleteFromPos(spark, corpus, erase, Seq("doc_id"))
      // the SUBSCRIPTION: drain the corpus feed from past the index
      // build (startingVersion is EXCLUSIVE — the (since, until]
      // window); delete-typed rows erase positionally from both indexes
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", v1.toString)
        .load(corpus)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            val dels = batch.filter(col("_change_type") === "delete")
              .select(col("doc_id")).localCheckpoint()
            if (!dels.isEmpty) {
              TxnTable.deleteFromPos(spark, postings, dels, Seq("doc_id"))
              TxnTable.deleteFromPos(spark, ivf,
                dels.select(col("doc_id").as("vec_id")), Seq("vec_id"))
            }
            ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(beforeP.subsetOf(TxnTable.morState(spark, postings,
          TxnTable.latestVersion(spark, postings).get).files.toSet) &&
        beforeV.subsetOf(TxnTable.morState(spark, ivf,
          TxnTable.latestVersion(spark, ivf).get).files.toSet),
        "CDF-driven erasure must be deletion vectors on both indexes")
      // subscription equality: live index contents == the index over
      // the SURVIVING corpus (t57/e63's explicit-delete state)
      val surv = spark.read.format("graft").load(corpus)
      val liveP = spark.read.format("graft").load(postings)
        .select($"term", $"doc_id", $"tf")
      // count gates make the except equalities multiset-exact (except
      // has set semantics; a double-applied append would slip through)
      val wantP = postingsOf(surv)
      require(liveP.count() == wantP.count() &&
        liveP.except(wantP).isEmpty && wantP.except(liveP).isEmpty,
        "the subscribed postings index diverged from the explicit-" +
          "delete state")
      val liveV = spark.read.format("graft").load(ivf)
        .select($"vec_id", $"cell")
      val wantV = assignedOf(surv).select($"vec_id", $"cell")
      require(liveV.count() == wantV.count() &&
        liveV.except(wantV).isEmpty && wantV.except(liveV).isEmpty,
        "the subscribed IVF index diverged from the explicit-delete state")
      // serve: both probes through the maintained indexes, pruned
      val (lex, (ls, lt)) = graft.text.Text2Ops.lexCountRank(
        spark, postings, Seq("window", "merge", "stream"),
        cat = "gp93lex")
      require(ls < lt,
        s"the 3-term probe must prune the postings index: $ls/$lt")
      val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
      val (vecRanked, (vs, vt)) = graft.sim.SimilarityOps.ivfProbe(
        spark, ivf, cents, probe, k = 20, cat = "gp93vec")
      require(vs < vt,
        s"the 2-cell probe must prune the IVF index: $vs/$vt")
      val vec = vecRanked.select($"vec_id".as("id"), $"rn".as("rv"))
      val fused = graft.sim.SimilarityOps.rrfFuse(lex, vec)
      val rows = fused.collect()
      require(rows.forall(_.getLong(0) % 9L != 0L),
        "an erased doc surfaced in the served fusion")
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), fused.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  // def, not val: cosineSql-based, defined after `all` (init order)
  private def p93Sql = {
    val cos = graft.sim.Similarity.cosineSql _
    s"""WITH surv AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 0),
       |toks AS (
       |  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok
       |  FROM surv),
       |lexl AS (
       |  SELECT doc_id AS id, COUNT(*) AS cnt FROM toks
       |  WHERE tok IN ('window', 'merge', 'stream') GROUP BY 1
       |  ORDER BY cnt DESC, id LIMIT 20),
       |lexr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, id) AS BIGINT) AS rl FROM lexl),
       |cents AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 16),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, (
       |    SELECT cent_id FROM cents
       |    ORDER BY ${cos("e.embedding", "cents.c")} DESC, cent_id LIMIT 1) AS cell
       |  FROM embeddings e JOIN surv k ON e.vec_id = k.doc_id),
       |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
       |pcells AS (
       |  SELECT cent_id FROM cents, probe
       |  ORDER BY ${cos("probe.p", "cents.c")} DESC, cent_id LIMIT 2),
       |vecl AS (
       |  SELECT a.vec_id AS id, ${cos("a.embedding", "probe.p")} AS cs
       |  FROM assigned a, probe
       |  WHERE a.cell IN (SELECT cent_id FROM pcells) AND a.vec_id <> 0
       |  ORDER BY cs DESC, id LIMIT 20),
       |vecr AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cs DESC, id) AS BIGINT) AS rv FROM vecl),
       |fused AS (
       |  SELECT COALESCE(l.id, v.id) AS id,
       |    COALESCE(1.0 / (60.0 + CAST(rl AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(rv AS DOUBLE)), 0.0) AS rrf
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.id = v.id)
       |SELECT id, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10""".stripMargin
  }

  val all: Seq[RQ] = Seq(
    RQ("p90_training_pipeline", p90, Some(p90Sql), bench = true),
    RQ("p91_dq_expectations", p91, Some(p91Sql)),
    RQ("p92_corpus_lifecycle", p92, Some(p92Sql)),
    RQ("p93_cdf_index_subscribe", p93, Some(p93Sql)))
}
