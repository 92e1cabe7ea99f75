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

  // ---------------------------------------------------------------- p94
  /** THE TOMBSTONE TAKEDOWN STREAM — the production topology m76's
    * discrimination contract names, made real. m76 drained the corpus
    * change feed in takedown WINDOWS because row-level change types
    * cannot tell a takedown delete from a dedup-loser delete (whose
    * signatures must PERSIST — the d47 invariant). Here takedowns get
    * their own typed, append-only feed table (kind, item_id): writers
    * append tombstones there and ONLY there; dedup-loser deletes never
    * enter it, so every subscriber consumes the full tail with no
    * window bookkeeping — one topology for text, vectors, AND media,
    * retiring the p93(window-free but corpus-CDF)/m76(windowed) split.
    *
    * ONE tombstone append; NINE tables erase themselves — the five
    * maintained index families (postings, IVF, image/audio/video
    * fingerprint indexes) plus their four corpora — each as a leg of a
    * checkpointed AvailableNow foreachBatch drain using
    * `deleteFromPosIdempotent` with a per-leg appId: the txn marker
    * commits ATOMICALLY with each deletion vector, so a crash between
    * legs heals on restart without double-applying completed legs, and
    * a replayed batch arriving after a lawful RE-ADMISSION is marker-
    * skipped instead of re-matched (REQUIREd below by restoring a
    * tombstoned doc and replaying its drained batch — TombstoneSpec
    * pins the primitive in isolation).
    *
    * REQUIREd: every leg is a deletion vector (zero rewrites on all
    * nine tables), each index family's live contents EQUAL its
    * explicit-delete state (count-gated bidirectional except), media
    * variants orphaned by the takedown RE-ADMIT, and the replay leaves
    * the restored doc standing. The oracle replays all five families'
    * final states closed-form (the m73/m74/m75 chains plus the
    * text/vector survivor sets, X = the restored doc).
    *
    * Shape at 100 TB: the feed delivers exactly the tombstones
    * (O(batch)); each leg is one broadcast semi-join → a kilobyte
    * coordinate sidecar + marker; a new index family subscribes by
    * adding a leg with its own appId, touching no writer. */
  private def p94(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    import graft.multimodal.MultimodalOps
    import org.apache.spark.sql.streaming.Trigger
    val zone = java.nio.file.Files
      .createTempDirectory("graft_p94_tomb").toFile.getAbsolutePath
    try {
      val tcorpus = s"$zone/tcorpus_txn"
      val postings = s"$zone/postings_txn"
      val ivf = s"$zone/ivf_txn"
      val icorpus = s"$zone/imgs_txn"
      val isigs = s"$zone/isigs_txn"
      val acorpus = s"$zone/clips_txn"
      val asigs = s"$zone/asigs_txn"
      val vcorpus = s"$zone/vclips_txn"
      val vsigs = s"$zone/vsigs_txn"
      val feed = s"$zone/takedowns_txn"
      val cp = s"$zone/cp"
      // ---- builds: the five maintained families (no CDF anywhere —
      // the feed, not the corpus log, carries takedowns)
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      TxnTable.commitOverwrite(docs, tcorpus, statsCols = Seq("doc_id"),
        mor = Some(true))
      def postingsOf(c: DataFrame): DataFrame = c
        .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
        .filter(length($"term") > 0)
        .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      postingsOf(spark.read.format("graft").load(tcorpus))
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
      assignedOf(spark.read.format("graft").load(tcorpus))
        .write.format("graft").option("statsCols", "vec_id")
        .option("partitionBy", "cell").option("mergeOnRead", "true")
        .mode("overwrite").save(ivf)
      val ifps = MultimodalOps.imageFingerprints(spark, dir)
        .select($"item_id".as("img_id"), $"fp")
      MultimodalOps.m70Ingest(spark, icorpus, isigs,
        ifps.filter($"img_id" % 2 === 0), first = true,
        col("img_id") % 2 === 0)
      val afps = MultimodalOps.audioFingerprints(spark, dir)
        .select($"item_id".as("img_id"), $"fp")
      MultimodalOps.m70Ingest(spark, acorpus, asigs,
        afps.filter($"img_id" % 2 === 0), first = true,
        col("img_id") % 2 === 0)
      val vfps = MultimodalOps.videoFingerprints(spark, dir)
      MultimodalOps.m75Ingest(spark, vcorpus, vsigs,
        vfps.filter($"clip_id" % 2 === 0), first = true,
        col("clip_id") % 2 === 0)
      // ---- THE takedown: one append to the typed tombstone feed.
      // No index (and no corpus) is named anywhere in the takedown
      // path — the feed IS the takedown interface.
      def tomb(kind: String, t: String, keyCol: String, m: Int) =
        spark.read.format("graft").load(t)
          .filter(col(keyCol) % m === 0)
          .select(lit(kind).as("kind"), col(keyCol).as("item_id"))
      val tombstones = tomb("text", tcorpus, "doc_id", 9)
        .unionByName(tomb("image", icorpus, "img_id", 14))
        .unionByName(tomb("audio", acorpus, "img_id", 14))
        .unionByName(tomb("video", vcorpus, "clip_id", 14))
        .localCheckpoint()
      Seq("text", "image", "audio", "video").foreach(k =>
        require(tombstones.filter($"kind" === k).limit(1).count() > 0,
          s"the $k tombstone batch must be non-empty"))
      TxnTable.commitAppend(tombstones, feed, statsCols = Seq("item_id"))
      // ---- the SUBSCRIPTION: nine legs, each exactly-once by marker
      val legs = Seq(
        ("text", tcorpus, "doc_id"), ("text", postings, "doc_id"),
        ("text", ivf, "vec_id"),
        ("image", icorpus, "img_id"), ("image", isigs, "pid"),
        ("audio", acorpus, "img_id"), ("audio", asigs, "pid"),
        ("video", vcorpus, "clip_id"), ("video", vsigs, "pid"))
      val before = legs.map { case (_, t, _) =>
        t -> TxnTable.snapshotFiles(spark, t,
          TxnTable.latestVersion(spark, t).get).toSet
      }
      val lastBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
      val q = spark.readStream.format("graft").load(feed)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           batchId: Long) =>
            val b = batch.localCheckpoint()
            legs.foreach { case (kind, t, keyCol) =>
              TxnTable.deleteFromPosIdempotent(spark, t,
                b.filter(col("kind") === kind)
                  .select(col("item_id").as(keyCol)),
                Seq(keyCol), appId = s"p94drain:$kind:$keyCol@$t",
                batchId = batchId)
              ()
            }
            lastBatch.set(math.max(lastBatch.get(), batchId))
            ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(lastBatch.get() >= 0L, "the drain must deliver a batch")
      // ---- zero rewrites, all nine tables
      before.foreach { case (t, fs) =>
        require(fs.subsetOf(TxnTable.morState(spark, t,
            TxnTable.latestVersion(spark, t).get).files.toSet),
          s"the $t drain leg must be a deletion vector, not a rewrite")
      }
      // ---- family equality vs the explicit-delete state (count gate
      // makes each except multiset-exact)
      def sameState(live: DataFrame, want: DataFrame, what: String): Unit =
        require(live.count() == want.count() &&
          live.except(want).isEmpty && want.except(live).isEmpty,
          s"the subscribed $what diverged from the explicit-delete state")
      val surv = spark.read.format("graft").load(tcorpus)
      sameState(spark.read.format("graft").load(postings)
          .select($"term", $"doc_id", $"tf"),
        postingsOf(surv), "postings index")
      sameState(spark.read.format("graft").load(ivf)
          .select($"vec_id", $"cell"),
        assignedOf(surv).select($"vec_id", $"cell"), "IVF index")
      def minus(want: DataFrame, t: String, kind: String) =
        want.join(tombstones.filter($"kind" === kind)
            .select($"item_id".as("pid")), Seq("pid"), "left_anti")
      sameState(spark.read.format("graft").load(isigs)
          .select($"pid", $"bk", $"pfp"),
        minus(MultimodalOps.bandKeys(ifps.filter($"img_id" % 2 === 0))
          .select($"img_id".as("pid"), $"bk", $"fp".as("pfp")),
          isigs, "image"), "image fingerprint index")
      sameState(spark.read.format("graft").load(asigs)
          .select($"pid", $"bk", $"pfp"),
        minus(MultimodalOps.bandKeys(afps.filter($"img_id" % 2 === 0))
          .select($"img_id".as("pid"), $"bk", $"fp".as("pfp")),
          asigs, "audio"), "audio fingerprint index")
      val vEvens = vfps.filter($"clip_id" % 2 === 0)
      val vSized = vEvens.groupBy($"clip_id").agg(count(lit(1)).as("pn"))
      sameState(spark.read.format("graft").load(vsigs)
          .select($"pid", $"fp", $"pn"),
        minus(vEvens.join(vSized, "clip_id")
          .select($"clip_id".as("pid"), $"fp", $"pn"),
          vsigs, "video"), "video fingerprint index")
      // ---- re-admission: variants orphaned by the takedown re-admit
      MultimodalOps.m70Ingest(spark, icorpus, isigs,
        ifps.filter($"img_id" % 2 === 1), first = false,
        col("img_id") % 2 === 1)
      MultimodalOps.m70Ingest(spark, acorpus, asigs,
        afps.filter($"img_id" % 2 === 1), first = false,
        col("img_id") % 2 === 1)
      MultimodalOps.m75Ingest(spark, vcorpus, vsigs,
        vfps.filter($"clip_id" % 2 === 1), first = false,
        col("clip_id") % 2 === 1)
      def checkReadmit(t: String, keyCol: String, kind: String): Unit = {
        val c = spark.read.format("graft").load(t).select(col(keyCol))
        val tk = tombstones.filter($"kind" === kind)
          .select($"item_id".as(keyCol))
        require(c.join(tk, Seq(keyCol), "left_semi").count() == 0,
          s"a tombstoned $kind item survived in $t")
        require(c.filter(col(keyCol) % 2 === 1)
            .join(tk.select((col(keyCol) + 1).as(keyCol)),
              Seq(keyCol), "left_semi").count() > 0,
          s"an orphaned $kind variant must RE-ADMIT")
      }
      checkReadmit(icorpus, "img_id", "image")
      checkReadmit(acorpus, "img_id", "audio")
      checkReadmit(vcorpus, "clip_id", "video")
      // ---- exactly-once under replay: restore ONE tombstoned doc
      // (rights re-granted), then crash-replay the drained batch at
      // the text-corpus leg — the marker must skip it wholesale; a
      // re-match would erase the lawful restore
      val x = tombstones.filter($"kind" === "text")
        .agg(min($"item_id")).head().getLong(0)
      TxnTable.commitAppend(docs.filter($"doc_id" === x), tcorpus)
      val vBeforeReplay = TxnTable.latestVersion(spark, tcorpus).get
      TxnTable.deleteFromPosIdempotent(spark, tcorpus,
        tombstones.filter($"kind" === "text")
          .select($"item_id".as("doc_id")),
        Seq("doc_id"), appId = s"p94drain:text:doc_id@$tcorpus",
        batchId = lastBatch.get())
      require(TxnTable.latestVersion(spark, tcorpus).get == vBeforeReplay,
        "a replayed drain batch must be a marker no-op, not a commit")
      require(spark.read.format("graft").load(tcorpus)
          .filter($"doc_id" === x).count() == 1,
        "the replayed drain erased the restored doc — the marker " +
          "failed to decide")
      // ---- result: the five families' final corpora/contents
      def fam(name: String, df: DataFrame) =
        df.select(lit(name).as("family"),
          df.columns.headOption.map(c => col(c)).get
            .cast("long").as("item_id"))
      val res = fam("text", spark.read.format("graft").load(tcorpus)
          .select($"doc_id"))
        .unionByName(fam("vec", spark.read.format("graft").load(ivf)
          .select($"vec_id")))
        .unionByName(fam("image", spark.read.format("graft").load(icorpus)
          .select($"img_id")))
        .unionByName(fam("audio", spark.read.format("graft").load(acorpus)
          .select($"img_id")))
        .unionByName(fam("video", spark.read.format("graft").load(vcorpus)
          .select($"clip_id")))
        .orderBy($"family", $"item_id")
      spark.createDataFrame(
        java.util.Arrays.asList(res.collect(): _*), res.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }

  val all: Seq[RQ] = Seq(
    RQ("p90_training_pipeline", p90, Some(p90Sql), bench = true),
    RQ("p91_dq_expectations", p91, Some(p91Sql)),
    RQ("p92_corpus_lifecycle", p92, Some(p92Sql)),
    RQ("p93_cdf_index_subscribe", p93, Some(p93Sql)),
    RQ("p94_tombstone_stream", p94, Some(p94Sql)))

  /** p94's oracle: all five families' final states closed-form — the
    * text survivor set plus the restored doc X (= the smallest
    * tombstoned id), the vector survivor set (X not re-indexed: the
    * restore touches the corpus; its index maintenance belongs to the
    * restore's own ingest), and the m73/m74/m75 chains (keep-first →
    * takedown of admitted %14 → variant admission against surviving
    * signatures) for image/audio/video. def, not val: defined after
    * `all` (init order). */
  private def p94Sql = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH i_imgs AS (
      |  SELECT doc_id * 2 AS img_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |i_grid AS (
      |  SELECT x.g AS x, y.g AS y
      |  FROM generate_series(0, 8) x(g), generate_series(0, 7) y(g)),
      |i_px AS (
      |  SELECT img_id, x, y, pert,
      |    md5('p:' || id || ':' || (x*16//9) || ':' || (2*y)) AS m
      |  FROM i_imgs, i_grid),
      |i_gray AS (
      |  SELECT img_id, x, y,
      |    ((${nib(1)}*16 + ${nib(2)}
      |        + CASE WHEN pert = 1 AND 2*y >= 12 THEN 40 ELSE 0 END) % 256
      |     + ${nib(3)}*16 + ${nib(4)}
      |     + ${nib(5)}*16 + ${nib(6)}) AS g
      |  FROM i_px),
      |i_bits AS (
      |  SELECT a.img_id, a.y * 8 + a.x AS b,
      |    CASE WHEN n.g > a.g THEN 1 ELSE 0 END AS bit
      |  FROM i_gray a JOIN i_gray n
      |    ON n.img_id = a.img_id AND n.y = a.y AND n.x = a.x + 1
      |  WHERE a.x < 8),
      |i_hashes AS (
      |  SELECT img_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM i_bits GROUP BY img_id),
      |i_bands AS (
      |  SELECT img_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM i_hashes, range(4) r),
      |i_pairs AS (
      |  SELECT DISTINCT a.img_id AS i, b.img_id AS j
      |  FROM i_bands a JOIN i_bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.img_id > b.img_id
      |  JOIN i_hashes ha ON ha.img_id = a.img_id
      |  JOIN i_hashes hb ON hb.img_id = b.img_id
      |  WHERE bit_count(xor(ha.h, hb.h)) <= 16),
      |i_dups1 AS (
      |  SELECT DISTINCT i FROM i_pairs WHERE i % 2 = 0 AND j % 2 = 0),
      |i_adm1 AS (
      |  SELECT img_id FROM i_hashes WHERE img_id % 2 = 0
      |    AND img_id NOT IN (SELECT i FROM i_dups1)),
      |i_takedown AS (SELECT img_id FROM i_adm1 WHERE img_id % 14 = 0),
      |i_dups2 AS (
      |  SELECT DISTINCT i FROM i_pairs
      |  WHERE i % 2 = 1 AND (j % 2 = 1 OR
      |    j NOT IN (SELECT img_id FROM i_takedown))),
      |i_fin AS (
      |  SELECT img_id FROM i_adm1
      |  WHERE img_id NOT IN (SELECT img_id FROM i_takedown)
      |  UNION ALL
      |  SELECT img_id FROM i_hashes WHERE img_id % 2 = 1
      |    AND img_id NOT IN (SELECT i FROM i_dups2)),
      |a_clips AS (
      |  SELECT doc_id * 2 AS item_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |a_idx AS (SELECT UNNEST(range(0, 130)) AS i),
      |a_smp AS (
      |  SELECT item_id, i,
      |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
      |  FROM (
      |    SELECT item_id, i,
      |      ((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})
      |        + CASE WHEN pert = 1 AND i >= 98 THEN 512 ELSE 0 END) % 65536 AS u
      |    FROM (SELECT item_id, pert, i, md5('a:' || id || ':' || i) AS m
      |          FROM a_clips, a_idx) t) u2),
      |a_eng AS (
      |  SELECT item_id, i // 2 AS f, SUM(ABS(s)) AS e
      |  FROM a_smp GROUP BY item_id, i // 2),
      |a_bits AS (
      |  SELECT a.item_id, a.f AS b,
      |    CASE WHEN n.e > a.e THEN 1 ELSE 0 END AS bit
      |  FROM a_eng a JOIN a_eng n
      |    ON n.item_id = a.item_id AND n.f = a.f + 1
      |  WHERE a.f < 64),
      |a_hashes AS (
      |  SELECT item_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM a_bits GROUP BY item_id),
      |a_bands AS (
      |  SELECT item_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM a_hashes, range(4) r),
      |a_pairs AS (
      |  SELECT DISTINCT a.item_id AS i, b.item_id AS j
      |  FROM a_bands a JOIN a_bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.item_id > b.item_id
      |  JOIN a_hashes ha ON ha.item_id = a.item_id
      |  JOIN a_hashes hb ON hb.item_id = b.item_id
      |  WHERE bit_count(xor(ha.h, hb.h)) <= 16),
      |a_dups1 AS (
      |  SELECT DISTINCT i FROM a_pairs WHERE i % 2 = 0 AND j % 2 = 0),
      |a_adm1 AS (
      |  SELECT item_id FROM a_hashes WHERE item_id % 2 = 0
      |    AND item_id NOT IN (SELECT i FROM a_dups1)),
      |a_takedown AS (SELECT item_id FROM a_adm1 WHERE item_id % 14 = 0),
      |a_dups2 AS (
      |  SELECT DISTINCT i FROM a_pairs
      |  WHERE i % 2 = 1 AND (j % 2 = 1 OR
      |    j NOT IN (SELECT item_id FROM a_takedown))),
      |a_fin AS (
      |  SELECT item_id FROM a_adm1
      |  WHERE item_id NOT IN (SELECT item_id FROM a_takedown)
      |  UNION ALL
      |  SELECT item_id FROM a_hashes WHERE item_id % 2 = 1
      |    AND item_id NOT IN (SELECT i FROM a_dups2)),
      |v_d AS (SELECT doc_id AS cid, 4 + doc_id % 3 AS nf FROM documents),
      |v_clips AS (
      |  SELECT cid * 2 AS clip_id, cid, nf FROM v_d
      |  UNION ALL
      |  SELECT cid * 2 + 1, cid, nf FROM v_d WHERE cid % 5 = 0),
      |v_fps AS (
      |  SELECT clip_id, (cid * 7 + s.g * 53) % 512 AS fp
      |  FROM v_clips, generate_series(0, 2) s(g)
      |  WHERE s.g < CAST(CEIL(nf / 2.0) AS BIGINT)),
      |v_sizes AS (SELECT clip_id, COUNT(*) AS n FROM v_fps GROUP BY 1),
      |v_pairs AS (
      |  SELECT a.clip_id AS i, b.clip_id AS j, COUNT(*) AS shared
      |  FROM v_fps a JOIN v_fps b ON a.fp = b.fp AND a.clip_id > b.clip_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |v_near AS (
      |  SELECT i, j FROM v_pairs
      |  JOIN v_sizes sa ON sa.clip_id = i
      |  JOIN v_sizes sb ON sb.clip_id = j
      |  WHERE 2 * shared >= sa.n + sb.n - shared),
      |v_dups1 AS (
      |  SELECT DISTINCT i FROM v_near WHERE i % 2 = 0 AND j % 2 = 0),
      |v_adm1 AS (
      |  SELECT clip_id FROM v_sizes WHERE clip_id % 2 = 0
      |    AND clip_id NOT IN (SELECT i FROM v_dups1)),
      |v_takedown AS (SELECT clip_id FROM v_adm1 WHERE clip_id % 14 = 0),
      |v_dups2 AS (
      |  SELECT DISTINCT i FROM v_near
      |  WHERE i % 2 = 1 AND (j % 2 = 1 OR
      |    j NOT IN (SELECT clip_id FROM v_takedown))),
      |v_fin AS (
      |  SELECT clip_id FROM v_adm1
      |  WHERE clip_id NOT IN (SELECT clip_id FROM v_takedown)
      |  UNION ALL
      |  SELECT clip_id FROM v_sizes WHERE clip_id % 2 = 1
      |    AND clip_id NOT IN (SELECT i FROM v_dups2))
      |SELECT 'text' AS family, CAST(doc_id AS BIGINT) AS item_id
      |FROM documents
      |WHERE doc_id % 9 <> 0
      |  OR doc_id = (SELECT MIN(doc_id) FROM documents WHERE doc_id % 9 = 0)
      |UNION ALL
      |SELECT 'vec', CAST(vec_id AS BIGINT) FROM embeddings
      |WHERE vec_id IN (SELECT doc_id FROM documents) AND vec_id % 9 <> 0
      |UNION ALL
      |SELECT 'image', CAST(img_id AS BIGINT) FROM i_fin
      |UNION ALL
      |SELECT 'audio', CAST(item_id AS BIGINT) FROM a_fin
      |UNION ALL
      |SELECT 'video', CAST(clip_id AS BIGINT) FROM v_fin
      |ORDER BY family, item_id""".stripMargin
  }
}
