package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Analytic batch 2 (SURVEY.md §2.5-§2.7 breadth + §2.10): correlated
  * subqueries, multiset set-ops, CUBE / GROUPING SETS, numerically-stable
  * moment statistics, deterministic sampling, explode/UNNEST, JSON
  * extraction, as-of windows, range joins, global row numbering.
  *
  * Queries built from `spark.sql` use ANSI text that doubles as its own
  * DuckDB oracle (one string, two engines). */
object Analytic {

  private def viewsThen(sql: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { Tables.registerViews(spark, dir); spark.sql(sql) }

  private def dsumSql(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  // ---------------------------------------------------------------- a23
  /** Correlated scalar subquery: orders costing more than 2× their own
    * customer's average order (decorrelates to an aggregate + join). */
  private val a23Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
      |                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- a24
  /** Multiset set operations: EXCEPT ALL / INTERSECT ALL keep
    * duplicates (bag semantics), unlike q12's set versions. */
  private def a24(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val p = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    f.exceptAll(p).withColumn("op", lit("except_all"))
      .union(f.intersectAll(p).withColumn("op", lit("intersect_all")))
      .select($"op", $"o_custkey")
      .orderBy($"op", $"o_custkey")
  }
  private val a24Sql =
    """SELECT 'except_all' AS op, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |UNION ALL
      |SELECT 'intersect_all' AS op, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |ORDER BY op, o_custkey""".stripMargin

  // ---------------------------------------------------------------- a25
  /** Full CUBE over two dimensions with GROUPING() markers —
    * Dataset.cube + grouping() (the DataFrame spelling; SQL stays as the
    * oracle). */
  private def a25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.Num.dsum
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        grouping($"l_returnflag").cast("bigint").as("g_flag"),
        grouping($"l_linestatus").cast("bigint").as("g_status"),
        count(lit(1)).cast("bigint").as("n"),
        dsum($"l_quantity").as("sum_qty"))
      .orderBy($"g_flag", $"g_status",
        $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }
  private val a25Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- a26
  /** Explicit GROUPING SETS (disjoint one-dimension rollups) —
    * Dataset.groupingSets (Spark 4's DataFrame spelling). */
  private def a26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.Num.dsum
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
        $"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }
  private val a26Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- a27
  /** Sample variance / stddev via explicit moment formulas over exact
    * decimal sums — order-independent, unlike built-in stddev whose
    * partial-merge order perturbs low bits. l_quantity is integral so
    * squares are exact. */
  private def a27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.Num.dsum
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        dsum($"l_quantity").as("s1"),
        dsum($"l_quantity" * $"l_quantity").as("s2"))
      .select($"l_returnflag", $"n",
        ($"s1" / $"n").as("mean_qty"),
        (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("var_qty"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("stddev_qty"))
      .orderBy($"l_returnflag")
  }
  private val a27Sql =
    s"""SELECT l_returnflag,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | ${dsumSql("l_quantity")} / COUNT(*) AS mean_qty,
       | (${dsumSql("l_quantity * l_quantity")} - ${dsumSql("l_quantity")} * ${dsumSql("l_quantity")} / COUNT(*))
       |   / (COUNT(*) - 1) AS var_qty,
       | SQRT((${dsumSql("l_quantity * l_quantity")} - ${dsumSql("l_quantity")} * ${dsumSql("l_quantity")} / COUNT(*))
       |   / (COUNT(*) - 1)) AS stddev_qty
       |FROM lineitem GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- a28
  /** Pearson correlation from exact decimal co-moments (same rationale
    * as a27). */
  private def a28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.Num.dsum
    Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        dsum($"l_quantity" * $"l_extendedprice").as("sqp"),
        dsum($"l_quantity").as("sq"),
        dsum($"l_extendedprice").as("sp"),
        dsum($"l_quantity" * $"l_quantity").as("sqq"),
        dsum($"l_extendedprice" * $"l_extendedprice").as("spp"))
      .select(
        (($"n" * $"sqp" - $"sq" * $"sp") /
          (sqrt($"n" * $"sqq" - $"sq" * $"sq") *
            sqrt($"n" * $"spp" - $"sp" * $"sp"))).as("corr_qty_price"))
  }
  private val a28Sql =
    s"""SELECT
       | (COUNT(*) * ${dsumSql("l_quantity * l_extendedprice")} - ${dsumSql("l_quantity")} * ${dsumSql("l_extendedprice")})
       | / (SQRT(COUNT(*) * ${dsumSql("l_quantity * l_quantity")} - ${dsumSql("l_quantity")} * ${dsumSql("l_quantity")})
       |  * SQRT(COUNT(*) * ${dsumSql("l_extendedprice * l_extendedprice")} - ${dsumSql("l_extendedprice")} * ${dsumSql("l_extendedprice")}))
       | AS corr_qty_price
       |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- a29
  /** Deterministic ~12.5% sample: hash-mod on a stable key (md5 first
    * nibble ∈ {0,1}) — reproducible across engines, partitionings and
    * runs, unlike RNG-based TABLESAMPLE. */
  private def a29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter(substring(md5($"o_orderkey".cast("string")), 1, 1).isin("0", "1"))
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }
  private val a29Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- a30
  /** Generator/UNNEST: positional token explode (1-based positions to
    * match SQL's ordinality convention). */
  private def a30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 3)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos0", "tok")))
      .select($"doc_id", ($"pos0" + 1).cast("bigint").as("pos"), $"tok")
      .orderBy($"doc_id", $"pos")
  }
  private val a30Sql =
    """SELECT doc_id, CAST(i AS BIGINT) AS pos, string_split(text, ' ')[i] AS tok
      |FROM documents, LATERAL (SELECT UNNEST(RANGE(1, LEN(string_split(text, ' ')) + 1)) AS i) t
      |WHERE doc_id < 3
      |ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------------- a31
  /** JSON extraction from the events.props column: schema'd from_json on
    * the Spark side; the oracle states the equivalent field extraction. */
  private def a31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(
        $"event_id",
        expr("from_json(props, 'k INT').k").cast("bigint").as("k_json"),
        regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("bigint").as("k_regex"))
      .orderBy($"event_id")
  }
  private val a31Sql =
    """SELECT event_id,
      | CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_json,
      | CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_regex
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- a32
  /** As-of lookup as a running window: for every event, the most recent
    * prior 'purchase' timestamp of the same user (point-in-time join
    * collapsed onto one ordered pass — no self-join). */
  private val a32Sql =
    """SELECT event_id, user_id, ts,
      | MAX(CASE WHEN event_type = 'purchase' THEN ts END)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
      |FROM events
      |ORDER BY user_id, ts, event_id""".stripMargin

  // ---------------------------------------------------------------- a33
  /** Range (interval) join: purchases within 5 minutes after a signup by
    * the same user. Bounded-interval non-equi join — the band condition
    * keeps the blow-up local. */
  private def a33(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val s = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id", $"ts".as("signup_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_uid"),
        $"ts".as("purchase_ts"))
    s.join(p,
      $"user_id" === $"p_uid" &&
        $"purchase_ts" >= $"signup_ts" &&
        $"purchase_ts" <= $"signup_ts" + expr("INTERVAL '5' MINUTE"))
      .select($"signup_id", $"purchase_id", $"user_id",
        $"signup_ts", $"purchase_ts")
      .orderBy($"signup_id", $"purchase_id")
  }
  private val a33Sql =
    """SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id,
      | s.ts AS signup_ts, p.ts AS purchase_ts
      |FROM events s JOIN events p
      |  ON s.user_id = p.user_id
      | AND s.event_type = 'signup' AND p.event_type = 'purchase'
      | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 5 MINUTE
      |ORDER BY signup_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------- a34
  /** Global dense row numbering over a total order — the engine-side
    * equivalent of the reference's Postgres SERIAL id
    * (ref `dags/s3-etl-wallet-csv.py:210`; SURVEY.md §2.7).
    * Implemented by GlobalOrder.globalRowNumber (range repartition +
    * partition-offset numbering), NOT `ROW_NUMBER() OVER (ORDER BY …)`:
    * the window spelling forces every row through one partition, this
    * distributes. GlobalOrderSpec asserts the plan has no
    * single-partition exchange; the oracle states the window spelling —
    * same answer, scale-safe plan. */
  private def a34(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GlobalOrder.globalRowNumber(
      Tables.events(spark, dir).select($"event_id", $"user_id"),
      Seq($"event_id"), "row_id")
  }
  private val a34Sql =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY event_id) AS BIGINT) AS row_id,
      | event_id, user_id
      |FROM events ORDER BY row_id""".stripMargin

  // ---------------------------------------------------------------- a37
  /** Deterministic 75/25 train/test split (SURVEY.md §2.11's randomSplit,
    * made reproducible): assignment by md5-nibble of the stable key, so
    * the same row lands in the same split on every engine, run, and
    * partitioning — the property a training pipeline actually needs. */
  private def a37(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val split = when(
      instr(lit("0123456789abcdef"),
        substring(md5($"doc_id".cast("string")), 1, 1)) <= 12, "train")
      .otherwise("test")
    Tables.documents(spark, dir)
      .select($"doc_id", split.as("split"))
      .groupBy($"split")
      .agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy($"split")
  }
  private val a37Sql =
    """SELECT split, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |  SELECT CASE WHEN STRPOS('0123456789abcdef', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 12
      |              THEN 'train' ELSE 'test' END AS split
      |  FROM documents) t
      |GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- a38
  /** Exact median by rank selection (not interpolation): pick the middle
    * row(s) by a total order and average them. Unlike percentile_cont,
    * whose interpolation arithmetic differs across engines, this is pure
    * row selection + one (a+b)/2 of identical doubles — oracle-exact. */
  private def a38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Range-partitioned rank selection (GlobalOrder), not
    // `ROW_NUMBER()/COUNT(*) OVER ()` global windows: the total count
    // comes from the partition-offsets metadata pass, the two middle rows
    // by rank filter — no single-partition exchange anywhere
    // (GlobalOrderSpec asserts it).
    val (ranked, n) = GlobalOrder.withGlobalRank(
      Tables.orders(spark, dir).select($"o_totalprice", $"o_orderkey"),
      Seq($"o_totalprice", $"o_orderkey"))
    ranked
      .filter($"rn" === (n + 1) / 2 || $"rn" === (n + 2) / 2)
      .agg(avg($"o_totalprice").as("median_totalprice"))
  }
  private val a38Sql =
    """WITH ranked AS (
      |  SELECT o_totalprice,
      |    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM orders)
      |SELECT AVG(o_totalprice) AS median_totalprice
      |FROM ranked WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2""".stripMargin

  // ---------------------------------------------------------------- a39
  /** Typed cogroup (KeyValueGroupedDataset.cogroup): per-order merge of
    * the orders and lineitem streams with arbitrary Scala logic — the
    * typed escape hatch when relational operators can't express the
    * per-key computation. Sums accumulate in BigDecimal inside the group
    * function so the result is iteration-order independent and
    * oracle-exact (same contract as Num.dsum). */
  private def a39(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)]
    val l = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_quantity").as[(Long, Double)]
    o.groupByKey(_._1).cogroup(l.groupByKey(_._1)) { (key, os, ls) =>
      val orders = os.toSeq
      if (orders.isEmpty) Iterator.empty // lineitems without an order: none
      else {
        var n = 0L
        var sum = java.math.BigDecimal.ZERO
        ls.foreach { case (_, q) =>
          n += 1
          sum = sum.add(java.math.BigDecimal.valueOf(q)
            .setScale(6, java.math.RoundingMode.HALF_UP))
        }
        Iterator((key, orders.head._2, n,
          if (n == 0) null else java.lang.Double.valueOf(sum.doubleValue())))
      }
    }.toDF("o_orderkey", "o_totalprice", "n_items", "sum_qty")
      .select($"o_orderkey", $"o_totalprice",
        $"n_items".cast("bigint").as("n_items"), $"sum_qty".cast("double").as("sum_qty"))
      .orderBy($"o_orderkey")
  }
  private val a39Sql =
    s"""SELECT o_orderkey, o_totalprice,
       | CAST(COUNT(l_orderkey) AS BIGINT) AS n_items,
       | ${dsumSql("l_quantity")} AS sum_qty
       |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderkey, o_totalprice
       |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- a41
  /** Column profiling (the data-quality pass every ingest runs first):
    * one aggregation emitting per-column null counts, distinct counts,
    * and numeric ranges for orders — the Dataset.describe shape made
    * deterministic and oracle-exact. */
  private def a41(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).agg(
      count(lit(1)).cast("bigint").as("n_rows"),
      sum(when($"o_custkey".isNull, 1).otherwise(0)).cast("bigint").as("nulls_custkey"),
      sum(when($"o_orderstatus".isNull, 1).otherwise(0)).cast("bigint").as("nulls_status"),
      countDistinct($"o_orderstatus").cast("bigint").as("distinct_status"),
      countDistinct($"o_orderpriority").cast("bigint").as("distinct_priority"),
      min($"o_totalprice").as("min_price"),
      max($"o_totalprice").as("max_price"),
      min($"o_orderdate").as("min_date"),
      max($"o_orderdate").as("max_date"))
  }
  private val a41Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      | CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_custkey,
      | CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_status,
      | CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS distinct_status,
      | CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS distinct_priority,
      | MIN(o_totalprice) AS min_price,
      | MAX(o_totalprice) AS max_price,
      | MIN(o_orderdate) AS min_date,
      | MAX(o_orderdate) AS max_date
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- a42
  /** MERGE/upsert semantics (anti-join + union): apply a change batch to
    * a base table — matched keys take the new row, unmatched keep the
    * old. This is the engine-side version of the reference's non-atomic
    * copy-then-delete zone move (SURVEY.md §4.2-5): one deterministic
    * plan, output written once with overwrite semantics. The change
    * batch here is hash-selected rows with a 10% price bump. */
  private def a42(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val updates = base
      .filter(substring(md5($"o_orderkey".cast("string")), 1, 1) === "0")
      .withColumn("o_totalprice", $"o_totalprice" * lit(1.1))
    base.join(updates.select($"o_orderkey"), Seq("o_orderkey"), "left_anti")
      .union(updates)
      .withColumn("was_updated",
        substring(md5($"o_orderkey".cast("string")), 1, 1) === "0")
      .orderBy($"o_orderkey")
  }
  private val a42Sql =
    """WITH updates AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice
      |  FROM orders WHERE SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0')
      |SELECT o_orderkey, o_custkey, o_totalprice,
      | SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0' AS was_updated
      |FROM (
      |  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
      |  UNION ALL
      |  SELECT * FROM updates) m
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- a35
  /** Sketch-based distinct counting (HLL++): approximate vs exact side by
    * side. HLL register layouts differ across engines, so the raw sketch
    * values can't hash-match — instead the query emits the EXACT counts
    * plus error-bound booleans (|approx − exact| within the configured
    * rsd's tolerance). The oracle computes the same exact counts and
    * states the bounds as `true`: a drifting sketch flips the boolean and
    * fails the hash compare, so the approximation quality itself is under
    * the oracle gate. HLL++ is deterministic for fixed data, so the
    * booleans are stable across runs/partitionings. */
  private def a35(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).agg(
      countDistinct($"l_orderkey").cast("bigint").as("exact_orders"),
      countDistinct($"l_partkey").cast("bigint").as("exact_parts"),
      approx_count_distinct($"l_orderkey").cast("bigint").as("ao"),
      approx_count_distinct($"l_partkey", 0.01).cast("bigint").as("ap"))
      .select(
        $"exact_orders", $"exact_parts",
        // tolerance = 5 × the CONFIGURED rsd (not tuned to one dataset's
        // observed error): a sketch within its contract passes at any
        // scale factor; only a genuinely broken sketch (>5σ) flips the
        // boolean. Default rsd = 0.05 → 25% bound.
        (abs($"ao" - $"exact_orders") <= $"exact_orders" * (5 * 0.05))
          .as("approx_orders_within_5rsd"),
        // rsd = 0.01 → 5% bound
        (abs($"ap" - $"exact_parts") <= $"exact_parts" * (5 * 0.01))
          .as("approx_parts_within_5rsd"))
  }
  private val a35Sql =
    """SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      | true AS approx_orders_within_5rsd,
      | true AS approx_parts_within_5rsd
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- a36
  /** Custom typed Aggregator (quantity-weighted mean price): BigDecimal
    * buffers make the merge order-independent, so even a user-defined
    * aggregation is oracle-exact. */
  private def a36(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TypedAggs.weightedMean.toColumn.name("wavg_price"))
      .toDF("l_returnflag", "wavg_price")
      .orderBy($"l_returnflag")
  }
  private val a36Sql =
    s"""SELECT l_returnflag,
       | ${dsumSql("l_extendedprice * l_quantity")} / ${dsumSql("l_quantity")} AS wavg_price
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("a23_correlated_subquery", viewsThen(a23Sql), Some(a23Sql)),
    RQ("a24_setops_all", a24, Some(a24Sql)),
    RQ("a25_cube", a25, Some(a25Sql)),
    RQ("a26_grouping_sets", a26, Some(a26Sql)),
    RQ("a27_variance_stable", a27, Some(a27Sql)),
    RQ("a28_corr_stable", a28, Some(a28Sql)),
    RQ("a29_hash_sample", a29, Some(a29Sql)),
    RQ("a30_posexplode", a30, Some(a30Sql)),
    RQ("a31_json_extract", a31, Some(a31Sql)),
    RQ("a32_asof_window", viewsThen(a32Sql), Some(a32Sql)),
    RQ("a33_range_join", a33, Some(a33Sql)),
    RQ("a34_global_rownum", a34, Some(a34Sql)),
    RQ("a35_approx_distinct", a35, Some(a35Sql)),
    RQ("a37_hash_split", a37, Some(a37Sql)),
    RQ("a38_exact_median", a38, Some(a38Sql)),
    RQ("a39_typed_cogroup", a39, Some(a39Sql)),
    RQ("a41_column_profile", a41, Some(a41Sql)),
    RQ("a42_merge_upsert", a42, Some(a42Sql)),
    RQ("a36_typed_weighted_mean", a36, Some(a36Sql)))
}
