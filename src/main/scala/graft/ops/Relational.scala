package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{Q => RQ}
import graft.io.Tables
import Num._

/** Relational parity surface (SURVEY.md §2.1-§2.7): scans, projections,
  * scalar expressions, CASE encodings, global-max normalization, group-by
  * aggregation, the full join matrix, sorts/limits, set ops, subqueries.
  *
  * Scale notes baked into each query:
  *  - dimension sides of joins are `broadcast(...)` — at 100 TB the fact
  *    table never shuffles for a dim join;
  *  - aggregates are partial-map-side by construction (groupBy on columns);
  *  - every query ends in a deterministic ORDER BY only because the oracle
  *    hash-compare needs total order — callers composing these operators
  *    get the unordered (shuffle-free) form.
  */
object Relational {

  /** Oracle-side spelling of Num.dsum / Num.davg (see Num.scala). */
  private def dsumSql(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"
  private def davgSql(x: String) = s"${dsumSql(x)} / COUNT($x)"
  private val Dec = DecimalType(38, 6)

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1 shape: scan → filter → groupBy → 8 aggregates. The core
    * "pricing summary" pattern: map-side partial aggregation collapses
    * 6G rows to 6 groups before the (tiny) shuffle. */
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).cast("bigint").as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | ${dsumSql("l_extendedprice")} AS sum_base_price,
       | ${dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS sum_disc_price,
       | ${dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax)")} AS sum_charge,
       | ${davgSql("l_quantity")} AS avg_qty,
       | ${davgSql("l_extendedprice")} AS avg_price,
       | ${davgSql("l_discount")} AS avg_disc,
       | CAST(COUNT(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** The reference's flagship semantics (ref `spark/jobs/pr-wallet-data-tf.py:76-120`)
    * re-expressed on lineitem: max-scaling normalization (P2-P4), CASE label
    * encodings (P5-P6), date-part features (P7). The 10 scalar subqueries of
    * the reference collapse to ONE global aggregate + a broadcast cross join
    * (SURVEY.md §4.3(b)) — one scan instead of eleven. */
  private def q02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val mx = li.agg(
      max($"l_extendedprice").as("mx_price"),
      max(abs($"l_quantity")).as("mx_qty"),
      max($"l_partkey").as("mx_part"))
    li.crossJoin(broadcast(mx))
      .select(
        $"l_orderkey",
        $"l_linenumber".cast("bigint").as("l_linenumber"),
        safeDiv($"l_extendedprice", $"mx_price").as("p_price"),
        safeDiv(abs($"l_quantity"), $"mx_qty").as("p_qty"),
        safeDiv($"l_partkey", $"mx_part").as("p_part"),
        when(lower($"l_returnflag") === "r", 1)
          .when(lower($"l_returnflag") === "a", 2)
          .when(lower($"l_returnflag") === "n", 3)
          .otherwise(0).cast("bigint").as("p_flag"),
        when($"l_quantity" >= 40, 2)
          .when($"l_quantity" >= 20, 1)
          .otherwise(0).cast("bigint").as("p_qty_bucket"),
        (dayofmonth($"l_shipdate") / lit(30.0)).as("p_ship_day"),
        (month($"l_shipdate") / lit(12.0)).as("p_ship_month"),
        (year($"l_shipdate") / lit(2000.0)).as("p_ship_year"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  private val q02Sql =
    """SELECT l_orderkey,
      | CAST(l_linenumber AS BIGINT) AS l_linenumber,
      | l_extendedprice / NULLIF((SELECT MAX(l_extendedprice) FROM lineitem), 0) AS p_price,
      | ABS(l_quantity) / NULLIF((SELECT MAX(ABS(l_quantity)) FROM lineitem), 0) AS p_qty,
      | l_partkey / NULLIF((SELECT MAX(l_partkey) FROM lineitem), 0) AS p_part,
      | CAST(CASE WHEN LOWER(l_returnflag)='r' THEN 1 WHEN LOWER(l_returnflag)='a' THEN 2
      |           WHEN LOWER(l_returnflag)='n' THEN 3 ELSE 0 END AS BIGINT) AS p_flag,
      | CAST(CASE WHEN l_quantity >= 40 THEN 2 WHEN l_quantity >= 20 THEN 1 ELSE 0 END AS BIGINT) AS p_qty_bucket,
      | CAST(DAY(l_shipdate) AS DOUBLE) / 30 AS p_ship_day,
      | CAST(MONTH(l_shipdate) AS DOUBLE) / 12 AS p_ship_month,
      | CAST(YEAR(l_shipdate) AS DOUBLE) / 2000 AS p_ship_year
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Ungrouped global aggregates (operator A1/A2): one partial-agg pass,
    * single-row exchange — the right plan for "global MAX" at any scale. */
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).cast("bigint").as("n_rows"),
      countDistinct($"l_orderkey").cast("bigint").as("n_orders"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      max(abs($"l_quantity")).as("max_abs_qty"),
      dsum($"l_extendedprice").as("sum_price"),
      davg($"l_discount").as("avg_disc"),
      min($"l_shipdate").as("min_ship"),
      max($"l_shipdate").as("max_ship"))
  }
  private val q03Sql =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       | CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       | MIN(l_quantity) AS min_qty,
       | MAX(l_quantity) AS max_qty,
       | MAX(ABS(l_quantity)) AS max_abs_qty,
       | ${dsumSql("l_extendedprice")} AS sum_price,
       | ${davgSql("l_discount")} AS avg_disc,
       | MIN(l_shipdate) AS min_ship,
       | MAX(l_shipdate) AS max_ship
       |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Fact ⋈ broadcast dim + aggregate: the canonical star-join. customer is
    * tiny relative to orders at every SF → broadcast, no shuffle of orders. */
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).cast("bigint").as("n_orders"),
        dsum($"o_totalprice").as("revenue"),
        davg($"o_totalprice").as("avg_price"))
      .orderBy($"c_mktsegment")
  }
  private val q04Sql =
    s"""SELECT c_mktsegment,
       | CAST(COUNT(*) AS BIGINT) AS n_orders,
       | ${dsumSql("o_totalprice")} AS revenue,
       | ${davgSql("o_totalprice")} AS avg_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5 shape: 5-way join (fact + 4 broadcast dims) with filters that
    * push into the parquet scans, revenue per nation. */
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  private val q05Sql =
    s"""SELECT n_name,
       | ${dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
       |FROM lineitem
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       | JOIN nation ON s_nationkey = n_nationkey
       | JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       | AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Left-semi join ≙ EXISTS: customers having at least one finished order.
    * Semi joins never duplicate rows, so no post-dedup shuffle. */
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Left-anti join ≙ NOT EXISTS: customers with no purchase events ≥ 300. */
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter($"o_totalprice" > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }
  private val q07Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > CAST(400000.0 AS DOUBLE))
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Left-outer join with null-group handling: per-customer order counts
    * including order-less customers (COUNT over the null column → 0). */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        count($"o_orderkey").cast("bigint").as("n_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("total_spent"))
      .orderBy($"c_custkey")
  }
  private val q08Sql =
    s"""SELECT c_custkey, c_name,
       | CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       | COALESCE(${dsumSql("o_totalprice")}, CAST(0.0 AS DOUBLE)) AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_name
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Ranking window + filter = top-N per group, the scalable "greatest K per
    * key" (no global sort; one hash-partitioned sort per key group). */
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }
  private val q09Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Frame windows: running sum (exact decimal accumulation → bit-stable
    * regardless of the engine's window-agg algorithm), lag/lead, row_number. */
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        $"user_id", $"event_id", $"ts", $"value",
        sum($"value".cast(Dec)).over(wf).cast(DoubleType).as("running_value"),
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        row_number().over(w).cast("bigint").as("seq"))
      .orderBy($"user_id", $"seq")
  }
  private val q10Sql =
    """SELECT user_id, event_id, ts, value,
      | CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      | LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      | LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      | CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
      |FROM events
      |ORDER BY user_id, seq""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Global top-K: ORDER BY + LIMIT plans as TakeOrderedAndProject — each
    * partition keeps K rows, driver merges; no full sort at scale. Unique
    * tie-break key keeps the result deterministic across engines. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }
  private val q11Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Set operators: UNION (distinct), INTERSECT, EXCEPT — symmetric
    * difference of two customer key sets. */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val b = c.filter($"c_acctbal" > 5000.0).select($"c_custkey")
    a.union(b).distinct()
      .except(a.intersect(b))
      .orderBy($"c_custkey")
  }
  private val q12Sql =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT c_custkey FROM customer WHERE c_acctbal > CAST(5000.0 AS DOUBLE))
      |EXCEPT
      |(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | INTERSECT
      | SELECT c_custkey FROM customer WHERE c_acctbal > CAST(5000.0 AS DOUBLE))
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** DISTINCT projection (dedup of a 2-column key space). */
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_linestatus").distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q13Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q14
  /** GROUP BY + HAVING (post-aggregation filter). */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
        dsum($"o_totalprice").as("spent"))
      .filter($"n_orders" >= 12)
      .orderBy($"o_custkey")
  }
  private val q14Sql =
    s"""SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       | ${dsumSql("o_totalprice")} AS spent
       |FROM orders GROUP BY o_custkey
       |HAVING CAST(COUNT(*) AS BIGINT) >= 12
       |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Datetime kernel (operator P7 generalized): extraction, truncation,
    * arithmetic, formatting. Engine quirks pinned: Spark DAYOFWEEK is
    * 1=Sunday, DuckDB dayofweek is 0=Sunday (+1 aligns); Spark
    * datediff(end,start) vs DuckDB datediff('day',start,end). */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("bigint").as("yr"),
        quarter($"o_orderdate").cast("bigint").as("qtr"),
        month($"o_orderdate").cast("bigint").as("mo"),
        dayofmonth($"o_orderdate").cast("bigint").as("dom"),
        dayofweek($"o_orderdate").cast("bigint").as("dow"),
        date_trunc("month", $"o_orderdate").cast("timestamp_ntz").as("month_start"),
        add_months($"o_orderdate".cast("date"), 1).cast("timestamp_ntz").as("next_month"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
          .cast("bigint").as("days_since_epoch0"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("iso_day"))
      .orderBy($"o_orderkey")
  }
  private val q15Sql =
    """SELECT o_orderkey,
      | CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
      | CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
      | CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
      | CAST(DAY(o_orderdate) AS BIGINT) AS dom,
      | CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow,
      | DATE_TRUNC('month', o_orderdate) AS month_start,
      | CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS next_month,
      | CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch0,
      | STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** String kernel (operator P8 generalized): case, substring, length,
    * concat, replace, pad, position, LIKE pushdown. */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_name".like("%widget%"))
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        lower($"p_brand").as("lbrand"),
        substring($"p_name", 1, 5).as("prefix5"),
        length($"p_name").cast("bigint").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "widget", "gadget").as("renamed"),
        lpad($"p_partkey".cast("string"), 10, "0").as("padded_key"),
        instr($"p_name", "widget").cast("bigint").as("widget_pos"))
      .orderBy($"p_partkey")
  }
  private val q16Sql =
    """SELECT p_partkey,
      | UPPER(p_name) AS uname,
      | LOWER(p_brand) AS lbrand,
      | SUBSTRING(p_name, 1, 5) AS prefix5,
      | CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      | CONCAT_WS('|', p_brand, p_type) AS brand_type,
      | REPLACE(p_name, 'widget', 'gadget') AS renamed,
      | LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
      | CAST(STRPOS(p_name, 'widget') AS BIGINT) AS widget_pos
      |FROM part WHERE p_name LIKE '%widget%'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Uncorrelated scalar subquery (operator A1 — the reference's one
    * interesting construct) via spark.sql; the SQL text is ANSI enough to
    * be its own oracle. */
  private val q17Sql =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) FROM part)
      |ORDER BY p_partkey""".stripMargin
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(q17Sql)
  }

  // ---------------------------------------------------------------- q18
  /** IN / NOT IN subqueries (plan as semi/anti joins). */
  private val q18Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      |ORDER BY o_orderkey""".stripMargin
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(q18Sql)
  }

  // ---------------------------------------------------------------- q19
  /** ROLLUP grouping sets with GROUPING() disambiguation. */
  private val q19Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(q19Sql)
  }

  // ---------------------------------------------------------------- q20
  /** PIVOT: wide conditional aggregation (oracle spells it as CASE sums). */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum($"l_quantity"))
      .orderBy($"l_linestatus")
  }
  private val q20Sql =
    """SELECT l_linestatus,
      | CAST(SUM(CAST(CASE WHEN l_returnflag='A' THEN l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS "A",
      | CAST(SUM(CAST(CASE WHEN l_returnflag='N' THEN l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS "N",
      | CAST(SUM(CAST(CASE WHEN l_returnflag='R' THEN l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS "R"
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q21
  /** NULL kernel: NULLIF-style nulling, COALESCE, null-safe equality
    * (Spark <=> ≙ DuckDB IS NOT DISTINCT FROM). */
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val posBal = when($"c_acctbal" < 0, lit(null)).otherwise($"c_acctbal")
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        posBal.as("pos_bal"),
        coalesce(posBal, lit(0.0)).as("bal_or_zero"),
        ($"c_acctbal" <=> posBal).as("bal_unchanged"),
        isnull(posBal).as("was_negative"))
      .orderBy($"c_custkey")
  }
  private val q21Sql =
    """SELECT c_custkey,
      | CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal,
      | COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, CAST(0.0 AS DOUBLE)) AS bal_or_zero,
      | c_acctbal IS NOT DISTINCT FROM (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) AS bal_unchanged,
      | (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS was_negative
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q22
  /** CASE range-bucketing + count per bucket (operator P6 shape). */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(
        when($"value" >= 100, 2).when($"value" >= 10, 1).otherwise(0)
          .cast("bigint").as("value_bucket"))
      .groupBy($"value_bucket")
      .agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy($"value_bucket")
  }
  private val q22Sql =
    """SELECT CAST(CASE WHEN value >= 100 THEN 2 WHEN value >= 10 THEN 1 ELSE 0 END AS BIGINT) AS value_bucket,
      | CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY 1 ORDER BY value_bucket""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("q01_pricing_summary", q01, Some(q01Sql), bench = true),
    RQ("q02_maxscale_features", q02, Some(q02Sql), bench = true),
    RQ("q03_global_stats", q03, Some(q03Sql)),
    RQ("q04_star_join_agg", q04, Some(q04Sql), bench = true),
    RQ("q05_multiway_join", q05, Some(q05Sql), bench = true),
    RQ("q06_semi_join", q06, Some(q06Sql)),
    RQ("q07_anti_join", q07, Some(q07Sql)),
    RQ("q08_outer_join_agg", q08, Some(q08Sql)),
    RQ("q09_window_topn", q09, Some(q09Sql), bench = true),
    RQ("q10_window_running", q10, Some(q10Sql)),
    RQ("q11_global_topk", q11, Some(q11Sql)),
    RQ("q12_set_ops", q12, Some(q12Sql)),
    RQ("q13_distinct", q13, Some(q13Sql)),
    RQ("q14_having", q14, Some(q14Sql)),
    RQ("q15_datetime_kernel", q15, Some(q15Sql)),
    RQ("q16_string_kernel", q16, Some(q16Sql)),
    RQ("q17_scalar_subquery", q17, Some(q17Sql)),
    RQ("q18_in_subquery", q18, Some(q18Sql)),
    RQ("q19_rollup", q19, Some(q19Sql)),
    RQ("q20_pivot", q20, Some(q20Sql)),
    RQ("q21_null_kernel", q21, Some(q21Sql)),
    RQ("q22_case_bucket", q22, Some(q22Sql)))
}
