package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Relational core (SURVEY.md §2b: S*, P*, J*, A*, W*, T*, U*, F*).
  *
  * Every query is DataFrame-API-first so Catalyst gets a declarative
  * plan (pushdown, pruning, join strategy, AQE are free), with a
  * DuckDB-SQL twin for the differential oracle.
  */
object RelationalQueries {

  /** Flagship: TPC-H Q1-style pricing summary (S1, P1-P3, A1, T1).
    * Scan → filter (pushed to parquet) → hash agg (partial/final split
    * around one shuffle on 2 low-cardinality keys) → tiny sort.
    * At 100 TB: the only shuffle moves ~|groups|×|partitions| rows.
    */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    // Price sums reach ~1e10 per group at sf0.1+, where a double's ulp
    // (~2e-6) sits inside the 4-dp rounding boundary — a parallel sum
    // can round differently than DuckDB's. Decimal sums are exact and
    // order-independent (q10/st3 pattern). Quantity/avg columns stay
    // double: quantity sums are exact integers in double, and the avg
    // magnitudes keep ulp orders below the boundary.
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 4)
          .as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double"), 4).as("sum_disc_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .cast("decimal(18,6)")).cast("double"), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** SQL-text entry path (SURVEY.md §3b Entry 2): the SAME ANSI string
    * runs through Spark's ANTLR parser over registered temp views AND
    * through DuckDB as its own oracle — differential-testing the
    * parse→analyze→optimize lifecycle, not just the DataFrame API.
    * TPC-H Q5-style local-supplier revenue.
    */
  val q5SqlEntry: Q = {
    val sql =
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
    Q("q5_sql_entry", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** Composite realism (TPC-H Q10-style): returned-item revenue by
    * customer — 3-table star join, grouped agg, order by computed
    * metric, top-k. Revenue summed as DECIMAL so the value the sort
    * key is computed from is bit-identical across engines (a double
    * sum can differ in the last ulp and flip DESC order at ties).
    */
  val q10TopReturns: Q = Q(
    "q10_top_returns",
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q3-style shipping priority: segment-filtered customers,
    * un-shipped-at-cutoff order lines, top-10 by revenue. Decimal-exact
    * revenue (the q10 pattern) so the DESC sort key is bit-identical
    * across engines. Plan: both filters push to the scans, customer is
    * the only small side (broadcast), one shuffle per fact join.
    */
  val q3ShippingPriority: Q = Q(
    "q3_shipping_priority",
    """SELECT l_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val cutoff = lit("1997-06-01 00:00:00").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q6-style forecast revenue: the pure scan-pushdown showcase —
    * three range predicates, no join, one global aggregate. The whole
    * query is a single vectorized scan with every filter in
    * PushedFilters plus a two-column ReadSchema; at 100 TB this is the
    * shape that proves pruning works (a year partition + row-group
    * statistics skip most of the table before a byte decompresses).
    */
  val q6ForecastRevenue: Q = Q(
    "q6_forecast_revenue",
    """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(
        round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,6)")).cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q17-style CORRELATED SCALAR SUBQUERY: small-quantity revenue
    * against a per-part average computed by a subquery correlated on
    * l_partkey. The plan-level point is DECORRELATION — Catalyst
    * rewrites the correlated aggregate into (lineitem ⋈ per-part
    * aggregate) on the correlation key, so it executes as ONE
    * aggregate + ONE equi join, not one subquery per outer row (the
    * per-row form would be a 60k-query disaster at any scale).
    * Decimal-exact outer sum (price magnitudes).
    */
  val q17SmallQtyRevenue: Q = {
    val sql =
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 4) AS avg_yearly
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin
    Q("q17_small_qty_revenue", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q4-style CORRELATED EXISTS: order-priority counts for orders
    * with at least one late lineitem. The EXISTS lowers to a LEFT SEMI
    * join on the correlation key — the probe side streams, the subquery
    * is never re-executed per row.
    */
  val q4OrderPriority: Q = {
    val sql =
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1994-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    Q("q4_order_priority", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q18-style IN-subquery + HAVING: customers with at least one
    * large order (aggregate-HAVING subquery feeding an IN). The IN
    * lowers to a semi join against the pre-aggregated key set.
    */
  val q18LargeOrders: Q = {
    val sql =
      """SELECT c_custkey, o_orderkey, round(sum(l_quantity), 4) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY c_custkey, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin
    Q("q18_large_orders", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(
    q1PricingSummary, q3ShippingPriority, q4OrderPriority, q5SqlEntry,
    q6ForecastRevenue, q10TopReturns, q17SmallQtyRevenue, q18LargeOrders)
}
