package graft.queries

import graft.{Q, Tables}

/** TPC-H-derived flagship queries 2/2 (SURVEY.md §2b composite realism
  * rows; complements q1..q18 in [[RelationalQueries]] — together the
  * full 22-query shape battery: every TPC-H query's join/subquery
  * structure is represented here or there). Each is adapted
  * to the driver schema (TESTDATA.md — no partsupp table, no
  * l_commitdate/l_receiptdate/c_phone columns), keeps the join/subquery
  * SHAPE of its TPC-H ancestor, and runs the same ANSI string through
  * Spark's parser and DuckDB for the differential oracle.
  *
  * Determinism: money aggregates are summed as DECIMAL(18,6) (exact,
  * order-independent) then cast to double and rounded to 4 dp in BOTH
  * dialects; every result ends in a total ORDER BY.
  *
  * Scale notes per query are on each val — the common theme: the big
  * fact (lineitem) is filtered at the scan, dimensions broadcast, and
  * the only wide shuffles are the final group-bys on low-cardinality
  * keys. AQE handles the one genuinely data-dependent choice
  * (semi-join build sides).
  */
object FlagshipQueries {

  private def decSum(expr: String): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(18,6))) AS DOUBLE), 4)"

  /** TPC-H Q7 (volume shipping): revenue flow between two nations by
    * ship year. Shape: lineitem ⋈ supplier ⋈ orders ⋈ customer ⋈
    * nation×2 with a symmetric pair predicate. At scale the two nation
    * joins broadcast (25 rows), supplier/customer broadcast or shuffle
    * by AQE stats, and the pair filter prunes before the group-by; the
    * final agg groups on (nation, nation, year) — tiny.
    */
  val q7VolumeShipping: Q = {
    val sql =
      s"""SELECT supp_nation, cust_nation, l_year, ${decSum("volume")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS INT) AS l_year,
         |         l_extendedprice * (1 - l_discount) AS volume
         |  FROM supplier
         |  JOIN lineitem ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    Q("q7_volume_shipping", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q8 (national market share): one nation's share of EUROPE
    * PROMO-part revenue by order year. The share is a ratio of two
    * decimal-exact sums — both engines divide the same doubles, so the
    * 4-dp round is stable. Shape note: part is filtered BEFORE its join
    * (type = 'PROMO' prunes ~5/6 of the build side), region filter
    * reaches nation through the join — at 100 TB the lineitem probe is
    * the only full-fact scan.
    */
  val q8MarketShare: Q = {
    val sql =
      """SELECT o_year,
        |  round(CAST(sum(CASE WHEN nation = 'NATION_3'
        |                      THEN CAST(volume AS DECIMAL(18,6))
        |                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |        / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 4) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin
    Q("q8_market_share", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q9 (product-type profit) adapted: no partsupp, so supply
    * cost is modeled as 60% of p_retailprice. Profit by supplier nation
    * × order year for green-named parts. The p_name LIKE filter is a
    * scan-level prune on the (small) part table; lineitem only carries
    * 5 columns through the join (column pruning does the rest).
    */
  val q9ProductProfit: Q = {
    val sql =
      s"""SELECT nation, o_year, ${decSum("amount")} AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |         l_extendedprice * (1 - l_discount)
         |           - 0.6 * p_retailprice * l_quantity AS amount
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin
    Q("q9_product_profit", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q14 (promotion effect): PROMO share of one month's revenue.
    * Single broadcast join + global agg — the classic
    * filter-pushdown-then-broadcast shape; the month filter must reach
    * the parquet scan (asserted in FlagshipSpec).
    */
  val q14PromoRevenue: Q = {
    val sql =
      """SELECT round(
        |    100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        |    4) AS promo_revenue_pct
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin
    Q("q14_promo_revenue", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q15 (top supplier): quarter revenue per supplier via a CTE,
    * then the max picked by an (uncorrelated) scalar subquery over the
    * same CTE. Ties broken by an explicit suppkey ORDER BY. Exercises
    * CTE reuse + scalar-subquery planning in both engines.
    */
  val q15TopSupplier: Q = {
    val sql =
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         |           AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin
    Q("q15_top_supplier", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q16 (supplier-part relationship counts) adapted: partsupp →
    * the observed supplier×part pairs in lineitem. count(DISTINCT) over
    * a filtered join, grouped by 3 part attributes, with a NOT-IN
    * dimension exclusion (anti join). Descending count order with full
    * key tiebreak keeps the hash stable.
    */
  val q16SupplierCnt: Q = {
    val sql =
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_type NOT IN ('ECONOMY', 'STANDARD')
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 25""".stripMargin
    Q("q16_supplier_cnt", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicate): an
    * OR-of-ANDs across both join sides. The planner must (a) still
    * broadcast part, (b) push the common `l_quantity` bounds and each
    * side's single-table conjuncts to the scans, and (c) evaluate the
    * residual OR post-join. The per-branch part-side predicates
    * (brand × size) do prune the build side via constraint inference.
    */
  val q19DisjunctiveRevenue: Q = {
    val sql =
      s"""SELECT ${decSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |       count(*) AS n_items
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin
    Q("q19_disjunctive_revenue", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q22 (global sales opportunity) adapted: c_phone country
    * codes → nations. Customers with above-average positive balance and
    * no RECENT orders (every synthetic customer has some order, so the
    * anti side is date-restricted): an uncorrelated scalar subquery
    * (broadcast single-row)
    * + correlated NOT EXISTS (anti join on o_custkey), grouped by
    * nation. The anti join build side is the orders key set — at scale
    * AQE picks shuffle vs broadcast from its actual size.
    */
  val q22SalesOpportunity: Q = {
    val sql =
      s"""SELECT n_name,
         |       count(*) AS numcust,
         |       ${decSum("c_acctbal")} AS totacctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin
    Q("q22_sales_opportunity", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q20 (potential part promotion) adapted: partsupp.availqty →
    * shipped quantity from lineitem. Suppliers who moved an
    * above-median volume of red parts in 1997, by nation. Shape: IN-subquery whose body is a
    * join + grouped HAVING aggregate — the subquery reduces to a small
    * key set BEFORE touching supplier (semi join), and the part filter
    * prunes the fact scan's build side.
    */
  val q20PromotionSuppliers: Q = {
    val sql =
      s"""SELECT s_name, n_name,
         |       round(s_acctbal, 4) AS acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_name LIKE '%red%'
         |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY l_suppkey
         |  HAVING sum(l_quantity) > 289)
         |ORDER BY s_name""".stripMargin
    Q("q20_promotion_suppliers", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q2 (minimum-cost supplier) adapted: no partsupp, so the
    * supplier×part relation is DERIVED from lineitem — per-(part,
    * supplier) minimum observed unit price stands in for ps_supplycost.
    * The shape is the point of Q2: a correlated scalar subquery whose
    * body is itself a 4-table join (min cost among the part's suppliers
    * WITHIN the region), equality-joined back to the outer row. Spark
    * decorrelates it to one aggregate + one equi join; the CTE is the
    * same text in both engines so the derived costs are bit-identical
    * doubles (min of per-row divisions — no reassociation). At scale:
    * the CTE is a map-side-combinable agg over the fact, everything
    * downstream joins small dimensions (supplier 10k/TB, nation,
    * region broadcast).
    */
  val q2MinCostSupplier: Q = {
    val sql =
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem
        |  GROUP BY l_partkey, l_suppkey
        |)
        |SELECT round(s_acctbal, 4) AS s_acctbal, s_name, n_name,
        |       p_partkey, p_brand, round(ps_supplycost, 4) AS supplycost
        |FROM part
        |JOIN ps ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_type = 'LARGE' AND r_name = 'ASIA'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin
    Q("q2_min_cost_supplier", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q11 (important stock) adapted: part "value" = decimal-exact
    * revenue its suppliers in one nation moved, kept if above a fixed
    * fraction of the nation total. Shape: grouped agg + HAVING against
    * an UNCORRELATED scalar subquery re-aggregating the same relation
    * (planned once, broadcast as a single row). The nation filter
    * reduces suppliers ~25× before the fact join probes.
    */
  val q11ImportantParts: Q = {
    val sql =
      """SELECT l_partkey,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4)
        |         AS part_value
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_13'
        |GROUP BY l_partkey
        |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) > (
        |  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) * 0.001
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_13')
        |ORDER BY part_value DESC, l_partkey""".stripMargin
    Q("q11_important_parts", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q12 (shipping priority by mode) adapted: no l_shipmode /
    * l_commitdate / l_receiptdate, so "mode" is the return flag and
    * "late" is shipping >60 days after the order date. The shape is
    * Q12's: fact⋈fact join (orders⋈lineitem), a date-window scan
    * filter, and the dual conditional aggregate splitting one pass by
    * priority class. The interval predicate is a post-join residual
    * (it references both sides); the year window pushes to the
    * lineitem scan.
    */
  val q12LateShipments: Q = {
    val sql =
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    Q("q12_late_shipments", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q13 (customer order-count distribution) adapted: the
    * o_comment NOT LIKE exclusion becomes a priority exclusion (any
    * non-trivial join-side predicate preserves the shape). Two-level
    * aggregation over a LEFT OUTER join — customers with zero
    * qualifying orders MUST surface in the c_count=0 bucket, which is
    * exactly what an inner join would lose. At scale the first agg
    * shuffles on c_custkey (same key as the join — one exchange), the
    * second on the tiny count domain.
    */
  val q13OrderDistribution: Q = {
    val sql =
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin
    Q("q13_order_distribution", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  /** TPC-H Q21 (suppliers who kept orders waiting) adapted: "late" =
    * shipped >60 days after order date (no receipt/commit dates). The
    * full Q21 correlation battery survives: for finished orders where
    * THIS supplier shipped late, EXISTS another supplier on the same
    * order (multi-supplier order) and NOT EXISTS another supplier who
    * was ALSO late — i.e. this supplier alone held the order up. Spark
    * plans the pair as a left-semi + left-anti join on l_orderkey;
    * both probe sides are the already-filtered l1 rows, and the
    * EXISTS sides are map-side-prunable distinct key sets.
    */
  val q21WaitingSuppliers: Q = {
    val sql =
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND n_name = 'NATION_13'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL '60' DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin
    Q("q21_waiting_suppliers", sql) { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(
    q2MinCostSupplier, q7VolumeShipping, q8MarketShare, q9ProductProfit,
    q11ImportantParts, q12LateShipments, q13OrderDistribution,
    q14PromoRevenue, q15TopSupplier, q16SupplierCnt,
    q19DisjunctiveRevenue, q20PromotionSuppliers, q21WaitingSuppliers,
    q22SalesOpportunity)
}
