package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Join family (SURVEY.md §2b J1–J9).
  *
  * Scale discipline: dimension tables (region/nation/supplier at any sf)
  * are explicitly `broadcast()`-ed so the fact scan never shuffles for
  * them; fact⋈fact joins (orders⋈lineitem) shuffle once on the join key
  * and AQE picks sort-merge vs shuffled-hash at runtime. Non-equi
  * conditions always ride on an equi key (residual predicates), never a
  * bare nested-loop over the fact table.
  */
object JoinQueries {

  /** J1: star join fact→dims, every dim broadcast. Revenue by nation in ASIA.
    * At 100 TB: lineitem never shuffles — three broadcast hash joins then
    * one shuffle for the 25-group aggregate.
    */
  val j1BroadcastStar: Q = Q(
    "j1_broadcast_star",
    """SELECT n_name,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir).select("l_suppkey", "l_extendedprice", "l_discount")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA").select("r_regionkey")
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** J2: large⋈large equi join (orders⋈lineitem). One shuffle each side on
    * the join key; AQE chooses sort-merge/shuffled-hash. At 100 TB this is
    * the join to co-locate via bucketing on orderkey.
    */
  val j2ShuffleJoin: Q = Q(
    "j2_shuffle_join",
    """SELECT o_orderpriority,
      |  count(DISTINCT o_orderkey) AS n_orders,
      |  count(*) AS n_items,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    // Decimal-exact revenue (q10/st3 pattern): at sf0.1 this group's sum
    // reaches ~6e9 where a double's ulp (~1e-6) sits inside the 4-dp
    // rounding boundary — parallel summation order flipped the last
    // rounded digit vs DuckDB (caught by the sf0.1 oracle run).
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double"), 4).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** J3: left outer join with null-extension (customers with zero orders kept). */
  val j3LeftOuter: Q = Q(
    "j3_left_outer",
    """SELECT c_mktsegment,
      |  count(DISTINCT c_custkey) AS n_customers,
      |  count(o_orderkey) AS n_orders,
      |  count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_orderless
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"),
        countDistinct(when(col("o_orderkey").isNull, col("c_custkey"))).as("n_orderless"))
      .orderBy(col("c_mktsegment"))
  }

  /** J3 (full outer): daily 2001 order counts ⟗ daily event counts. The two
    * date domains are disjoint, so every row is null-extended on one side —
    * exercises coalesce-on-key USING semantics.
    */
  val j3FullOuter: Q = Q(
    "j3_full_outer",
    """SELECT day,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(n_events, 0) AS n_events
      |FROM (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day, count(*) AS n_orders
      |      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' GROUP BY 1) o
      |FULL OUTER JOIN
      |     (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_events
      |      FROM events GROUP BY 1) e
      |USING (day)
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    val od = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val ev = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    od.join(ev, Seq("day"), "full_outer")
      .select(
        col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("day"))
  }

  /** J4: left-semi join (EXISTS) — customers having ≥1 urgent order. */
  val j4SemiJoin: Q = Q(
    "j4_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** J5: left-anti join (NOT EXISTS) — customers with no finished ('F')
    * order, by nation.
    */
  val j5AntiJoin: Q = Q(
    "j5_anti_join",
    """SELECT n_name,
      |  count(*) AS n_customers,
      |  round(sum(c_acctbal), 4) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey", "c_acctbal")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_custkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 4).as("total_acctbal"))
      .orderBy(col("n_name"))
  }

  /** J6: theta join — equi key + non-equi residual (`l_shipdate > o_orderdate`).
    * Residual-on-equi keeps the plan a hash/merge join at any scale (never a
    * nested loop over the fact table).
    */
  val j6ThetaJoin: Q = Q(
    "j6_theta_join",
    """SELECT o_orderpriority,
      |  count(*) AS n_late_ship,
      |  round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_lag_days
      |FROM orders JOIN lineitem
      |  ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_shipdate") > o("o_orderdate"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_late_ship"),
        round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4).as("avg_lag_days"))
      .orderBy(col("o_orderpriority"))
  }

  /** J7: range/interval join via pre-bucketing — each event joined to its
    * hour bucket's aggregate (the scalable rewrite of `ts BETWEEN hour_start
    * AND hour_end`: both sides bucketed by `date_trunc`, equi join on the
    * bucket, no interval nested-loop).
    */
  val j7RangeBucketJoin: Q = Q(
    "j7_range_bucket_join",
    """WITH ev AS (SELECT event_type, value, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr FROM events),
      |hourly AS (SELECT hr, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS hr_avg
      |           FROM ev GROUP BY hr)
      |SELECT event_type,
      |  count(*) AS n_above,
      |  round(avg(value), 4) AS avg_above
      |FROM ev JOIN hourly USING (hr)
      |WHERE value > hr_avg
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), date_trunc("hour", col("ts")).as("hr"))
    // Decimal-exact mean: a double avg() differs in the last ulp with
    // parallel summation order, and `value > hr_avg` membership of a row
    // within an ulp of the mean would flip between engines/runs. The
    // decimal sum is exact and order-independent; double divide of two
    // identical operands is deterministic in both dialects (st3 pattern).
    val hourly = ev.groupBy(col("hr")).agg(
      (sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("hr_avg"))
    ev.join(hourly, Seq("hr"))
      .filter(col("value") > col("hr_avg"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_above"), round(avg(col("value")), 4).as("avg_above"))
      .orderBy(col("event_type"))
  }

  /** J10: salted skew join (graft.operators.SkewOps) — the manual
    * hot-key remedy: events salted 8 ways on user_id, customer
    * replicated ×8, equi join on (key, salt). Output is provably
    * identical to the plain join (each row matches exactly one
    * replica), so the oracle is the UNSALTED SQL — the salting is pure
    * physical-plan surgery, which is the point.
    */
  val j10SaltedSkewJoin: Q = Q(
    "j10_salted_skew_join",
    """SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.operators.SkewOps.saltedInnerJoin(ev, cust, "user_id", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** J8: as-of join (custom composition, SURVEY §2b J8) — for each event,
    * the latest order of that user at event time: equi join on user key +
    * `o_orderdate <= ts` residual, then ARGMAX by recency via
    * `max(struct(date, key, price))` (lexicographic struct max ≡
    * `row_number() = 1 ORDER BY date DESC, key DESC`). The aggregate
    * form beats the window form at scale: every (event, earlier-order)
    * pair collapses in the map-side PARTIAL aggregate — the pairs for
    * one event all live in the join's output partition (an event has
    * one user, the join hashes on the user key), so the post-join
    * shuffle carries one row per event instead of every pair, and no
    * per-group sort runs at all. The 10× scale spot measured the
    * window form as the suite's worst ratio; the argmax form ships
    * orders-per-user× less shuffle data.
    */
  val j8AsofJoin: Q = Q(
    "j8_asof_join",
    """WITH ranked AS (
      |  SELECT e.event_id, e.event_type, o.o_totalprice,
      |    row_number() OVER (PARTITION BY e.event_id
      |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |SELECT event_type,
      |  count(*) AS n_matched,
      |  round(avg(o_totalprice), 4) AS avg_latest_price
      |FROM ranked WHERE rn = 1
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val e = Tables.events(spark, dir).select("event_id", "ts", "user_id", "event_type")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    e.join(o, o("o_custkey") === e("user_id") && o("o_orderdate") <= e("ts"))
      .groupBy(col("event_id"), col("event_type"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
        .as("best"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_matched"),
        round(avg(col("best.o_totalprice")), 4).as("avg_latest_price"))
      .orderBy(col("event_type"))
  }

  /** J9: cross join — bounded sides only (5×5 regions). */
  val j9CrossJoin: Q = Q(
    "j9_cross_join",
    """SELECT a.r_name AS r1, b.r_name AS r2
      |FROM region a CROSS JOIN region b
      |ORDER BY r1, r2""".stripMargin) { (spark, dir) =>
    val a = Tables.region(spark, dir).select(col("r_name").as("r1"))
    val b = Tables.region(spark, dir).select(col("r_name").as("r2"))
    a.crossJoin(b).orderBy(col("r1"), col("r2"))
  }

  /** J11: LATERAL (correlated) join — each outer customer row drives a
    * dependent subquery (its top-2 orders by price). Catalyst
    * DECORRELATES this into a ranked window over the inner side joined
    * back on the correlation key — one window + one join, never a
    * per-outer-row re-execution. The SQL-surface twin of the T5
    * top-k-per-group operator.
    */
  val j11LateralJoin: Q = {
    val sql =
      """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 4) AS price
        |FROM customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice
        |           FROM orders
        |           WHERE o_custkey = c.c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey
        |           LIMIT 2) t
        |WHERE c.c_custkey < 30
        |ORDER BY c.c_custkey, price DESC, t.o_orderkey""".stripMargin
    Q("j11_lateral_join", sql) { (spark, dir) =>
      graft.Tables.registerAll(spark, dir)
      spark.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(
    j1BroadcastStar, j2ShuffleJoin, j3LeftOuter, j3FullOuter, j4SemiJoin,
    j5AntiJoin, j6ThetaJoin, j7RangeBucketJoin, j8AsofJoin, j9CrossJoin,
    j10SaltedSkewJoin, j11LateralJoin)
}
