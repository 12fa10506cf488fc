package graft.queries

import graft.{Q, Tables}
import graft.functions.WeightedMean
import org.apache.spark.sql.functions._

/** Aggregate family (SURVEY.md §2b A2–A9).
  *
  * Every aggregate here is algebraic (partial→final split around one
  * shuffle); distinct aggregates expand then re-shuffle on (key, value) —
  * both are the plans you want at 100 TB. `approx_count_distinct` is the
  * constant-memory HLL path for high-cardinality keys.
  */
object AggregateQueries {

  /** A2: global (ungrouped) aggregate — single output row, map-side partials. */
  val a2GlobalAgg: Q = Q(
    "a2_global_agg",
    """SELECT count(*) AS n_rows,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(min(l_discount), 4) AS min_disc,
      |  round(max(l_tax), 4) AS max_tax,
      |  min(l_shipdate) AS first_ship,
      |  max(l_shipdate) AS last_ship
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("l_quantity")), 4).as("sum_qty"),
      round(avg(col("l_extendedprice")), 4).as("avg_price"),
      round(min(col("l_discount")), 4).as("min_disc"),
      round(max(col("l_tax")), 4).as("max_tax"),
      min(col("l_shipdate")).as("first_ship"),
      max(col("l_shipdate")).as("last_ship"))
  }

  /** A3: distinct aggregates — Catalyst expands to a two-phase plan
    * (distinct on (group, value) then final agg); no driver collection.
    */
  val a3DistinctAgg: Q = Q(
    "a3_distinct_agg",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  round(sum(DISTINCT l_quantity), 4) AS sum_dist_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        round(sum_distinct(col("l_quantity")), 4).as("sum_dist_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** A4: DISTINCT rows (set semantics) — hash aggregate on all columns. */
  val a4DistinctRows: Q = Q(
    "a4_distinct_rows",
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A5: rollup with grouping markers — multi-level subtotals in one pass
    * (Spark expands grouping sets map-side; one shuffle).
    */
  val a5Rollup: Q = Q(
    "a5_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(
        col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** A5b: CUBE — all 2ⁿ grouping-set combinations in one pass (rollup
    * emits only the n+1 prefix sets; cube adds the cross-slices, e.g.
    * per-linestatus totals across return flags). Same one-shuffle
    * expand plan.
    */
  val a5bCube: Q = Q(
    "a5b_cube",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(
        col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** A6: HLL approximate distinct. The raw estimate is engine-specific
    * (sketch internals differ), so the ORACLE-VISIBLE columns are the
    * exact count plus `within_bounds` = |approx−exact|/exact ≤ 3·rsd —
    * the HLL accuracy contract itself, checkable by DuckDB emitting the
    * same exact count and a constant `true`. A broken sketch flips the
    * boolean and the hash. (Distribution-level accuracy is additionally
    * law-tested in AggregateSpec.) This is the 100 TB path for
    * COUNT(DISTINCT) over high-cardinality keys: constant memory per
    * group, no expand.
    */
  val a6ApproxDistinct: Q = Q(
    "a6_approx_distinct",
    """SELECT event_type,
      |  count(DISTINCT user_id) AS exact_users,
      |  true AS within_bounds
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) /
          greatest(col("exact_users"), lit(1L)) <= lit(0.06)).as("within_bounds"))
      .orderBy(col("event_type"))
  }

  /** A7: exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). At true 100 TB scale swap to `percentile_approx`
    * (t-digest, mergeable); the exact form is kept here because the oracle
    * compares exact values.
    */
  val a7Quantiles: Q = Q(
    "a7_quantiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  /** A8: collect aggregates — set collected then sorted so the result is
    * deterministic (collect_list order is partition-dependent; never expose
    * it unsorted).
    */
  val a8CollectAgg: Q = Q(
    "a8_collect_agg",
    """SELECT l_returnflag,
      |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      |  count(DISTINCT l_linestatus) AS n_statuses
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))
      .orderBy(col("l_returnflag"))
  }

  /** A9/X2: custom typed UDAF (graft.functions.WeightedMean) — buffer
    * (Σ v·w, Σ w) merges associatively, so Spark runs it partial→final
    * around the shuffle exactly like a built-in.
    */
  val a9WeightedMean: Q = Q(
    "a9_weighted_mean",
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
      |  round(sum(l_quantity), 4) AS total_weight
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(WeightedMean(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
        round(sum(col("l_quantity")), 4).as("total_weight"))
      .orderBy(col("l_returnflag"))
  }

  /** A10: pivot — wide-format aggregation with an EXPLICIT pivot-value
    * list (`Seq("F","O","P")`): without it Spark runs an extra distinct
    * job just to discover the columns — a full scan you never want at
    * 100 TB, and nondeterministic column order besides. Lowered to one
    * grouped aggregate with per-value filtered sums (same plan as the
    * oracle's FILTER clauses) — a pivot over k values is k conditional
    * aggregates, NOT k passes.
    */
  val a10Pivot: Q = Q(
    "a10_pivot",
    """SELECT o_orderpriority,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 4) AS F,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 4) AS O,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 4) AS P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), 4))
      .orderBy(col("o_orderpriority"))
  }

  /** A5 (explicit sets): an ASYMMETRIC grouping-set list —
    * ((l_returnflag), (l_linestatus)) — which neither ROLLUP nor CUBE
    * can express (no combined cell, no grand total). Same single-pass
    * Expand plan as rollup/cube: one shuffle, |sets| × rows expansion
    * map-side.
    */
  val a5cGroupingSets: Q = Q(
    "a5c_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(
        col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** A12: statistical aggregates — variance/stddev, correlation,
    * covariance, skewness, kurtosis over lineitem. Both engines use
    * numerically-stable merge formulations; 4-dp rounding absorbs the
    * sub-ulp differences between their merge orders. Grouped by
    * returnflag so the per-group moments exercise partial+final merge.
    */
  val a12StatsAgg: Q = Q(
    "a12_stats_agg",
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
      |  round(skewness(l_quantity), 4) AS skew_qty,
      |  round(kurtosis(l_quantity), 4) AS kurt_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qty_disc"),
        round(skewness(col("l_quantity")), 4).as("skew_qty"),
        round(kurtosis(col("l_quantity")), 4).as("kurt_qty"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(
    a2GlobalAgg, a3DistinctAgg, a4DistinctRows, a5Rollup, a5bCube,
    a5cGroupingSets, a6ApproxDistinct, a7Quantiles, a8CollectAgg,
    a9WeightedMean, a10Pivot, a12StatsAgg)
}
