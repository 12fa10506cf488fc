package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window family (SURVEY.md §2b W1–W4).
  *
  * Window state is bounded per partition key (orders-per-customer,
  * suppliers-per-nation), so at 100 TB each task sorts only its key
  * groups after one shuffle on the partition key — no global sort.
  */
object WindowQueries {

  /** W1+W2+W3: ranking (`row_number`, `rank`), offsets (`lag`), and a
    * running-total frame in one pass over a customer partition. Output is
    * bounded by the `o_custkey < 10` predicate (pushed to the scan).
    */
  val w1RankingRunning: Q = Q(
    "w1_ranking_running",
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
      |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 4) AS prev_price,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
      |FROM orders
      |WHERE o_custkey < 10
      |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val running = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 10)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(byDate).as("rn"),
        rank().over(byPrice).as("price_rank"),
        round(lag(col("o_totalprice"), 1).over(byDate), 4).as("prev_price"),
        round(sum(col("o_totalprice")).over(running), 4).as("run_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** W4: distribution functions (`percent_rank`, `cume_dist`, `ntile`)
    * over the supplier account-balance ordering.
    */
  val w4Distribution: Q = Q(
    "w4_distribution",
    """SELECT s_suppkey, s_acctbal,
      |  round(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 4) AS pct_rank,
      |  round(cume_dist() OVER (ORDER BY s_acctbal, s_suppkey), 4) AS cume,
      |  ntile(4) OVER (ORDER BY s_acctbal, s_suppkey) AS quartile
      |FROM supplier
      |ORDER BY s_acctbal, s_suppkey""".stripMargin) { (spark, dir) =>
    val w = Window.orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(spark, dir)
      .select(
        col("s_suppkey"), col("s_acctbal"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
  }

  /** W2: full offset/frame family — lead, first/last value with explicit
    * frames, and a centered moving average. Frames are spelled out in
    * BOTH dialects (default frames differ subtly between engines).
    */
  val w2Offsets: Q = Q(
    "w2_offsets",
    """SELECT o_custkey, o_orderkey,
      |  round(lead(o_totalprice, 1) OVER w, 4) AS next_price,
      |  round(first_value(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS first_price,
      |  round(last_value(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 4) AS last_price,
      |  round(avg(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS moving_avg
      |FROM orders
      |WHERE o_custkey < 10
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 10)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(lead(col("o_totalprice"), 1).over(byDate), 4).as("next_price"),
        round(first(col("o_totalprice"))
          .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("first_price"),
        round(last(col("o_totalprice"))
          .over(byDate.rowsBetween(Window.currentRow, Window.unboundedFollowing)), 4)
          .as("last_price"),
        round(avg(col("o_totalprice")).over(byDate.rowsBetween(-1, 1)), 4).as("moving_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** W3 (value-based frame): RANGE frame over the ORDER-BY VALUE — the
    * frame is "orders of this customer within the trailing 30 days", not
    * "the previous k rows", so tied order dates are all peers and the
    * result is tie-order-independent (what makes a RANGE frame the
    * deterministic choice on non-unique sort keys). Day number is a
    * numeric ORDER BY (both engines bound numeric RANGE frames
    * identically). Same scale shape as every window here: one shuffle on
    * the partition key, per-key local sort.
    */
  val w3RangeFrame: Q = Q(
    "w3_range_frame",
    """SELECT o_custkey, o_orderkey, day_num,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day_num
      |                                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS sum_30d,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY day_num
      |                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
      |      FROM orders WHERE o_custkey < 50) o
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day_num"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("day_num"),
        round(sum(col("o_totalprice")).over(w), 4).as("sum_30d"),
        count(lit(1)).over(w).as("n_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** W5: BATCH sessionization — the gap-based session op (ST4's batch
    * twin) as the classic two-window composition: lag() marks a session
    * start whenever the per-user gap exceeds 24 h, a running sum turns
    * the marks into dense session ids, and a group-by aggregates each
    * session. Boundary arithmetic is exact integer MICROSECONDS
    * (`unix_micros` / `epoch_us`) in both engines, so no float or
    * calendar-boundary semantics can flip a session split. At 100 TB:
    * one shuffle on user_id, per-user sort within tasks, then the
    * session aggregate reuses the same clustering — no second exchange.
    */
  val w5Sessionize: Q = Q(
    "w5_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |         OR epoch_us(CAST(ts AS TIMESTAMP))
      |            - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 86400000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      |  FROM g)
      |SELECT user_id, sess_id, count(*) AS n_events,
      |  round(sum(value), 4) AS total_value,
      |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      |FROM s
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 86400000000L, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  val all: Seq[Q] = Seq(w1RankingRunning, w2Offsets, w3RangeFrame, w4Distribution, w5Sessionize)
}
