package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the TPC-H-derived flagships in
  * [[queries.FlagshipQueries]] — row counts are the oracle's job; these
  * tests pin the SCALE properties: filters reaching the parquet scan,
  * dimensions broadcasting, anti-join lowering for NOT EXISTS.
  */
class FlagshipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def executed(q: Q) = {
    val plan = q.fn(spark, dir).queryExecution.executedPlan
    plan match { case a: AdaptiveSparkPlanExec => a.executedPlan; case p => p }
  }

  private def scans(q: Q): Seq[FileSourceScanExec] =
    executed(q).collect { case s: FileSourceScanExec => s }

  test("q14: the ship-month filter is pushed to the lineitem parquet scan") {
    val li = scans(queries.FlagshipQueries.q14PromoRevenue)
      .find(_.metadata("Location").contains("lineitem")).get
    val pushed = li.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_shipdate"), pushed)
    // and only the 4 needed columns are read
    assert(li.requiredSchema.fieldNames.toSet ==
      Set("l_partkey", "l_extendedprice", "l_discount", "l_shipdate"))
  }

  test("q14: part joins as a broadcast build side") {
    val bhj = executed(queries.FlagshipQueries.q14PromoRevenue)
      .collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "expected a broadcast hash join for the part dimension")
  }

  test("q19: disjunctive predicate splits per-table conjuncts to BOTH scans") {
    val ss = scans(queries.FlagshipQueries.q19DisjunctiveRevenue)
    val li = ss.find(_.metadata("Location").contains("lineitem")).get
    val pt = ss.find(_.metadata("Location").contains("part")).get
    // the OR of quantity ranges is derivable for lineitem alone
    assert(li.metadata("PushedFilters").contains("Or("), li.metadata("PushedFilters"))
    // the OR of brand×size conjunctions is derivable for part alone
    assert(pt.metadata("PushedFilters").contains("Or("), pt.metadata("PushedFilters"))
  }

  test("q22: NOT EXISTS lowers to an anti join, scalar subquery stays uncorrelated") {
    val plan = executed(queries.FlagshipQueries.q22SalesOpportunity)
    val anti = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.sql.contains("ANTI") => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType.sql.contains("ANTI") => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.joinType.sql.contains("ANTI") => j
    }
    assert(anti.nonEmpty, s"expected an anti join in:\n$plan")
  }

  test("q15: the revenue CTE's scan filter is pushed and the max is a reused subquery") {
    val ss = scans(queries.FlagshipQueries.q15TopSupplier)
    val li = ss.filter(_.metadata("Location").contains("lineitem"))
    assert(li.nonEmpty)
    li.foreach { s =>
      assert(s.metadata("PushedFilters").contains("GreaterThanOrEqual(l_shipdate"))
    }
  }

  test("q7: nation-pair filter prunes before the final aggregate (result is 4 groups at sf0.001)") {
    val rows = queries.FlagshipQueries.q7VolumeShipping.fn(spark, dir).collect()
    assert(rows.length == 4)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18")))
  }

  test("q2: the correlated min-cost subquery decorrelates to an aggregate + equi join") {
    // No per-row subquery execution: the optimized plan has ZERO
    // remaining (scalar-)subquery expressions — the inner min-per-part
    // aggregate is joined back on equality instead.
    val opt = queries.FlagshipQueries.q2MinCostSupplier.fn(spark, dir)
      .queryExecution.optimizedPlan
    val subq = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s
      })
    }.flatten
    assert(subq.isEmpty, s"expected full decorrelation, found: $subq")
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size >= 2, "expected the derived-cost agg AND the min-per-part agg")
  }

  test("q21: EXISTS/NOT EXISTS pair lowers to one semi and one anti join") {
    val opt = queries.FlagshipQueries.q21WaitingSuppliers.fn(spark, dir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val types = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(types.contains(LeftSemi), s"expected a semi join in $types")
    assert(types.contains(LeftAnti), s"expected an anti join in $types")
  }

  test("q13: zero-order customers survive the left outer join into the 0 bucket") {
    val rows = queries.FlagshipQueries.q13OrderDistribution.fn(spark, dir).collect()
    val counts = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every customer appears in exactly one bucket.
    val nCustomers = spark.read
      .parquet(s"$dir/customer.parquet").count()
    assert(counts.values.sum == nCustomers,
      s"distribution must partition all $nCustomers customers, got ${counts.values.sum}")
  }
}
