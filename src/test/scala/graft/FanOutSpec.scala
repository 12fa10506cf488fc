package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the conditionality of `Tables.fanOut` (guide §2.5 input-skew
  * recovery): it must add a round-robin rebalance ONLY when the scan
  * plans fewer partitions than the cluster's parallelism — so that at
  * 100 TB, where a scan has thousands of splits, it is an identity and
  * no shuffle is added. The PlanLint/PipelineSpec wide-column guards
  * whitelist exactly this shape (source-adjacent round-robin); this
  * spec is the proof that the shape is self-limiting.
  */
class FanOutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("fanOut rebalances a single-split scan to defaultParallelism") {
    // On a 1-core runner defaultParallelism == 1 makes fanOut an
    // identity by design — the rebalance assertion is vacuous there.
    assume(spark.sparkContext.defaultParallelism > 1,
      "fanOut is an identity at defaultParallelism == 1")
    val docs = Tables.documents(spark, dir) // one row group → 1 partition
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val fanned = Tables.fanOut(docs)
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // AQE hides the plan inside AdaptiveSparkPlanExec until execution;
    // disable it for the shape assertion (the PlanLintSpec discipline).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Tables.fanOut(docs).queryExecution.executedPlan
        .collect { case s: ShuffleExchangeExec => s }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.size == 1)
    assert(exchanges.head.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    // Row set is untouched — redistribution only.
    assert(fanned.count() == docs.count())
  }

  test("fanOut is an identity when the input already has enough partitions") {
    val docs = Tables.documents(spark, dir)
    val wide = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    val fanned = Tables.fanOut(wide)
    // Same DataFrame object: no plan change, hence no added exchange.
    assert(fanned eq wide)
  }
}
