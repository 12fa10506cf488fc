package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contracts for the L8 corpus-pipeline queries: each
  * scaladoc's 100 TB claim ("map-side only", "benchmark side
  * broadcasts", "one shuffle, reused by the audit aggregate") is
  * asserted against the ACTUAL executed plan, not just trusted.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // The trailing ORDER BY's range repartition moves only the few audit
  // rows — the claims are about DATA shuffles (hash exchanges), so count
  // those.
  private def shuffles(df: DataFrame) =
    planOf(df).collect { case s: ShuffleExchangeExec => s }.filterNot(
      _.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning])

  test("stratified sample / pii redact / repetition quality are map-side + one audit shuffle") {
    for (q <- Seq(
        queries.PipelineQueries.l8StratifiedSample,
        queries.PipelineQueries.l8PiiRedact,
        queries.PipelineQueries.l8RepetitionQuality)) {
      val ex = shuffles(q.fn(spark, dir))
      assert(ex.size == 1, s"${q.name}: expected exactly the final-aggregate shuffle, got:\n$ex")
    }
  }

  test("decontamination joins on the hash key with the benchmark side broadcast") {
    val plan = planOf(queries.PipelineQueries.l8Decontaminate.fn(spark, dir))
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"benchmark side not broadcast:\n$plan")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"decontamination fell back to a sort-merge join:\n$plan")
    // No KEYED shuffle may carry the document text — only fixed-width
    // keys. The one permitted text-bearing exchange is the conditional
    // source-adjacent round-robin rebalance (Tables.fanOut, guide §2.5):
    // it moves each byte once to recover scan parallelism and vanishes
    // at scale where the scan has real splits (FanOutSpec pins that).
    val textShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      .filter(_.output.exists(_.name == "text"))
      .filterNot(s =>
        s.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] &&
          s.child.collect { case e: ShuffleExchangeExec => e }.isEmpty)
    assert(textShuffles.isEmpty, s"document text crosses a keyed shuffle:\n$textShuffles")
  }

  test("native bloom probe matches mightContainString and keeps the plan UDF-free") {
    import spark.implicits._
    // Equivalence: the codegen probe (UTF-8 bytes → mightContainBinary)
    // must agree with the UDF it replaced (String → mightContainString)
    // on members, non-members, and non-ASCII input.
    val members = (1 to 200).map(i => s"gram-$i-é")
    val df = members.toDF("g")
    val bloom = df.stat.bloomFilter("g", 200, 0.03)
    val probeIn = (members ++ (1 to 500).map(i => s"absent-$i")).toDF("g")
    val got = probeIn
      .withColumn("native", graft.functions.BloomMightContain(spark, $"g", bloom))
      .as[(String, Boolean)].collect()
    got.foreach { case (g, native) =>
      assert(native == bloom.mightContainString(g),
        s"native probe diverged from mightContainString on '$g'")
    }
    // Every member must hit (a Bloom filter has no false negatives).
    assert(got.filter(r => members.contains(r._1)).forall(_._2))
    // Plan shape: the bloom kill must not re-introduce a codegen fence —
    // no ScalaUDF anywhere in the executed decontamination plan.
    val plan = planOf(queries.PipelineQueries.l8BloomDecontaminate.fn(spark, dir))
    val udfs = plan.toString.linesIterator.filter(_.contains("ScalaUDF")).toSeq
    assert(udfs.isEmpty, s"bloom decontamination still carries a UDF:\n$udfs")
    spark.catalog.clearCache() // the query persists its bench slice
  }

  test("sequence packing reuses the window's source-partitioning for the audit aggregate") {
    val ex = shuffles(queries.PipelineQueries.l8SequencePack.fn(spark, dir))
    assert(ex.size == 1,
      s"expected one shuffle (window partitioning, reused by groupBy(source)), got:\n$ex")
  }

  test("decontamination gram guard: short docs produce no grams, not a descending-sequence crash") {
    // The planted hazard: Spark sequence(1, n<=0) is DESCENDING [1..n],
    // and an unguarded slice/element_at then throws on every short doc.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = split(col("text"), " ")
    val gramHashes = when(size(t) >= 8,
      transform(sequence(lit(1), size(t) - 7),
        i => md5(array_join(slice(t, i, lit(8)), " "))))
      .otherwise(array().cast("array<string>"))
    val df = Seq("", "one", "a b c d e f g", "a b c d e f g h", "a b c d e f g h i")
      .toDF("text").select(size(gramHashes).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 0, 1, 2))
  }
}
