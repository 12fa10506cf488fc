package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB co-location story for large⋈large joins (SURVEY.md §2b J2
  * scale note): both fact tables bucketed on the join key into the same
  * bucket count ⇒ the join plan has NO shuffle exchange — each task
  * reads matching buckets directly. This is the layout j2_shuffle_join
  * prescribes for orders⋈lineitem at scale.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
    val right = (1 to 3000).map(i => ((i % 1000 + 1).toLong, i * 1.5)).toDF("k", "lv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_orders")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_lineitem")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"), Seq("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
      assert(joined.agg(sum($"n")).as[Long].head() == 3000L)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // One shuffle for the final groupBy is avoided too (bucket
      // partitioning satisfies the aggregate's distribution on k).
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found: ${shuffles.map(_.nodeName)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("partitionBy layout prunes at the directory level (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_partlayout").toString
    (1 to 300).map(i => (i.toLong, s"t$i", Seq("en", "fr", "de")(i % 3)))
      .toDF("id", "text", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter($"lang" === "en").select($"id")
    assert(q.count() == 100)
    // The lang predicate must resolve against the DIRECTORY layout —
    // a PartitionFilters entry on the scan — and must NOT survive as a
    // pushed data filter (there is no lang column inside the files).
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang not in PartitionFilters: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "lang")),
      s"lang leaked into data filters: ${scan.dataFilters}")
    // And pruning actually happened: only en's files are selected.
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "no partitions were pruned")
  }
}
