package graft

import graft.sources.{GraftRangeAggScan, GraftRangeScan, GraftRangeSplit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 contract tests for graft.sources.GraftRangeSource: the
  * pushdown claims are asserted against the PLANNED scan, not just the
  * query result — a source that re-filters post-scan would pass a
  * result check but fail these.
  */
class Dsv2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def read(start: Long, end: Long, slices: Int = 8): DataFrame =
    spark.read.format("graft-range")
      .option("start", start.toString)
      .option("end", end.toString)
      .option("slices", slices.toString)
      .load()

  private def plannedScan(df: DataFrame): GraftRangeScan = {
    val scans = df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.size == 1, s"expected one BatchScan, got:\n${df.queryExecution.sparkPlan}")
    scans.head.asInstanceOf[GraftRangeScan]
  }

  test("full read matches the arithmetic definition") {
    val rows = read(0, 100).as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(rows.length == 100)
    assert(rows.forall { case (id, v, tag) => v == id * 0.25 && tag == id % 7 })
  }

  test("id comparisons are pushed into the scan bounds (no residual re-filter)") {
    val df = read(0, 20000).filter($"id" >= 5000 && $"id" < 15000)
    val scan = plannedScan(df)
    assert(scan.lo == 5000 && scan.hi == 15000,
      s"filter not absorbed into bounds: ${scan.description()}")
    assert(df.count() == 10000)
  }

  test("column pruning reaches the reader schema") {
    val df = read(0, 50).select($"val")
    val scan = plannedScan(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("val"),
      s"projection not pruned: ${scan.description()}")
    assert(df.as[Double].collect().sum == (0 until 50).map(_ * 0.25).sum)
  }

  test("splits are contiguous, disjoint, and cover the narrowed range") {
    val scan = plannedScan(read(0, 1003).filter($"id" >= 3))
    val splits = scan.planInputPartitions().map(_.asInstanceOf[GraftRangeSplit])
    assert(splits.length == 8)
    assert(splits.head.lo == 3 && splits.last.hi == 1003)
    splits.sliding(2).foreach { case Array(a, b) => assert(a.hi == b.lo) }
    assert(splits.map(s => s.hi - s.lo).sum == 1000)
  }

  test("non-id filters stay residual and are still applied") {
    // tag = 3 cannot be absorbed into range bounds — Spark must evaluate
    // it above the scan; bounds stay untouched, results stay correct.
    val df = read(0, 70).filter($"tag" === 3)
    val scan = plannedScan(df)
    assert(scan.lo == 0 && scan.hi == 70)
    assert(df.select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 70L).filter(_ % 7 == 3))
  }

  test("ungrouped count/min/max push down completely: O(1) scan, no aggregate above it") {
    // Filter narrows the bounds FIRST, then the aggregation is answered
    // from those bounds — one carrier split, no range enumeration, and
    // Spark plans no HashAggregate at all (complete pushdown).
    val df = read(0, 100000).filter($"id" >= 250)
      .agg(count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"))
    val plan = df.queryExecution.sparkPlan
    val scans = plan.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 1 && scans.head.isInstanceOf[GraftRangeAggScan],
      s"aggregation not pushed:\n$plan")
    val agg = scans.head.asInstanceOf[GraftRangeAggScan]
    assert(agg.lo == 250 && agg.hi == 100000)
    assert(agg.planInputPartitions().length == 1)
    assert(plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.isEmpty, s"HashAggregate survived complete pushdown:\n$plan")
    assert(df.as[(Long, Long, Long)].head() == ((99750L, 250L, 99999L)))
  }

  test("group-by and non-id aggregates are declined and still correct") {
    val df = read(0, 70).groupBy($"tag").agg(count(lit(1)).as("n"))
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
    assert(scans.head.isInstanceOf[GraftRangeScan], "grouped agg must NOT push down")
    assert(df.as[(Long, Long)].collect().toMap == (0L to 6L).map(t => t -> 10L).toMap)
  }

  test("pushed bounds saturate at Long.MaxValue instead of overflowing") {
    // hi = min(hi, MaxValue + 1) would wrap to MinValue and clamp the
    // scan empty; lo = max(lo, MaxValue + 1) would wrap to MinValue and
    // be a no-op on a filter that excludes everything.
    assert(read(0, 100).filter($"id" <= Long.MaxValue).count() == 100)
    assert(read(0, 100).filter($"id" > Long.MaxValue - 1).count() == 0)
  }

  test("contradictory pushed filters plan an empty scan, not a crash") {
    val df = read(0, 100).filter($"id" > 80 && $"id" < 20)
    assert(plannedScan(df).planInputPartitions().isEmpty)
    assert(df.count() == 0)
  }

  test("graft-sink DSv2 write: two-phase commit makes all task rows visible atomically") {
    import graft.sources.GraftMemorySink
    GraftMemorySink.clear("t_roundtrip")
    assert(GraftMemorySink.rows("t_roundtrip").isEmpty)
    val df = spark.range(0, 1000, 1, 8) // 8 write tasks
      .select($"id", ($"id" * 3).as("v"))
    df.write.format("graft-sink").option("name", "t_roundtrip")
      .mode("append").save()
    val schema = GraftMemorySink.schemaOf("t_roundtrip").get
    assert(schema.fieldNames.toSeq == Seq("id", "v"))
    val rows = GraftMemorySink.rows("t_roundtrip")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.size == 1000)
    assert(rows.toSet == (0L until 1000L).map(i => (i, i * 3)).toSet)
    GraftMemorySink.clear("t_roundtrip")
  }

  test("graft-sink append with a different schema refuses instead of mixing layouts") {
    import graft.sources.GraftMemorySink
    GraftMemorySink.clear("t_mismatch")
    spark.range(0, 10, 1, 2).select($"id")
      .write.format("graft-sink").option("name", "t_mismatch").mode("append").save()
    val e = intercept[Exception] {
      spark.range(0, 10, 1, 2).select($"id", ($"id" * 2).as("v"))
        .write.format("graft-sink").option("name", "t_mismatch").mode("append").save()
    }
    def hasMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("does not match")) ||
        hasMsg(t.getCause))
    assert(hasMsg(e), s"expected the schema-mismatch refusal, got: $e")
    // The first job's rows survive untouched.
    assert(GraftMemorySink.rows("t_mismatch").length == 10)
    GraftMemorySink.clear("t_mismatch")
  }

  test("splits survive ranges where i*n would overflow Long") {
    // The naive lo + i*n/parts bound computation overflows for
    // n > Long.MaxValue / slices and silently produces wrapped splits;
    // the remainder-distribution form must keep every split positive,
    // contiguous, and exactly covering [lo, hi).
    val scan = GraftRangeScan(0L, Long.MaxValue, 32,
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType))
    val splits = scan.planInputPartitions().map(_.asInstanceOf[GraftRangeSplit])
    assert(splits.length == 32)
    assert(splits.head.lo == 0L && splits.last.hi == Long.MaxValue)
    splits.foreach(s => assert(s.hi > s.lo, s"non-positive split $s"))
    splits.sliding(2).foreach { case Array(a, b) => assert(a.hi == b.lo) }
    assert(splits.map(s => BigInt(s.hi) - BigInt(s.lo)).sum == BigInt(Long.MaxValue))
  }

  test("graft-sink append appends across jobs; overwrite replaces") {
    import graft.sources.GraftMemorySink
    GraftMemorySink.clear("t_modes")
    val w = (lo: Long, hi: Long) => spark.range(lo, hi).select($"id")
    w(0, 5).write.format("graft-sink").option("name", "t_modes").mode("append").save()
    w(5, 8).write.format("graft-sink").option("name", "t_modes").mode("append").save()
    // Second append must ADD to the committed table, not replace it.
    assert(GraftMemorySink.rows("t_modes").map(_.getLong(0)).toSet == (0L until 8L).toSet)
    w(100, 103).write.format("graft-sink").option("name", "t_modes").mode("overwrite").save()
    assert(GraftMemorySink.rows("t_modes").map(_.getLong(0)).toSet == Set(100L, 101L, 102L))
    GraftMemorySink.clear("t_modes")
  }

  test("LIMIT and id-ordered TopN push into the scan bounds; other sorts decline") {
    // LIMIT n on a dense ordered range = first n ids; complete pushdown.
    val limited = read(0, 100000).limit(7)
    assert(plannedScan(limited).hi == 7, s"limit not absorbed: ${plannedScan(limited)}")
    assert(limited.count() == 7)
    // TopN by id asc/desc narrows from the matching end.
    val asc = read(0, 100000).orderBy($"id").limit(5)
    assert(plannedScan(asc).hi == 5)
    assert(asc.as[(Long, Double, Long)].collect().map(_._1).toSeq == (0L until 5L))
    // DESC is only PARTIALLY pushed: the scan keeps the top-5 ids but the
    // reader emits ascending, so Spark must retain its Sort+Limit to
    // reverse them. Asserted on the RAW collect order — no .sorted.
    val desc = read(0, 100000).orderBy($"id".desc).limit(5)
    assert(plannedScan(desc).lo == 99995)
    assert(desc.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => s
    }.nonEmpty, s"DESC TopN must keep Spark's sort:\n${desc.queryExecution.sparkPlan}")
    assert(desc.as[(Long, Double, Long)].collect().map(_._1).toSeq ==
      (99999L to 99995L by -1L))
    // A non-id sort must NOT narrow the scan (row order != range order).
    val byVal = read(0, 1000).orderBy($"tag").limit(5)
    val s = plannedScan(byVal)
    assert(s.lo == 0 && s.hi == 1000, s"tag-sort wrongly pushed: $s")
    assert(byVal.count() == 5)
  }

  test("reported statistics let the planner auto-broadcast a narrowed range") {
    // No broadcast hint anywhere: the filter narrows the range to 100
    // rows, estimateStatistics reports that, and the planner picks a
    // broadcast join on its own. AQE off so the initial plan decides
    // from the reported stats.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val small = read(0, 1000000).filter($"id" < 100)
      val big = spark.range(0, 50000).select($"id".as("rid"))
      val joined = big.join(small, $"rid" === $"id")
      val bhj = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty,
        s"stats did not drive a broadcast:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("runtime V2 filtering narrows the scan from the broadcast join side") {
    // SPARK-35779 path: the dim side broadcasts, its join keys become an
    // IN runtime filter handed to Scan.filter(), and the dense range
    // prunes to [min, max+1] of those keys BEFORE planning splits.
    // AQE off: the executed plan stays flat (no QueryStageExec leaves
    // hiding the scan node from collect) and the non-adaptive DPP path
    // still injects the runtime filter from the reused broadcast.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dim = spark.range(0, 1000).select(($"id" + 500000).as("rid"))
        .filter($"rid" % 100 === 0) // selective predicate on the dim side
      val fact = read(0, 1000000)
      val joined = fact.join(broadcast(dim), $"id" === $"rid")
      // collect(), not count(): count() builds a SEPARATE QueryExecution,
      // and the scan instance inspected below must be the one that ran.
      assert(joined.collect().length == 10)
      val scans = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val scan = scans.map(_.scan).collectFirst {
        case s: graft.sources.GraftRangeScan => s
      }.get
      val (elo, ehi) = scan.effectiveBounds
      assert(elo == 500000 && ehi == 500901,
        s"runtime filter did not narrow the scan: [$elo, $ehi)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("graft-range streams in rate-limited micro-batches under AvailableNow") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mbs_ckpt_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_mbs_out_").toString
    def run() = {
      val q = spark.readStream.format("graft-range")
        .option("end", "350").option("rowsPerBatch", "100").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    val q1 = run()
    val rows = spark.read.parquet(out).as[(Long, Double, Long)].collect()
    assert(rows.length == 350)
    assert(rows.map(_._1).sorted.toSeq == (0L until 350L))
    assert(rows.forall { case (id, v, tag) => v == id * 0.25 && tag == id % 7 })
    // Admission control: no batch admitted more than rowsPerBatch ids.
    val batchSizes = q1.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batchSizes.sum == 350, s"batches: ${batchSizes.toSeq}")
    assert(batchSizes.length == 4 && batchSizes.forall(_ <= 100),
      s"expected 100+100+100+50, got ${batchSizes.toSeq}")

    // Restart from the same checkpoint: the committed offset IS the full
    // range — nothing is re-emitted (exactly-once on the source side).
    val q2 = run()
    assert(q2.recentProgress.map(_.numInputRows).sum == 0,
      s"restart re-emitted rows: ${q2.recentProgress.map(_.numInputRows).toSeq}")
    assert(spark.read.parquet(out).count() == 350)
  }

  test("Trigger.Once (ReadAllAvailable) drains the whole range in one batch") {
    // Trigger.Once hands the source ReadAllAvailable, which must override
    // the per-batch rate limit — one batch, ALL 350 rows. A source that
    // maps unknown limits to rowsPerBatch under-delivers 250 rows here.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_once_ckpt_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_once_out_").toString
    val q = spark.readStream.format("graft-range")
      .option("end", "350").option("rowsPerBatch", "100").load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 350,
      s"Trigger.Once under-delivered: ${q.recentProgress.map(_.numInputRows).toSeq}")
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.toSeq == Seq(350L), s"expected one full batch, got ${sizes.toSeq}")
  }

  test("composite read limits: only capping parts participate in the min") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    val schema = new StructType()
      .add("id", LongType).add("val", DoubleType).add("tag", LongType)
    val stream = new graft.sources.GraftRangeMicroBatchStream(
      0L, 100000L, 8, schema, rowsPerBatch = 1000L)
    def admitted(lim: ReadLimit): Long =
      stream.latestOffset(graft.sources.GraftRangeOffset(0L), lim)
        .asInstanceOf[graft.sources.GraftRangeOffset].v
    // (minRows, maxRows 5000): the cap is 5000 — a fallback that maps the
    // unrecognized minRows part to rowsPerBatch would wrongly admit 1000.
    assert(admitted(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(10L, 0L), ReadLimit.maxRows(5000L)))) == 5000L)
    // allAvailable composed with a cap: the cap still binds.
    assert(admitted(ReadLimit.compositeLimit(Array(
      ReadLimit.allAvailable(), ReadLimit.maxRows(5000L)))) == 5000L)
    // No recognized cap anywhere: fall back to the configured batch size.
    assert(admitted(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(10L, 0L)))) == 1000L)
  }

  test("graft-sink write through the full pipeline (filter + agg upstream)") {
    import graft.sources.GraftMemorySink
    GraftMemorySink.clear("t_agg")
    read(0, 700).filter($"id" >= 100)
      .groupBy($"tag").agg(count(lit(1)).as("n"))
      .write.format("graft-sink").option("name", "t_agg").mode("append").save()
    val got = GraftMemorySink.rows("t_agg").map(r => (r.getLong(0), r.getLong(1))).toMap
    // ids 100..699: 600 ids uniform over 7 tags ≡ compute exactly.
    val expect = (100L until 700L).groupBy(_ % 7).map { case (t, ids) => t -> ids.size.toLong }
    assert(got == expect)
    GraftMemorySink.clear("t_agg")
  }
}
