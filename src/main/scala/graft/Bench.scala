package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. A failing query is recorded
  * in "errors" (its partial elapsed time still counted) and flips the
  * exit code — failures must never silently inflate or deflate totals.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Comma-separated name-prefix filter for isolated/bisect runs
    // (e.g. SPARK_GRAFT_BENCH_FILTER=st2,st7); empty = all queries.
    val filter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Engine default, matching Verify: SPJ reads the catalog layout.
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
    // Extensions on by default (native fns + V2 view DDL/read);
    // SPARK_GRAFT_BENCH_NOEXT=1 exists solely to bisect extension cost.
    val spark = (if (sys.env.contains("SPARK_GRAFT_BENCH_NOEXT")) builder
                 else builder.withExtensions(new GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: absorb session startup + first-query codegen outside the
    // per-query timings (runs the flagship on sf0.001). A warm-up failure
    // is logged, not fatal — a broken flagship must still surface here,
    // not only in Verify.
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warm-up FAILED: $e") }
    // Median-of-N per query: single-shot timings on this box swing ±50%
    // run-to-run (r2→r3 measured 22s→2.7s on an identical binary), which
    // makes per-query perf deltas meaningless. The median of 3 back-to-back
    // runs is robust to one bad run while keeping total bench time bounded.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val errors = scala.collection.mutable.SortedMap[String, String]()
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.isEmpty || filter.exists(n.startsWith) }
    // Keep min + spread alongside the median: a median captured under
    // external load (driver compiling next door) can read 1.4× the same
    // binary's quiet-box run; min-of-reps is the load-robust floor and
    // (max-min)/median flags which rows the load actually hit.
    val stats = picked.map { case (name, fn) =>
      // Untimed per-query warm-up: multi-commit catalog fixtures
      // (CREATE + INSERTs + procedures) are built on the FIRST
      // invocation and memoized; without this the first timed rep
      // measures fixture construction, not the query (r12 adjudicated
      // x8 at 3.6 s rep-1 vs 1.0-1.3 s steady — spread 0.73). Failures
      // are swallowed here; the timed reps record them. Rows whose
      // warm-up is non-trivial get a SECOND untimed pass: iterative
      // plans (recursive CTE, multi-commit DDL) keep JIT-warming for
      // several invocations (r16 measured u6 reps at 3.2/2.7/2.5/2.4 —
      // a monotonic trend that read as spread 1.3 and pushed
      // total_median 14% over total_min), so one warm-up leaves the
      // first TIMED rep still compiling. Cheap rows skip the second
      // pass — the extra wall-clock lands only where the noise was.
      val warmT0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
      val warmSec = (System.nanoTime() - warmT0) / 1e9
      spark.catalog.clearCache()
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      if (warmSec >= 0.3) {
        try { fn(spark, sfDir).count(); () }
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
        spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // Isolate queries: accumulated cache entries from persist()-ing
        // queries make CacheManager's per-plan-node semanticEquals lookup
        // dominate DRIVER time for later large-plan queries (measured 2.4×
        // total slowdown across 62 queries without this).
        spark.catalog.clearCache()
        // And stop any streaming query a row accidentally left running —
        // a leaked stream's trigger loop would silently tax every later
        // row in the suite (the r9 x5c/x5d in-suite slowdown was this
        // SHAPE of defect; bisection showed it was driver-box load, but
        // the insurance is one no-op call when nothing leaked).
        spark.streams.active.foreach { q =>
          System.err.println(s"[bench] $name leaked streaming query ${q.name}; stopping")
          try q.stop() catch { case _: Throwable => () }
        }
        elapsed
      }
      // SPARK_GRAFT_BENCH_DEBUG=1: per-rep times to stderr, in run
      // order — the spread diagnosis lever (monotonic growth = state
      // accumulating across reps; one spike = external load).
      if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG"))
        System.err.println(
          s"[bench] $name reps: ${times.map(t => f"$t%.3f").mkString(", ")}")
      // DE-SPIKE: a rep ≥ 3× the row's own min is external load (the
      // in-process causes — fixture build, JIT warm-up — are absorbed
      // by the untimed passes above), and ONE such rep poisons both
      // the median of 3 and the spread (r17 adjudicated a 30 s
      // l8_ngram_decontaminate rep that pushed suite median−min to
      // 7.6%). Discard them from median AND spread; the min — the
      // headline — was never affected.
      val sortedTimes = times.sorted
      val mn = sortedTimes.head
      val kept = sortedTimes.filter(_ <= mn * 3)
      if (kept.length < times.length)
        System.err.println(s"[bench] $name discarded ${times.length - kept.length} " +
          s"load-contaminated rep(s) ≥ 3× min (${f"$mn%.3f"}s)")
      (name, kept(kept.length / 2), mn, kept.last,
        times.length - kept.length, sortedTimes.last)
    }
    val results = stats.map { case (n, med, _, _, _, _) => (n, med) }
    def jstr(s: String): String = Q.jstr(s)
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Full-precision artifact: the driver captures only the last ~2000
    // chars of stdout, which a 97-query JSON line overflows — BENCH_r07
    // recorded parsed:null because the line was truncated mid-object.
    // The complete map goes to a repo file (round-over-round comparable,
    // committed with the snapshot); stdout gets a line GUARANTEED to fit
    // the tail: totals + errors always, then per-query times (3-decimal,
    // slowest first) only while the line stays under the budget.
    val mins = stats.map { case (k, _, mn, _, _, _) => s"${jstr(k)}:$mn" }
      .mkString("{", ",", "}")
    val spreads = stats.map { case (k, med, mn, mx, _, _) =>
      s"${jstr(k)}:${math.rint((mx - mn) / math.max(med, 1e-9) * 1000) / 1000}"
    }.mkString("{", ",", "}")
    // De-spiked reps must be VISIBLE in the artifact, not only on a
    // transient stderr line: {row: [discarded_count, raw_max_sec]} for
    // every row that lost reps — a genuine bimodal slow path shows up
    // here round after round, where external load shows up once.
    val discards = stats.collect { case (k, _, _, _, d, rawMx) if d > 0 =>
      s"${jstr(k)}:[$d,$rawMx]"
    }.mkString("{", ",", "}")
    val totalMin = stats.map(_._3).sum
    // QUALITY metrics alongside the timings, so a regression in ANN
    // recall or in the MV-rewrite win shows up in the bench diff — not
    // only as a test failure. ann_ivf_recall_at10: natural-corpus
    // (no planted copies) IVF top-10 overlap with the brute-force
    // exact top-10 — the same computation SimilaritySpec floors at
    // 8/10. mv_rewrite_speedup: median(x9c_mv_rewrite_off) /
    // median(x9c_mv_rewrite_on), the measured benefit of the
    // transparent rewrite on identical semantics.
    val quality: String = {
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      if (filter.isEmpty) {
        try {
          val exact = graft.queries.SimilarityQueries.l3CosineTopK.fn(spark, sfDir)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val e = graft.Tables.embeddings(spark, sfDir).persist()
          val ivf = graft.queries.SimilarityQueries.ivfTopK(spark, e, e)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          e.unpersist()
          spark.catalog.clearCache()
          parts += s""""ann_ivf_recall_at10":${(exact & ivf).size / 10.0}"""
        } catch { case e: Throwable =>
          System.err.println(s"[bench] recall metric failed: $e")
        }
        val med = results.toMap
        for {
          off <- med.get("x9c_mv_rewrite_off")
          on <- med.get("x9c_mv_rewrite_on")
          if on > 0
        } parts += s""""mv_rewrite_speedup":${math.rint(off / on * 1000) / 1000}"""
      }
      parts.mkString("{", ",", "}")
    }
    // HEADLINE = min-of-reps: the single-shot/median total is hostage to
    // box load (r13's st14 read 17.0 s single-shot vs a 3.4 s min with
    // 0.966 spread — a fake 24% suite regression). The min is the
    // load-robust floor and the round-over-round comparable number; the
    // median stays alongside as total_median.
    val fullLine =
      s"""{"metric":"total","value":$totalMin,"unit":"sec","total_min":$totalMin,"total_median":$total,"reps":$reps,"queries":$qs,"min":$mins,"spread":$spreads,"discarded_reps":$discards,"quality":$quality,"errors":$errs,"sf":${jstr(sfDir)}}"""
    // A filtered run — or a full run at any SF other than the committed
    // artifact's sf0.1 — writes a scratch file so it can never clobber
    // the committed full-suite numbers (an unfiltered sf0.001 smoke
    // once overwrote bench_full.json with sub-second totals).
    val artifact =
      if (filter.nonEmpty) "bench_filtered.json"
      else if (sfDir.replaceAll("/+$", "").endsWith("sf0.1")) "bench_full.json"
      else "bench_scratch.json"
    try {
      val w = new java.io.PrintWriter(artifact)
      try w.println(fullLine) finally w.close()
    } catch { case e: java.io.IOException =>
      System.err.println(s"[bench] $artifact write failed: $e") }
    val budget = 1600 // chars for the queries map; total line stays < ~1900
    // Stdout per-query values are the MIN (matching the headline), so
    // the shown rows sum toward "value" instead of a different metric.
    val entries = stats.map { case (k, _, mn, _, _, _) => (k, mn) }.sortBy(-_._2).iterator
      .map { case (k, v) => s"${jstr(k)}:${math.rint(v * 1000) / 1000}" }
    val sb = new StringBuilder
    var used = 0
    var shown = 0
    entries.takeWhile(e => used + e.length + 1 <= budget).foreach { e =>
      if (sb.nonEmpty) sb.append(',')
      sb.append(e); used = sb.length; shown += 1
    }
    println(
      s"""{"metric":"total","value":${math.rint(totalMin * 1000) / 1000},"unit":"sec","total_min":${math.rint(totalMin * 1000) / 1000},"total_median":${math.rint(total * 1000) / 1000},"n_queries":${results.length},"n_shown":$shown,"queries":{$sb},"errors":$errs,"sf":${jstr(sfDir)},"full":${jstr(artifact)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
