package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary SCALE datapoint (`runMain graft.ScaleSpot`): stage a ~10×
  * copy of the sf0.1 testdata (TPC-H-style self-scaling: ten DISJOINT
  * consistent universes — every fact/bridge key shifted by the same
  * per-copy offset so join fan-outs keep their shape; dimension tables
  * `region`/`nation` stay fixed and every copy's foreign keys still
  * resolve) and time the suite's historically slowest rows plus a core
  * relational/dedup slice against it. Correctness at this SF is not
  * oracle-checked (the per-round gate does that at sf0.01); this run
  * exists to validate empirically that the plans the SCALE.md stories
  * describe keep scaling ~linearly at 10× the per-round bench volume —
  * the cheapest datapoint short of a real cluster.
  *
  * Writes one JSON line to `bench_scale_spot.json`.
  */
object ScaleSpot {
  // (table, columns to shift per copy). Offsets = max(col)+1 of the
  // base slice, so copies are disjoint; the SAME logical offset is
  // applied to both sides of every join key (c_custkey ↔ o_custkey ↔
  // events.user_id, o_orderkey ↔ l_orderkey, p_partkey ↔ l_partkey,
  // s_suppkey ↔ l_suppkey).
  private val Copies = 10

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stage(spark, baseDir, outDir)

    // Historically slowest rows + a representative relational/dedup/
    // similarity slice. Streaming fixtures replay the 10× events file;
    // the ANN row retrains on the 10× embedding corpus.
    val picks = Seq(
      "q1_pricing_summary", "q9_product_profit", "q18_large_orders",
      "j2_shuffle_join", "j8_asof_join",
      "l1_exact_dedup", "l2_minhash_lsh_neardup", "l3_ann_ivfpq",
      "l5_tfidf_top_terms", "l8_ngram_decontaminate",
      "st2_tumbling_window", "st4_session_window", "st6c_timer_sessions",
      "st8_stream_stream_join", "st13_join_window_agg",
      "st14_streaming_mv", "st15_change_feed_stream", "st16_cdc_replica",
      // Round-12 table-format additions at 10×: hidden-partition ingest
      // + pruning, merge-on-read upsert, WAP branch lifecycle, and the
      // streaming upsert sink replaying a 10× change feed.
      "x5j_hidden_partitioning", "x12_branch_wap", "x13_upsert",
      "st17_streaming_upsert",
      // Second-pass additions at 10×: the bucket-SPJ fact⋈fact join,
      // row-lineage assignment over a 10× load, identity-column
      // generation, Bloom decontamination, and MapState profiles.
      "x5k_bucket_spj", "x16_row_lineage", "x18_identity",
      "l8_bloom_decontaminate", "st6d_composite_state",
      // Third-pass additions at 10×: idempotent COPY INTO ingestion
      // (the re-run diff must stay metadata-cheap as files grow),
      // scoped compaction of one hot partition, and the evolving MERGE.
      "x23_copy_into", "x24_scoped_compact", "x22_merge_schema_evolution",
      // Round-16 additions at 10×: the SRP-banded embedding near-dup
      // self-join and its clustering decision (candidate mass must stay
      // sub-quadratic), the persisted-index embedding probe (probe cost
      // must track the batch, not the corpus), the deletes-heavy
      // merge-on-read read and its compaction remedy (per-delete read
      // cost and the retire path), and the filtered-/join-MV rewrites
      // (rewrite-hit fixtures must stay MV-cheap as the base grows).
      "l4_embedding_neardup_lsh", "x13b_deletes_heavy_read", "x9d_filtered_mv",
      "l4_embedding_dedup_clusters", "l9_embedding_incremental",
      "x9e_join_mv", "x13c_compact_retires_deletes",
      // Round-17 permanent watch set: the three rows whose sf1 ratios
      // drifted toward the ceiling in r16 (so they can't drift silently
      // again), plus the new incremental/stale join-MV rows (refresh
      // and rewrite cost must track the fact delta, not the fact).
      "l9_incremental_neardup", "f9_variant",
      "x9f_join_mv_refresh", "x9g_stale_join_mv", "x9h_snowflake_mv")
    val qs = SparkEntry.queries
    // SPARK_GRAFT_SCALE_ALL=1: run EVERY registry query against the 10×
    // slice (the full-suite sf1 datapoint; single-shot timings — the
    // per-round bench's median-of-3 discipline stays at sf0.1).
    val chosen =
      if (sys.env.contains("SPARK_GRAFT_SCALE_ALL")) qs.keys.toSeq.sorted
      else picks
    val errors = scala.collection.mutable.SortedMap[String, String]()
    // A typo'd or renamed pick must be LOUD: silently shrinking the
    // scale suite leaves a datapoint that looks complete but isn't.
    chosen.filterNot(qs.contains).foreach { name =>
      errors(name) = "pick not in the query registry (renamed?)"
      System.err.println(s"[scale-spot] pick $name missing from registry")
    }
    def timeOnce(fn: (SparkSession, String) => DataFrame, name: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, outDir).count(); () }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(160)
        System.err.println(s"[scale-spot] $name FAILED: ${e.getMessage}")
      }
      // Clock stops BEFORE cleanup (the Bench discipline) — billing
      // cache-clear to the query would inflate rows that follow
      // persist-heavy ones relative to the sf0.1 numbers they are
      // compared against.
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      elapsed
    }
    // Untimed per-query warm-up — the SAME discipline Bench applies to
    // the sf0.1 numbers these timings are divided by: multi-commit
    // catalog fixtures (index builds, memoized corpus tables) are
    // constructed on the first invocation, and timing it here while the
    // denominator excludes it reads as fake super-linearity (r15
    // measured l3_ann_ivf_indexed at "1.79x linear" single-shot vs
    // 0.25x warm — the 9 s k-means index build amortized at sf0.1 but
    // billed at sf1). Failures surface in the timed shot.
    // Warm-up exceptions are LOGGED, not discarded: the timed shot will
    // surface a persistent failure anyway, but a warm-up-only failure
    // (e.g. a fixture that only breaks cold) would otherwise hide until
    // it flips the timed run on some other box. Note the protocol
    // consequence, documented in SCALE.md: the timed shot runs against
    // a warm JIT/page cache BY DESIGN (matching Bench's discipline for
    // the sf0.1 denominators), so ratio regressions here are plan-shape
    // signals, not cold-start ones.
    def warmOnce(name: String, fn: (SparkSession, String) => DataFrame): Unit = {
      try { fn(spark, outDir).count(); () } catch { case t: Throwable =>
        System.err.println(s"[scale-spot] warm-up of $name failed: ${t.getMessage}")
      }
      spark.catalog.clearCache()
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    }
    var times = chosen.flatMap { name =>
      qs.get(name).map { fn => warmOnce(name, fn); name -> timeOnce(fn, name) }
    }.toMap
    // SCALING CEILING: each query's sf1 time must stay within
    // `Ceiling` × linear of its committed sf0.1 median (bench_full
    // .json). Single-shot sf1 samples are noisy — a first-invocation
    // fixture build or suite contention reads as fake super-linearity
    // (r12's a10_pivot "×13.6" was 4.6 s cold vs 0.38 s steady) — so a
    // suspect re-runs up to `Retries` more times and the MIN decides.
    // Sub-`AbsFloor` rows never flag: a 0.3 s query tripling is noise,
    // not a scale regression.
    val ceiling = sys.env.get("SPARK_GRAFT_SCALE_CEILING")
      .flatMap(_.toDoubleOption).getOrElse(2.0)
    val AbsFloor = 3.0
    val Retries = 2
    // PAIR-BOUNDED rows: the 10× staging copies each document VERBATIM
    // under shifted ids, so every text gains 10 byte-identical twins
    // and the TRUE near-dup pair count grows C(10,2)/10 = 4.5× beyond
    // linear-in-input. These rows' work is their OUTPUT (candidate
    // pairs emitted and verified), so their ceiling scales by that
    // factor — still a hard bound (a pair row at 10× linear fails),
    // just against the right yardstick.
    val PairGrowth = 4.5
    val pairBounded = Set(
      "l2_minhash_lsh_neardup", "l2_simhash_neardup", "l2_dedup_clusters",
      "l4_ngram_jaccard_pairs", "l4_embedding_neardup", "l9_incremental_neardup")
    def ceilingFor(name: String): Double =
      if (pairBounded(name)) ceiling * PairGrowth else ceiling
    val baseline: Map[String, Double] =
      try {
        val row = spark.read.json("bench_full.json").select(col("queries.*")).head()
        row.schema.fieldNames.zipWithIndex.map { case (n, i) =>
          n -> (row.get(i) match {
            case d: java.lang.Double => d.doubleValue()
            case l: java.lang.Long => l.toDouble
            case other => Option(other).map(_.toString.toDouble).getOrElse(0.0)
          })
        }.toMap
      } catch { case e: Throwable =>
        System.err.println(s"[scale-spot] no sf0.1 baseline (bench_full.json): $e")
        Map.empty
      }
    def ratioOf(name: String, t: Double): Option[Double] =
      baseline.get(name).filter(_ > 0).map(b => t / (Copies * b))
    val violations = scala.collection.mutable.SortedMap[String, Double]()
    chosen.filter(n => qs.contains(n) && !errors.contains(n)).foreach { name =>
      val cap = ceilingFor(name)
      var t = times(name)
      var tries = 0
      while (t > AbsFloor && ratioOf(name, t).exists(_ > cap) && tries < Retries) {
        System.err.println(f"[scale-spot] $name ${t}%.2fs over ${cap}x linear — re-running")
        t = math.min(t, timeOnce(qs(name), name))
        tries += 1
      }
      times = times.updated(name, t)
      if (t > AbsFloor) ratioOf(name, t).filter(_ > cap).foreach { r =>
        violations(name) = math.rint(r * 100) / 100
        System.err.println(f"[scale-spot] VIOLATION $name: ${t}%.2fs = $r%.2fx linear (cap ${cap}x)")
      }
    }
    def jstr(s: String) = Q.jstr(s)
    val ordered = chosen.filter(times.contains)
    val qjson = ordered.map { k =>
      s"${jstr(k)}:${math.rint(times(k) * 1000) / 1000}"
    }.mkString("{", ",", "}")
    val rjson = ordered.flatMap(k => ratioOf(k, times(k)).map(r =>
      s"${jstr(k)}:${math.rint(r * 100) / 100}")).mkString("{", ",", "}")
    val vjson = violations.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val total = math.rint(ordered.map(times).sum * 1000) / 1000
    val ejson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val all = sys.env.contains("SPARK_GRAFT_SCALE_ALL")
    val metric = if (all) "scale_full_total" else "scale_spot_total"
    val line =
      s"""{"metric":"$metric","value":$total,"unit":"sec","copies":$Copies,"base":${jstr(baseDir)},"ceiling":$ceiling,"violations":$vjson,"errors":$ejson,"ratios":$rjson,"queries":$qjson}"""
    println(line)
    val w = new java.io.PrintWriter(
      if (all) "bench_scale_full.json" else "bench_scale_spot.json")
    try w.println(line) finally w.close()
    spark.stop()
    if (errors.nonEmpty || violations.nonEmpty) sys.exit(1)
  }

  /** Stage the 10× slice (idempotent: skips when the marker matches). */
  private[graft] def stage(spark: SparkSession, baseDir: String, outDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    // The marker encodes the BASE dir: re-staging from a different base
    // into the same outDir must not silently bench the stale copy.
    val baseTag = java.lang.Integer.toHexString(baseDir.hashCode)
    val marker = Paths.get(outDir, s"_staged_${Copies}x_v2_$baseTag")
    if (Files.exists(marker)) return
    Files.createDirectories(Paths.get(outDir))
    def base(t: String): DataFrame = spark.read.parquet(s"$baseDir/$t.parquet")
    def offsetOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1
    // Dimension tables: fixed, every copy's FKs resolve against them.
    for (t <- Seq("region", "nation", "part", "supplier"))
      base(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    val custOff = offsetOf(base("customer"), "c_custkey")
    val ordOff = offsetOf(base("orders"), "o_orderkey")
    val evtOff = offsetOf(base("events"), "event_id")
    val docOff = offsetOf(base("documents"), "doc_id")
    val vecOff = offsetOf(base("embeddings"), "vec_id")
    def scaled(t: String, shifts: Map[String, Long]): DataFrame = {
      val b = base(t)
      (0 until Copies).map { i =>
        shifts.foldLeft(b) { case (df, (c, off)) =>
          df.withColumn(c, col(c) + lit(i * off))
        }
      }.reduce(_ unionAll _)
    }
    // part/supplier stay 1× (dimensions): l_partkey/l_suppkey are NOT
    // shifted, so every copy's lineitems still join them — the TPC-H
    // dim-versus-fact scaling shape.
    scaled("customer", Map("c_custkey" -> custOff))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    scaled("orders", Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    scaled("lineitem", Map("l_orderkey" -> ordOff))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // events must land as a single parquet FILE (not a directory): the
    // streaming harness stages `<dir>/events.parquet` with a file
    // copy, and a directory there stages as an empty dir → schema
    // inference fails for every file-stream fixture.
    val evTmp = s"$outDir/_events_tmp"
    scaled("events", Map("event_id" -> evtOff, "user_id" -> custOff))
      .coalesce(1).write.mode("overwrite").parquet(evTmp)
    val partList = Files.list(Paths.get(evTmp))
    val part =
      try partList.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $evTmp"))
      finally partList.close()
    val evDst = Paths.get(s"$outDir/events.parquet")
    if (Files.isDirectory(evDst)) {
      val s = Files.list(evDst)
      try s.iterator().asScala.foreach(Files.delete) finally s.close()
      Files.delete(evDst)
    } else Files.deleteIfExists(evDst): Unit
    Files.move(part, evDst)
    val rest = Files.list(Paths.get(evTmp))
    try rest.iterator().asScala.foreach(Files.delete) finally rest.close()
    Files.delete(Paths.get(evTmp))
    scaled("documents", Map("doc_id" -> docOff))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaled("embeddings", Map("vec_id" -> vecOff))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    Files.createFile(marker)
    ()
  }
}
