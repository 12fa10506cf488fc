package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming plumbing (SURVEY.md §2b ST1–ST9).
  *
  * `eventsStream` replays the judged `events` parquet as an unbounded
  * file-source stream; `runToBatch` drives a streaming DataFrame to
  * completion with `Trigger.AvailableNow` into a memory sink and returns
  * the materialized result as a batch DataFrame. That keeps every ST
  * operator on the real incremental execution path (state store,
  * watermarks, output modes) while still producing a deterministic
  * DataFrame the differential oracle can hash.
  *
  * At 100 TB the same code points `readStream` at an arriving directory
  * tree and swaps the memory sink for a parquet/Kafka sink — the plan,
  * state management, and watermark semantics are identical; only the
  * boundary I/O changes.
  */
object StreamingOps {

  /** The file stream source needs an explicit schema; probe the staged
    * file's REAL batch schema instead of hardcoding one. The driver has
    * shipped `events.ts` as both TIMESTAMP(NANOS) (readable only as a raw
    * long via `nanosAsLong`) and plain TIMESTAMP(MICROS)/NTZ across
    * testdata generations — a hardcoded LongType schema silently read the
    * µs-encoded int64 as a long and compressed every timestamp 1000×
    * (wrong window counts, not an error). Probing is a driver-side
    * footer read, negligible next to starting a streaming query.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def probedSchema(spark: SparkSession, stagedDir: String): StructType = {
    // Footer-schema probe memoized per (staged file, size, mtime) — the
    // bare read is a Spark JOB per stream start (the Tables.table
    // discipline); the key invalidates when the staged copy is
    // refreshed after testdata regeneration.
    val f = java.nio.file.Paths.get(stagedDir, "events.parquet").toFile
    // nanosAsLong folded into the key (the Tables.table discipline):
    // the inferred type of events.ts depends on it.
    val nanosFlag = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val key = s"$stagedDir:${f.length}:${f.lastModified}:$nanosFlag"
    var schema = schemaCache.get(key)
    if (schema == null) {
      schema = spark.read.parquet(stagedDir).schema
      schemaCache.put(key, schema)
    }
    schema
  }

  /** The file stream source lists a DIRECTORY of arriving files; the
    * testdata table is a single file, so stage it into a per-sf temp dir.
    * The copy is refreshed whenever the source's size or mtime differs —
    * a skip-if-exists copy would silently replay STALE bytes against a
    * fresh batch oracle after testdata regeneration. At 100 TB the
    * directory IS the ingest landing zone and this staging step
    * disappears.
    */
  private def stagedEventsDir(dir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // "d" prefix: the sanitized name would otherwise start with "_"
    // (from the leading "/"), and Hadoop treats leading-underscore
    // basenames as HIDDEN paths — batch-side resolution then logs
    // "All paths were ignored" per stream start and any listing-based
    // consumer would skip the directory outright.
    val stage = Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_stream",
      "d" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
    Files.createDirectories(stage)
    val src = Paths.get(dir, "events.parquet")
    val dst = stage.resolve("events.parquet")
    val stale = !Files.exists(dst) ||
      Files.size(dst) != Files.size(src) ||
      Files.getLastModifiedTime(dst) != Files.getLastModifiedTime(src)
    if (stale) {
      try Files.copy(src, dst,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.COPY_ATTRIBUTES)
      catch {
        case e: java.nio.file.FileSystemException =>
          // Tolerate ONLY a lost race with a concurrent stager that
          // completed the identical copy; any other failure (disk full,
          // permissions, truncated dst) must not silently hand stale or
          // partial bytes to a query whose oracle reads fresh data.
          if (!(Files.exists(dst) && Files.size(dst) == Files.size(src))) throw e
      }
    }
    stage.toString
  }

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    // Deliberately session-wide and NOT restored, matching
    // Tables.events (the batch loader): both entry points must read
    // the driver's ns-encoded events parquet identically for the whole
    // session, and the flag must still be set when the lazy stream
    // plans its batches. The only TIMESTAMP(NANOS) source in the
    // harness is this table, and both loaders canonicalize ts to
    // micros right here, so no other read observes the flag.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staged = stagedEventsDir(dir)
    val schema = probedSchema(spark, staged)
    val raw = spark.readStream.schema(schema).parquet(staged)
    schema("ts").dataType match {
      // ns-as-long generation: exact integer ns→µs truncation (same as
      // DuckDB's read of the same file).
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Run a streaming DataFrame to completion into a memory sink; return
    * the sink table. `complete` mode for windowed aggregations (all
    * windows emitted at end), `append`/`update` for row-wise ops.
    */
  /** State partitions for the replay harness. State-store commit
    * overhead scales with partition count (delta files + maintenance
    * per partition per batch), and the judged replay is a single batch
    * of ≤1M rows — 4 partitions more than covers it (measured: 32→8
    * halves stream-stream join wall time; 8→4 shaves another ~20% off
    * the join and is noise-level for the rest). On a real cluster this is
    * sized to the stateful workload's parallelism, not the relational
    * shuffle default — which is exactly why it's set per streaming
    * query and restored after.
    */
  val StatePartitions = 4

  /** Conf override for [[StatePartitions]] — the stateful workload's
    * parallelism knob (a real deployment sizes this to its state
    * volume, not the relational shuffle default, which is why it is a
    * separate conf at all).
    */
  private def statePartitions(spark: SparkSession): String =
    spark.conf.get("spark.graft.streaming.statePartitions", StatePartitions.toString)

  def runToBatch(
      spark: SparkSession,
      sdf: DataFrame,
      mode: String,
      name: String): DataFrame = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevRetain = spark.conf.getOption("spark.sql.streaming.minBatchesToRetain")
    // Default 100 retained state snapshots is recovery-window tuning a
    // bounded replay doesn't need.
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions(spark))
    try {
      sdf.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevRetain match {
        case Some(v) => spark.conf.set("spark.sql.streaming.minBatchesToRetain", v)
        case None => spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
      }
    }
    // Materialize off the sink and drop it: the memory sink holds the
    // full result on the driver, and leaked sink tables from a batch of
    // streaming queries degrade later queries in the same session.
    // (r21 measured a LocalRelation lift of the sink rows instead —
    // fewer jobs on paper, but two st-family A/Bs showed no win, so the
    // checkpointed form stays.)
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** Drive a streaming DataFrame through `foreachBatch` to completion
    * (same conf discipline as [[runToBatch]]). For queries whose raw
    * stream output is large but whose per-batch AGGREGATE is small —
    * e.g. a stream-stream join emitting O(pairs) rows that reduce to a
    * handful of groups: the reduction runs on the executors inside each
    * micro-batch and only the reduced rows ever reach the driver,
    * instead of the memory sink accumulating every raw pair.
    */
  def runForeachBatch(
      spark: SparkSession,
      sdf: DataFrame,
      f: (DataFrame, Long) => Unit): Unit = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions(spark))
    try {
      sdf.writeStream
        .outputMode("append")
        .foreachBatch(f)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
