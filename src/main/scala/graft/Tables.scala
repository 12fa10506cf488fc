package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central loader for the driver-generated parquet tables
  * (/root/repo/TESTDATA.md). One parquet file per table under the
  * scale-factor dir passed to every query.
  *
  * Scale note: `spark.read.parquet` gives the vectorized columnar scan
  * with predicate pushdown + column pruning — at 100 TB the same call
  * reads a partitioned directory tree and Catalyst prunes partitions;
  * nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** The driver has shipped `events.ts` in two physical encodings across
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only accepts as a raw long via `nanosAsLong`) and
    * plain TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ). Adapt on the actual file schema so a testdata
    * regeneration cannot silently break every events query: either way
    * the column is normalized to a µs-precision TimestampType, which with
    * the session timezone pinned to UTC is value-identical to DuckDB's
    * naive TIMESTAMP reading of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      // `div`, not `/`: ns epochs (~1.7e18) exceed a double's 53-bit
      // mantissa, so float division truncates off-by-1µs on some rows —
      // invisible to windowed aggregates, fatal to exact-µs arithmetic
      // (w5_sessionize durations). Integer division is exact.
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view (used by SQL-entry queries and
    * tests). `events` goes through its ns→µs loader — a plain read
    * throws on the TIMESTAMP(NANOS) column unless the legacy conf is
    * already set.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
