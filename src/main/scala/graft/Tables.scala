package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy long) and convert to a
    * microsecond TimestampType by truncation — the same ns→µs truncation
    * DuckDB applies, so oracle comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `div`, not `/`: ns epochs (~1.7e18) exceed a double's 53-bit
    // mantissa, so float division truncates off-by-1µs on some rows —
    // invisible to windowed aggregates, fatal to exact-µs arithmetic
    // (w5_sessionize durations). Integer division is exact.
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
