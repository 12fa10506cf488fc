package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Engine default: storage-partitioned joins consume the catalog's
      // KeyGroupedPartitioning (set at build, not per-query — a session
      // conf toggled inside a query closure would not survive to the
      // harness's later execution of the returned DataFrame).
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions()) // native fns + V2 view DDL/read
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Name-prefix filter for iterating on individual queries (the
    // oracle_sql.json dump is filtered identically so check_oracle.py
    // compares exactly the dumped subset); empty = full suite.
    val filter = sys.env.getOrElse("SPARK_GRAFT_VERIFY_FILTER", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    def keep(n: String): Boolean = filter.isEmpty || filter.exists(n.startsWith)
    var failed = 0
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir).persist()
        // Single-file output preserves the query's ORDER BY for the
        // driver's hash compare, but an unconditional coalesce(1) would
        // serialize a genuinely large result through one task — cap it.
        val n = df.count()
        val out = if (n <= 1000000L) df.coalesce(1) else df
        out.write.mode("overwrite").parquet(s"$outDir/$name")
        df.unpersist()
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // Drop caches persisted inside the query — accumulated entries
        // slow CacheManager plan lookup for every later query.
        spark.catalog.clearCache()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = Q.jstr(s)
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // A failed dump must flip the EXIT CODE (the Bench discipline): a
    // harness iterating dump dirs instead of oracle keys would
    // otherwise silently score the round on the surviving subset.
    if (failed > 0) {
      System.err.println(s"[verify] $failed quer${if (failed == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
