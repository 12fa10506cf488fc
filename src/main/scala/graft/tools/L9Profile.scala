package graft.tools

// TEMPORARY profiling harness for the l9_incremental_neardup sf1 drift
// (round-17 judge ask #3). Deleted once the regression is understood.
import org.apache.spark.sql.SparkSession

object L9Profile {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ScaleSpot.stage(spark, "/root/testdata/sf0.1", outDir)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[l9prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)"); r
    }
    t("index build")(graft.queries.SimilarityQueries.ensureL9Index(spark, outDir))
    val fn = graft.SparkEntry.queries("l9_incremental_neardup")
    (1 to 3).foreach { i =>
      t(s"probe $i")(fn(spark, outDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
