package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope, not shipped): time + explain a subset of
  * registry queries while iterating on plans.
  *
  *   sbt 'Test/runMain graft.QueryTimerMain l8_ngram_decontaminate'
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * GRAFT_EXPLAIN=1 to dump the formatted plan.
  */
object QueryTimerMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.getOrElse("GRAFT_REPS", "3").toInt
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val e = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        e
      }
      println(f"[timer] $name%-32s median=${times.sorted.apply(reps / 2)}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
