package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope): run selected registry queries once with a
  * StreamingQueryListener attached, printing each micro-batch's progress
  * JSON — batch count, durationMs breakdown (addBatch, getBatch,
  * queryPlanning, walCommit, commitOffsets), and state operator metrics.
  *
  *   sbt 'Test/runMain graft.StreamProfileMain st2_tumbling_window'
  */
object StreamProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] START ${e.name} ${e.id}")
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} stateOps=${p.stateOperators.length}")
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] END ${e.id}")
    })
    // Per-job trace (GRAFT_JOBS=1): job id, duration, task count, and
    // the first line of the call site / description — attributes each
    // of a driver-bound row's jobs to the statement that ran it.
    if (sys.env.get("GRAFT_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0.put(j.jobId, System.nanoTime())
          val desc = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          println(s"[job] start ${j.jobId} stages=${j.stageIds.length} $desc")
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = Option(t0.get(j.jobId)).map(t => (System.nanoTime() - t) / 1e6).getOrElse(-1.0)
          println(f"[job] end   ${j.jobId} ${ms}%.0fms")
        }
      })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.foreach { name =>
      println(s"[stream] ==== $name ====")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[stream] ==== $name wall=${(System.nanoTime() - t0) / 1e9}%.3f ====")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
