package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (test scope): stage-by-stage timing of the L9 pipeline
  * to localize regressions. `sbt 'Test/runMain graft.L9ProfileMain'`.
  */
object L9ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[l9prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[l9prof] --- rep $rep ---")
      val sh = t("shingles (persist+count)") {
        val s = graft.queries.SimilarityQueries
          .shingleHashesOf(Tables.documents(spark, dir)).filter(size(col("sh")) > 0)
        s.count(); s
      }
      t("drop+create") {
        spark.sql("DROP TABLE IF EXISTS graft.demo.nd_idx PURGE")
        spark.sql("DROP TABLE IF EXISTS graft.demo.nd_docs PURGE")
        spark.sql("CREATE TABLE graft.demo.nd_idx (g BIGINT, doc_id BIGINT) USING graft")
        spark.sql(
          "CREATE TABLE graft.demo.nd_docs (doc_id BIGINT, sh ARRAY<BIGINT>) USING graft")
      }
      val corpus = sh.filter(col("doc_id") % 2 === 0)
      t("append postings") {
        corpus.select(explode(col("sh")).as("g"), col("doc_id"))
          .writeTo("graft.demo.nd_idx").append()
      }
      t("append doc arrays") {
        corpus.select(col("doc_id"), col("sh")).writeTo("graft.demo.nd_docs").append()
      }
      val idx = spark.table("graft.demo.nd_idx").select(col("g"), col("doc_id").as("j"))
      val hotG = t("hotG agg (count)") {
        val h = idx.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") > graft.queries.SimilarityQueries.L9HotDf)
          .select(col("g")).persist()
        println(s"[l9prof]   hot shingles: ${h.count()}")
        h
      }
      val batch = sh.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("i"), col("sh").as("sh_i"))
      val probeEx = batch.select(col("i"), explode(col("sh_i")).as("g"))
      t("hotDom isEmpty") {
        val hotCnt = probeEx.join(broadcast(hotG), Seq("g"))
          .groupBy(col("i")).agg(count(lit(1)).as("hotCnt"))
        val hd = batch.select(col("i"), size(col("sh_i")).cast("long").as("total"))
          .join(hotCnt, Seq("i"), "left")
          .withColumn("rareCnt", col("total") - coalesce(col("hotCnt"), lit(0L)))
          .filter(col("rareCnt") * 5 <= col("total")).select(col("i"))
        println(s"[l9prof]   hotDom empty: ${hd.isEmpty}")
      }
      val candRare = t("candRare count") {
        val rareIdx = idx.join(broadcast(hotG), Seq("g"), "left_anti")
        val c = probeEx.join(rareIdx.select(col("g"), col("j")), Seq("g"))
          .select(col("i"), col("j"))
        println(s"[l9prof]   candidate rows: ${c.count()}")
        c
      }
      t("verify join") {
        val n = candRare.dropDuplicates("i", "j")
          .join(batch, Seq("i"))
          .join(spark.table("graft.demo.nd_docs")
            .select(col("doc_id").as("j"), col("sh").as("sh_j")), Seq("j"))
          .withColumn("ninter",
            size(array_intersect(col("sh_i"), col("sh_j"))).cast("double"))
          .withColumn("jac",
            col("ninter") / (size(col("sh_i")) + size(col("sh_j")) - col("ninter")))
          .filter(col("jac") >= 0.8).count()
        println(s"[l9prof]   pairs: $n")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
