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
        spark.sql("DROP TABLE IF EXISTS graft.demo.nd_sz PURGE")
        spark.sql("CREATE TABLE graft.demo.nd_idx (g BIGINT, doc_id BIGINT) USING graft")
        spark.sql("CREATE TABLE graft.demo.nd_sz (doc_id BIGINT, sz INT) USING graft")
      }
      val corpus = sh.filter(col("doc_id") % 2 === 0)
      t("append postings") {
        corpus.select(explode(col("sh")).as("g"), col("doc_id"))
          .writeTo("graft.demo.nd_idx").append()
      }
      t("append sizes") {
        corpus.select(col("doc_id"), size(col("sh")).as("sz"))
          .writeTo("graft.demo.nd_sz").append()
      }
      t("probe (l9ProbeIndex count)") {
        val n = graft.queries.SimilarityQueries.l9ProbeIndex(
          spark.table("graft.demo.nd_idx").select(col("g"), col("doc_id").as("j")),
          spark.table("graft.demo.nd_sz")
            .select(col("doc_id").as("j"), col("sz").as("szj")),
          sh.filter(col("doc_id") % 2 === 1)
            .select(col("doc_id").as("i"), col("sh").as("sh_i"))).count()
        println(s"[l9prof]   pairs: $n")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
