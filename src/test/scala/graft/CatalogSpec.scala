package graft

import org.scalatest.funsuite.AnyFunSuite

/** TableCatalog contract tests for graft.sources.GraftCatalog — the
  * lifecycle is driven through SQL (the analyzer/catalog-manager path a
  * user hits), not by calling the catalog object directly.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s
  }
  import spark.implicits._

  test("create / insert / select round-trip through SQL") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.kv")
    spark.sql("CREATE TABLE graft.t1.kv (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.t1.kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT k, v FROM graft.t1.kv ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // Second INSERT appends (two-phase commit per job, rows merge).
    spark.sql("INSERT INTO graft.t1.kv VALUES (4, 'd')")
    assert(spark.sql("SELECT count(*) FROM graft.t1.kv").as[Long].head() == 4L)
    // INSERT OVERWRITE truncates first.
    spark.sql("INSERT OVERWRITE graft.t1.kv VALUES (9, 'z')")
    assert(spark.sql("SELECT k, v FROM graft.t1.kv").as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
    spark.sql("DROP TABLE graft.t1.kv")
  }

  test("identifier lifecycle: list, rename, drop, missing-table error") {
    spark.sql("DROP TABLE IF EXISTS graft.t2.a")
    spark.sql("DROP TABLE IF EXISTS graft.t2.b")
    spark.sql("CREATE TABLE graft.t2.a (x INT) USING graft")
    assert(spark.sql("SHOW TABLES IN graft.t2").select("tableName")
      .as[String].collect().toSeq == Seq("a"))
    // The RENAME target is resolved INSIDE the source's catalog — no
    // catalog prefix (with one, "graft" would parse as a namespace).
    spark.sql("ALTER TABLE graft.t2.a RENAME TO t2.b")
    assert(spark.sql("SHOW TABLES IN graft.t2").select("tableName")
      .as[String].collect().toSeq == Seq("b"))
    // Reads resolve the NEW identifier; the old one is gone.
    spark.sql("INSERT INTO graft.t2.b VALUES (7)")
    assert(spark.sql("SELECT x FROM graft.t2.b").as[Int].head() == 7)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.t2.a").collect()
    }
    assert(spark.sql("DROP TABLE graft.t2.b").collect().isEmpty)
    assert(spark.sql("SHOW TABLES IN graft.t2").collect().isEmpty)
  }

  test("DELETE FROM and TRUNCATE TABLE rewrite committed rows through the catalog") {
    spark.sql("DROP TABLE IF EXISTS graft.t4.d")
    spark.sql("CREATE TABLE graft.t4.d (k BIGINT, name STRING) USING graft")
    spark.sql("INSERT INTO graft.t4.d VALUES (1,'a'), (2,'b'), (3,'c'), (4, NULL)")
    spark.sql("DELETE FROM graft.t4.d WHERE k >= 3 OR name = 'a'")
    assert(spark.sql("SELECT k FROM graft.t4.d").as[Long].collect().toSeq == Seq(2L))
    // NULL name row: `name = 'a'` is not provably true -> row survives a
    // delete keyed on it, is removed by IS NULL.
    spark.sql("INSERT INTO graft.t4.d VALUES (5, NULL)")
    spark.sql("DELETE FROM graft.t4.d WHERE name IS NULL")
    assert(spark.sql("SELECT k FROM graft.t4.d").as[Long].collect().toSeq == Seq(2L))
    // A predicate the source can't prove must REJECT, not misdelete.
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM graft.t4.d WHERE k + 1 = 3")
    }
    assert(spark.sql("SELECT count(*) FROM graft.t4.d").as[Long].head() == 1L)
    spark.sql("TRUNCATE TABLE graft.t4.d")
    assert(spark.sql("SELECT count(*) FROM graft.t4.d").as[Long].head() == 0L)
    spark.sql("DROP TABLE graft.t4.d")
  }

  test("catalog-resolved function: graft.math.clamp matches the greatest/least composition") {
    val out = spark.sql(
      """SELECT graft.math.clamp(CAST(x AS DOUBLE), 2.0, 5.0) AS c,
        |       greatest(2.0, least(CAST(x AS DOUBLE), 5.0)) AS ref
        |FROM VALUES (-10), (2), (3), (5), (99) AS t(x)""".stripMargin)
    assert(out.filter($"c" =!= $"ref").count() == 0)
    assert(out.select("c").as[Double].collect().toSeq == Seq(2.0, 2.0, 3.0, 5.0, 5.0))
    // Unknown function goes through the catalog's error path, not a
    // session-registry miss.
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft.math.nope(1.0)").collect()
    }
    // Type mismatch is rejected at bind time.
    intercept[Exception] {
      spark.sql("SELECT graft.math.clamp('a', 'b', 'c')").collect()
    }
  }

  test("create rejects a duplicate identifier; analyzer enforces the declared schema") {
    spark.sql("DROP TABLE IF EXISTS graft.t3.once")
    spark.sql("CREATE TABLE graft.t3.once (x INT) USING graft")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("CREATE TABLE graft.t3.once (y INT) USING graft")
    }
    // Arity mismatch is caught by the analyzer against the CATALOG's
    // schema — proving loadTable supplies it.
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("INSERT INTO graft.t3.once VALUES (1, 2)")
    }
    spark.sql("DROP TABLE graft.t3.once")
  }
}
