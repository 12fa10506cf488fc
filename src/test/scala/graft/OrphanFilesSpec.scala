package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** `CALL graft.system.remove_orphan_files(ns, table, older_than_ms)`:
  * deletes only files NO catalog state references — current segments,
  * retained (time-travel) snapshots, and files shared with zero-copy
  * clones/branches all survive; the age guard protects in-flight
  * writers.
  */
class OrphanFilesSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s
  }
  import graft.sources.GraftCatalog

  private def dirOf(ns: String, t: String): java.nio.file.Path = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    // DESCRIBE-visible location is internal; reach the entry dir via a
    // segment file's parent (observability helper counts files there).
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), t)
    cat.loadTable(ident)
    val seg = GraftCatalog.segmentPaths(ns, t).head
    Paths.get(seg).getParent
  }

  test("orphans are deleted; current, historical, and nested referenced files survive") {
    spark.sql("DROP TABLE IF EXISTS graft.gc.orph")
    spark.sql("CREATE TABLE graft.gc.orph (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.gc.orph VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT OVERWRITE graft.gc.orph VALUES (3, 'c')")      // v2; v1 files now history-only
    val dir = dirOf("gc", "orph")
    val stray = dir.resolve("seg-deadbeef-crashed-writer.graft")
    Files.write(stray, Array.fill[Byte](64)(7))
    val sub = Files.createDirectory(dir.resolve("tmp-staging"))
    val strayNested = sub.resolve("part-000.tmp")
    Files.write(strayNested, Array.fill[Byte](32)(9))
    def regularFiles(): Int = {
      val w = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.count(Files.isRegularFile(_))
      } finally w.close()
    }
    val before = regularFiles()

    val r = spark.sql(
      "CALL graft.system.remove_orphan_files('gc', 'orph', 0)").collect()(0)
    assert(r.getInt(1) == 2, "exactly the two planted strays are orphans")
    assert(r.getLong(2) == 96L, "bytes accounted for both strays")
    assert(!Files.exists(stray) && !Files.exists(strayNested))
    assert(regularFiles() == before - 2, "no referenced file was touched")
    // The table AND its retained pre-overwrite snapshot still read.
    assert(spark.table("graft.gc.orph").count() == 1L)
    assert(spark.sql("SELECT count(*) FROM graft.gc.orph VERSION AS OF 1")
      .collect()(0).getLong(0) == 2L,
      "history-referenced segments are NOT orphans")
    spark.sql("DROP TABLE graft.gc.orph")
  }

  test("files shared with a zero-copy clone survive the source's orphan sweep") {
    spark.sql("DROP TABLE IF EXISTS graft.gc.src")
    spark.sql("DROP TABLE IF EXISTS graft.gc.cl")
    spark.sql("CREATE TABLE graft.gc.src (k BIGINT) USING graft")
    spark.sql("INSERT INTO graft.gc.src VALUES (1), (2), (3)")
    spark.sql("CALL graft.system.clone('gc', 'src', 'gc', 'cl', '')")
    // Source moves on and manually expires its own history: its old
    // file is now referenced ONLY by the clone — still not an orphan.
    spark.sql("INSERT OVERWRITE graft.gc.src VALUES (9)")
    spark.sql("CALL graft.system.vacuum('gc', 'src')")
    val r = spark.sql(
      "CALL graft.system.remove_orphan_files('gc', 'src', 0)").collect()(0)
    assert(r.getInt(1) == 0, "clone-shared files are referenced, not orphans")
    assert(spark.table("graft.gc.cl").count() == 3L, "clone still reads its shared file")
    assert(spark.table("graft.gc.src").count() == 1L)
    spark.sql("DROP TABLE graft.gc.src")
    spark.sql("DROP TABLE graft.gc.cl")
  }

  test("the age guard spares young files; negative guard refuses") {
    spark.sql("DROP TABLE IF EXISTS graft.gc.age")
    spark.sql("CREATE TABLE graft.gc.age (k BIGINT) USING graft")
    spark.sql("INSERT INTO graft.gc.age VALUES (1)")
    val dir = dirOf("gc", "age")
    val young = dir.resolve("seg-in-flight-writer.graft")
    Files.write(young, Array.fill[Byte](16)(1))
    val r = spark.sql(
      "CALL graft.system.remove_orphan_files('gc', 'age', 3600000)").collect()(0)
    assert(r.getInt(1) == 0, "a just-written file must survive a 1h guard")
    assert(Files.exists(young))
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.remove_orphan_files('gc', 'age', -5)").collect()
    }
    assert(e.getMessage.contains("older_than_ms"))
    spark.sql("DROP TABLE graft.gc.age")
  }
}
