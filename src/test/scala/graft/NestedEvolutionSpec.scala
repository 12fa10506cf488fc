package graft

import org.scalatest.funsuite.AnyFunSuite

/** Nested (one-level) struct field evolution: `ADD COLUMNS (meta.c T)`
  * and `DROP COLUMN meta.b` rebuild the parent struct row-by-row
  * through the same streamed re-projection as top-level DROP/widen
  * (positional storage keeps a struct's inner layout inside each row's
  * bytes), preserving NULL parents as NULL; `RENAME COLUMN meta.a TO x`
  * is pure schema metadata — inner names key nothing, zero file I/O.
  */
class NestedEvolutionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s
  }
  import spark.implicits._

  test("ADD a nested field: old rows read NULL, NULL structs stay NULL") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.a PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.a (k BIGINT, meta STRUCT<a: STRING, b: INT>) USING graft")
    spark.sql(
      "INSERT INTO graft.ne.a VALUES (1, named_struct('a', 'x', 'b', 10)), (2, NULL)")
    spark.sql("ALTER TABLE graft.ne.a ADD COLUMNS (meta.c DOUBLE)")
    assert(spark.table("graft.ne.a").schema("meta").dataType.simpleString ==
      "struct<a:string,b:int,c:double>")
    val rows = spark.sql("SELECT k, meta.a, meta.b, meta.c FROM graft.ne.a ORDER BY k")
      .collect()
    assert(rows(0).getString(1) == "x" && rows(0).getInt(2) == 10 && rows(0).isNullAt(3),
      "pre-evolution row keeps values, new field reads NULL")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3),
      "a NULL struct must stay NULL, not become a struct of nulls")
    assert(spark.sql("SELECT count(*) FROM graft.ne.a WHERE meta IS NULL")
      .as[Long].head() == 1L)
    // New writes fill the evolved shape; both eras aggregate together.
    spark.sql(
      "INSERT INTO graft.ne.a VALUES (3, named_struct('a', 'y', 'b', 20, 'c', 2.5))")
    assert(spark.sql("SELECT sum(meta.b) FROM graft.ne.a").as[Long].head() == 30L)
    assert(spark.sql("SELECT sum(meta.c) FROM graft.ne.a").as[Double].head() == 2.5)
    spark.sql("DROP TABLE graft.ne.a PURGE")
  }

  test("RENAME a nested field is metadata-only: same files, no snapshot rewrite") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.r PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.r (k BIGINT, meta STRUCT<a: STRING, b: INT>) USING graft")
    spark.sql("INSERT INTO graft.ne.r VALUES (1, named_struct('a', 'x', 'b', 7))")
    val filesBefore = spark.sql("SELECT path FROM graft.ne.r.files")
      .as[String].collect().toSet
    spark.sql("ALTER TABLE graft.ne.r RENAME COLUMN meta.a TO label")
    assert(spark.sql("SELECT meta.label FROM graft.ne.r").as[String].head() == "x")
    intercept[Exception] { spark.sql("SELECT meta.a FROM graft.ne.r").collect() }
    assert(spark.sql("SELECT path FROM graft.ne.r.files").as[String].collect().toSet
      == filesBefore, "nested rename must not rewrite any file")
    // Collisions and non-struct parents refuse.
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.r RENAME COLUMN meta.label TO b")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.r RENAME COLUMN k.x TO y")
    }
    spark.sql("DROP TABLE graft.ne.r PURGE")
  }

  test("WIDEN a nested field (int -> bigint): values exact, NULL structs intact, lossy refuses") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.w PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.w (k BIGINT, meta STRUCT<a: STRING, b: INT>) USING graft")
    spark.sql(
      "INSERT INTO graft.ne.w VALUES (1, named_struct('a', 'x', 'b', 2147483647)), (2, NULL)")
    spark.sql("ALTER TABLE graft.ne.w ALTER COLUMN meta.b TYPE BIGINT")
    assert(spark.table("graft.ne.w").schema("meta").dataType.simpleString ==
      "struct<a:string,b:bigint>")
    // Post-widen inserts exceed int range; the pre-widen era decodes exactly.
    spark.sql("INSERT INTO graft.ne.w VALUES (3, named_struct('a', 'y', 'b', 5000000000))")
    assert(spark.sql("SELECT sum(meta.b) FROM graft.ne.w").as[Long].head() ==
      2147483647L + 5000000000L)
    assert(spark.sql("SELECT count(*) FROM graft.ne.w WHERE meta IS NULL")
      .as[Long].head() == 1L, "NULL struct survives the nested widen")
    intercept[Exception] { // narrowing refuses
      spark.sql("ALTER TABLE graft.ne.w ALTER COLUMN meta.b TYPE INT")
    }
    spark.sql("DROP TABLE graft.ne.w PURGE")
  }

  test("ADD COLUMNS honors FIRST/AFTER; ALTER COLUMN repositions via permutation rewrite") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.p PURGE")
    spark.sql("CREATE TABLE graft.ne.p (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.ne.p VALUES (1, 'a'), (2, 'b')")
    // Positioned adds: one FIRST, one AFTER an old column, one AFTER a
    // column added in the SAME statement.
    spark.sql(
      """ALTER TABLE graft.ne.p ADD COLUMNS
        |  (z INT FIRST, m DOUBLE AFTER k, m2 DOUBLE AFTER m)""".stripMargin)
    assert(spark.table("graft.ne.p").schema.fieldNames.toSeq ==
      Seq("z", "k", "m", "m2", "v"), "FIRST/AFTER order must be honored exactly")
    assert(spark.sql("SELECT v FROM graft.ne.p WHERE k = 1").as[String].head() == "a",
      "values survive the positioned add")
    // Reposition an existing column: SELECT * order follows; data intact.
    spark.sql("ALTER TABLE graft.ne.p ALTER COLUMN v FIRST")
    assert(spark.table("graft.ne.p").schema.fieldNames.toSeq ==
      Seq("v", "z", "k", "m", "m2"))
    assert(spark.sql("SELECT * FROM graft.ne.p WHERE k = 2").collect().head.getString(0)
      == "b", "SELECT * reads the permuted physical order correctly")
    spark.sql("ALTER TABLE graft.ne.p ALTER COLUMN v AFTER m2")
    assert(spark.table("graft.ne.p").schema.fieldNames.toSeq ==
      Seq("z", "k", "m", "m2", "v"))
    assert(spark.sql("SELECT k, v FROM graft.ne.p ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    intercept[Exception] { // unknown AFTER target refuses
      spark.sql("ALTER TABLE graft.ne.p ALTER COLUMN v AFTER nope")
    }
    spark.sql("DROP TABLE graft.ne.p PURGE")
  }

  test("RESTORE to a pre-migration version brings back the dropped nested field") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.rs PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.rs (k BIGINT, meta STRUCT<a: STRING, b: INT>) USING graft")
    spark.sql("INSERT INTO graft.ne.rs VALUES (1, named_struct('a', 'x', 'b', 7))")
    val v = spark.sql("SELECT max(version) FROM graft.ne.rs.history")
      .collect().head.getLong(0)
    spark.sql("ALTER TABLE graft.ne.rs DROP COLUMN meta.b")
    spark.sql("INSERT INTO graft.ne.rs VALUES (2, named_struct('a', 'y'))")
    assert(spark.table("graft.ne.rs").schema("meta").dataType.simpleString ==
      "struct<a:string>")
    // Time travel into the pre-drop era reads the old shape...
    assert(spark.sql(s"SELECT meta.b FROM graft.ne.rs VERSION AS OF $v")
      .collect().head.getInt(0) == 7)
    // ...and RESTORE re-installs that era wholesale: schema AND the
    // pre-migration segments, which must decode under it again.
    spark.sql(s"CALL graft.system.restore('ne', 'rs', '$v')").collect()
    assert(spark.table("graft.ne.rs").schema("meta").dataType.simpleString ==
      "struct<a:string,b:int>", "restore must bring the pre-drop schema back")
    val r = spark.sql("SELECT k, meta.a, meta.b FROM graft.ne.rs ORDER BY k").collect()
    assert(r.length == 1 && r(0).getString(1) == "x" && r(0).getInt(2) == 7,
      "restored era decodes with its own schema; the post-drop insert is gone")
    spark.sql("DROP TABLE graft.ne.rs PURGE")
  }

  test("nested rename/drop refuse when a constraint or generation expr references the struct") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.g PURGE")
    spark.sql(
      """CREATE TABLE graft.ne.g (
        |  k BIGINT, meta STRUCT<a: INT, b: INT>,
        |  CONSTRAINT pos CHECK (meta.a > 0)) USING graft""".stripMargin)
    spark.sql("INSERT INTO graft.ne.g VALUES (1, named_struct('a', 5, 'b', 6))")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.g RENAME COLUMN meta.a TO x")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.g DROP COLUMN meta.a")
    }
    // The constraint still enforces — the schema never moved under it.
    intercept[Exception] {
      spark.sql("INSERT INTO graft.ne.g VALUES (2, named_struct('a', -1, 'b', 0))")
    }
    spark.sql("DROP TABLE graft.ne.g PURGE")

    spark.sql("DROP TABLE IF EXISTS graft.ne.g2 PURGE")
    spark.sql(
      """CREATE TABLE graft.ne.g2 (
        |  k BIGINT, meta STRUCT<a: INT>,
        |  d INT GENERATED ALWAYS AS (meta.a * 2)) USING graft""".stripMargin)
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.g2 RENAME COLUMN meta.a TO x")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.g2 DROP COLUMN meta.a")
    }
    spark.sql("DROP TABLE graft.ne.g2 PURGE")
  }

  test("DROP COLUMN IF EXISTS on a missing nested field is a TRUE no-op") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.ie PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.ie (k BIGINT, meta STRUCT<a: STRING>) USING graft")
    spark.sql("INSERT INTO graft.ne.ie VALUES (1, named_struct('a', 'x'))")
    val v = spark.sql("SELECT max(version) FROM graft.ne.ie.history")
      .collect().head.getLong(0)
    spark.sql("ALTER TABLE graft.ne.ie DROP COLUMN IF EXISTS meta.nope")
    spark.sql("ALTER TABLE graft.ne.ie DROP COLUMN IF EXISTS ghost.nope")
    assert(spark.sql("SELECT max(version) FROM graft.ne.ie.history")
      .collect().head.getLong(0) == v,
      "IF EXISTS resolving to nothing must publish NO snapshot (no rewrite)")
    intercept[Exception] { // without IF EXISTS it still refuses loudly
      spark.sql("ALTER TABLE graft.ne.ie DROP COLUMN meta.nope")
    }
    spark.sql("DROP TABLE graft.ne.ie PURGE")
  }

  test("container widening: xs.element / m.value widen; map-key retype refuses") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.c PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.c (k BIGINT, xs ARRAY<INT>, m MAP<STRING, INT>) USING graft")
    spark.sql(
      "INSERT INTO graft.ne.c VALUES (1, array(1, 2147483647), map('a', 5)), (2, NULL, NULL)")
    spark.sql("ALTER TABLE graft.ne.c ALTER COLUMN xs.element TYPE BIGINT")
    spark.sql("ALTER TABLE graft.ne.c ALTER COLUMN m.value TYPE BIGINT")
    spark.sql(
      "INSERT INTO graft.ne.c VALUES (3, array(5000000000), map('b', 6000000000))")
    import org.apache.spark.sql.functions.{aggregate, coalesce, lit, map_values}
    assert(spark.sql(
      "SELECT sum(aggregate(coalesce(xs, array()), 0L, (acc, x) -> acc + x)) FROM graft.ne.c")
      .as[Long].head() == 1L + 2147483647L + 5000000000L,
      "pre-widen array elements decode exactly; post-widen values exceed int range")
    assert(spark.sql(
      "SELECT sum(aggregate(map_values(coalesce(m, map())), 0L, (acc, x) -> acc + x)) FROM graft.ne.c")
      .as[Long].head() == 5L + 6000000000L)
    assert(spark.sql("SELECT count(*) FROM graft.ne.c WHERE xs IS NULL")
      .as[Long].head() == 1L, "NULL containers survive the widen")
    intercept[Exception] { // map KEY retype refuses — key identity is semantics
      spark.sql("ALTER TABLE graft.ne.c ALTER COLUMN m.key TYPE INT")
    }
    intercept[Exception] { // element narrowing refuses
      spark.sql("ALTER TABLE graft.ne.c ALTER COLUMN xs.element TYPE INT")
    }
    spark.sql("DROP TABLE graft.ne.c PURGE")
  }

  test("DROP a nested field re-projects; survivors and NULL structs intact") {
    spark.sql("DROP TABLE IF EXISTS graft.ne.d PURGE")
    spark.sql(
      "CREATE TABLE graft.ne.d (k BIGINT, meta STRUCT<a: STRING, b: INT, c: DOUBLE>) USING graft")
    spark.sql(
      """INSERT INTO graft.ne.d VALUES
        |(1, named_struct('a', 'x', 'b', 10, 'c', 1.5)), (2, NULL)""".stripMargin)
    spark.sql("ALTER TABLE graft.ne.d DROP COLUMN meta.b")
    assert(spark.table("graft.ne.d").schema("meta").dataType.simpleString ==
      "struct<a:string,c:double>")
    val rows = spark.sql("SELECT k, meta.a, meta.c FROM graft.ne.d ORDER BY k").collect()
    assert(rows(0).getString(1) == "x" && rows(0).getDouble(2) == 1.5)
    assert(rows(1).isNullAt(1), "NULL struct survives the nested drop")
    intercept[Exception] { spark.sql("SELECT meta.b FROM graft.ne.d").collect() }
    // Time travel still reads the pre-drop era with its own schema.
    assert(spark.sql("SELECT count(*) FROM graft.ne.d VERSION AS OF 1")
      .as[Long].head() == 2L)
    // Dropping the last remaining fields one by one refuses at the end.
    spark.sql("ALTER TABLE graft.ne.d DROP COLUMN meta.c")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ne.d DROP COLUMN meta.a")
    }
    spark.sql("DROP TABLE graft.ne.d PURGE")
  }
}
