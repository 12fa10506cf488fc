package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftLedger}

/** Log-structured ledger commits: data commits write DELTA documents
  * (current entry + the snapshot added + versions expired) and a full
  * CHECKPOINT document every K sequences, so per-commit metadata I/O is
  * O(commit), not O(retained history) — the Delta-log/Iceberg shape.
  * These specs pin the three load-bearing properties:
  *   1. per-commit document size stays FLAT as history grows (the
  *      500-commit history-heavy gauntlet);
  *   2. the numbered-doc directory stays bounded (checkpoint-anchored
  *      GC never strands or loses the replay chain);
  *   3. a fresh process (simulated restart) resolves EXACTLY the state
  *      the writer had — entry, history, time travel — by replaying
  *      deltas above the checkpoint.
  */
class LedgerDeltaSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.pgraft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.pgraft.root",
      java.nio.file.Files.createTempDirectory("graft_ledger_delta_").toString)
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def ident(n: String) = Identifier.of(Array("ld"), n)
  private def docDirOf(id: Identifier): java.nio.file.Path =
    GraftLedger.tablesDir(GraftCatalog.warehouseRootForTest)
      .resolve(GraftLedger.fileNameOf(id) + ".d")
  private def docSizes(id: Identifier): Seq[(Long, Long)] = {
    val d = docDirOf(id)
    val s = java.nio.file.Files.list(d)
    try s.iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") && !n.startsWith(".tmp-"))
        n.stripSuffix(".json").toLongOption.map(_ -> java.nio.file.Files.size(p))
      else None
    }.toSeq.sortBy(_._1)
    finally s.close()
  }
  test("500-commit history-heavy gauntlet: per-commit ledger writes stay flat") {
    spark.sql("DROP TABLE IF EXISTS pgraft.ld.h PURGE")
    // Long retention on BOTH axes so history genuinely grows to ~500
    // retained snapshots — the regime where whole-document commits pay
    // O(history) per commit and deltas must not.
    spark.sql(
      """CREATE TABLE pgraft.ld.h (k BIGINT, v BIGINT) USING graft
        |TBLPROPERTIES ('graft.retention.seconds'='3600',
        |               'graft.retention.snapshots'='600')""".stripMargin)
    val commits = GauntletEnv.ops(500)
    // INSERT OVERWRITE keeps the live segment count at 1, isolating the
    // metadata axis under test: entry stays O(1), history grows O(n).
    var earlyDelta = -1L
    (1 to commits).foreach { i =>
      spark.sql(s"INSERT OVERWRITE pgraft.ld.h VALUES ($i, ${i * 7})")
      if (i == 20) earlyDelta = docSizes(ident("h")).map(_._2).min
    }
    val sizes = docSizes(ident("h"))
    // (2) bounded directory: anchor checkpoint + < K deltas + the GC
    // straggler window — never the full commit log.
    assert(sizes.length <= 16 + 3,
      s"doc dir grew unbounded: ${sizes.length} documents after $commits commits")
    // (1) flat per-commit writes: the newest delta after ~500 commits is
    // no bigger than ~an early one (3x slack for props/stat drift) —
    // under whole-document commits it would carry ~500 snapshots and be
    // two orders larger. The dir's SMALLEST doc is always a delta; the
    // largest is the anchor checkpoint, which must dwarf it.
    val lateDelta = sizes.map(_._2).min
    val checkpoint = sizes.map(_._2).max
    assert(earlyDelta > 0 && lateDelta <= earlyDelta * 3,
      s"per-commit writes grew with history: early delta $earlyDelta B, late $lateDelta B")
    assert(checkpoint > lateDelta * 5,
      s"checkpoint ($checkpoint B) should carry the history deltas ($lateDelta B) elide")
    // (3) restart equality: a fresh metastore resolves the same state
    // through checkpoint + delta replay.
    val liveRows = spark.sql("SELECT k, v FROM pgraft.ld.h").collect().toSeq.map(_.toSeq)
    val histLen = spark.sql("SELECT count(*) FROM pgraft.ld.h.history")
      .collect().head.getLong(0)
    val tt = spark.sql(s"SELECT v FROM pgraft.ld.h VERSION AS OF ${commits / 2}")
      .collect().head.getLong(0)
    GraftCatalog.resetInMemoryStateForTest(ident("h"))
    assert(spark.sql("SELECT k, v FROM pgraft.ld.h").collect().toSeq.map(_.toSeq)
      == liveRows, "restart lost the current state")
    assert(spark.sql("SELECT count(*) FROM pgraft.ld.h.history")
      .collect().head.getLong(0) == histLen, "restart lost retained history")
    assert(spark.sql(s"SELECT v FROM pgraft.ld.h VERSION AS OF ${commits / 2}")
      .collect().head.getLong(0) == tt, "restart broke time travel through a delta chain")
    // Appends continue the same version line above the replayed state.
    spark.sql(s"INSERT INTO pgraft.ld.h VALUES (0, 0)")
    assert(spark.sql("SELECT count(*) FROM pgraft.ld.h").collect().head.getLong(0) == 2L)
    spark.sql("DROP TABLE pgraft.ld.h PURGE")
  }

  test("delta documents above a LEGACY FLAT doc resolve (flat is the seq-0 anchor)") {
    // A pre-numbered-ledger warehouse holds one flat <table>.json per
    // table. A process that loads it reports checkpoint seq 0, so its
    // next commit legally writes a DELTA at seq 1 with no numbered
    // checkpoint below — the resolver must anchor on the flat doc.
    spark.sql("DROP TABLE IF EXISTS pgraft.ld.f PURGE")
    spark.sql("CREATE TABLE pgraft.ld.f (k BIGINT) USING graft")
    spark.sql("INSERT INTO pgraft.ld.f VALUES (1), (2)")
    // Demote the table's ledger to the legacy layout: flat doc =
    // current resolved state, numbered directory gone.
    val dir = GraftLedger.tablesDir(GraftCatalog.warehouseRootForTest)
    val st = GraftLedger.readTableState(dir, ident("f"), System.nanoTime()).get
    val (id, entry, hist, eps) = st.state.get
    val d = docDirOf(ident("f"))
    val ls = java.nio.file.Files.list(d)
    try ls.iterator().asScala.foreach(p => java.nio.file.Files.delete(p))
    finally ls.close()
    java.nio.file.Files.delete(d)
    GraftLedger.write(dir, ident("f"), GraftLedger.encodeTable(id, entry, hist, eps))
    GraftCatalog.resetInMemoryStateForTest(ident("f"))
    // A TORN numbered doc above the flat (a first CAS that crashed
    // before acking on a no-hardlink filesystem) must not wedge the
    // table: the resolver steps over it and serves the flat state.
    java.nio.file.Files.createDirectories(docDirOf(ident("f")))
    val torn = docDirOf(ident("f")).resolve(f"${1L}%020d.json")
    java.nio.file.Files.writeString(torn, "{\"namespace")
    assert(spark.sql("SELECT k FROM pgraft.ld.f ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "torn doc above a legacy flat doc wedged the table")
    java.nio.file.Files.delete(torn)
    GraftCatalog.resetInMemoryStateForTest(ident("f"))
    // Loads from flat (anchor 0); this INSERT may commit as a delta at
    // seq 1 — then a FRESH process must still resolve the full state.
    spark.sql("INSERT INTO pgraft.ld.f VALUES (3)")
    assert(GraftLedger.latestSeq(dir, ident("f")) >= 1L)
    GraftCatalog.resetInMemoryStateForTest(ident("f"))
    assert(spark.sql("SELECT k FROM pgraft.ld.f ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "delta above a legacy flat doc did not resolve")
    spark.sql("DROP TABLE pgraft.ld.f PURGE")
  }

  test("epoch-map expiry: retired query ids leave the checkpoint, live ones survive restart") {
    // The epoch ledger (streaming exactly-once dedup) rides every table
    // document; without expiry a long-lived table fed by many distinct
    // streaming queries carries every retired query id forever. The
    // contract (the Delta transaction-retention shape): entries idle
    // past the table's EPOCH-retention window (its own knob — default
    // max(file retention, 24 h), so ordinary low-frequency streams
    // never lose dedup to the 60 s file-retention default) are dropped
    // at checkpoint-write time — a live stream refreshes its stamp on
    // every epoch commit, and a stream idle past the window loses
    // replay-dedup protection by documented design.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS pgraft.ld.ep PURGE")
    spark.sql(
      """CREATE TABLE pgraft.ld.ep (k BIGINT) USING graft
        |TBLPROPERTIES ('graft.epochs.retention.seconds'='2',
        |               'graft.retention.snapshots'='100000')""".stripMargin)
    val dir = GraftLedger.tablesDir(GraftCatalog.warehouseRootForTest)
    def epochIds(): Set[String] =
      GraftLedger.readTableState(dir, ident("ep"), System.nanoTime())
        .get.state.get._4.keySet
    def oneEpoch(): Unit = {
      val in = MemoryStream[Long]
      val q = in.toDF().toDF("k").writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ld_ep_ck_").toString)
        .toTable("pgraft.ld.ep")
      in.addData(1L, 2L)
      q.processAllAvailable()
      q.stop()
    }
    oneEpoch() // query A commits, then retires
    val afterA = epochIds()
    assert(afterA.size == 1, s"expected one epoch entry, got $afterA")
    Thread.sleep(2500) // let A's stamp age past the 2 s retention window
    oneEpoch() // query B commits (fresh stamp)
    val afterB = epochIds()
    assert(afterB.size == 2, s"expected two epoch entries, got $afterB")
    val qidB = (afterB -- afterA).head
    // Any non-data mutation persists a full CHECKPOINT document — the
    // expiry point.
    spark.sql("ALTER TABLE pgraft.ld.ep SET TBLPROPERTIES ('touch' = '1')")
    val afterCkpt = epochIds()
    assert(afterCkpt == Set(qidB),
      s"retired id should vanish and the live id survive: $afterCkpt (B=$qidB)")
    // Restart: a fresh process resolving the ledger still knows B's
    // epoch (replay-dedup intact for the live query).
    GraftCatalog.resetInMemoryStateForTest(ident("ep"))
    assert(spark.sql("SELECT count(*) FROM pgraft.ld.ep").collect()
      .head.getLong(0) == 4L)
    assert(epochIds() == Set(qidB), "live epoch entry lost across restart")
    spark.sql("DROP TABLE pgraft.ld.ep PURGE")
  }

  test("drop/recreate across delta chains: tombstone resets the checkpoint anchor") {
    spark.sql("DROP TABLE IF EXISTS pgraft.ld.t PURGE")
    spark.sql("CREATE TABLE pgraft.ld.t (k BIGINT) USING graft")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO pgraft.ld.t VALUES ($i)"))
    spark.sql("DROP TABLE pgraft.ld.t") // tombstone commit
    // Recreate: the first persist after a tombstone must be a FULL
    // checkpoint (a delta would replay onto the tombstone and resolve
    // to nothing for a fresh process).
    spark.sql("CREATE TABLE pgraft.ld.t (k BIGINT, s STRING) USING graft")
    spark.sql("INSERT INTO pgraft.ld.t VALUES (7, 'x'), (8, 'y')")
    GraftCatalog.resetInMemoryStateForTest(ident("t"))
    assert(spark.sql("SELECT k FROM pgraft.ld.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(7L, 8L),
      "fresh process resolved the wrong incarnation across drop/recreate")
    spark.sql("DROP TABLE pgraft.ld.t PURGE")
  }
}
