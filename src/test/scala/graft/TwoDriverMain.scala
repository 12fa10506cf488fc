package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM entry point for the cross-process concurrency gauntlet:
  * each invocation is a REAL separate driver process with its own
  * SparkSession, its own `GraftCatalog` companion state, and its own
  * in-memory metastore, sharing ONLY the warehouse directory — the
  * two-drivers-one-warehouse topology the ledger CAS protocol exists
  * for. Modes:
  *
  *  - `setup <root>`: create the gauntlet table.
  *  - `write <root> <outFile> <tid> <ops>`: run a mixed INSERT/UPDATE/
  *    DELETE workload against the shared table, each op touching only
  *    this writer's `tid` rows, retrying cross-process refusals.
  *    Writes the acknowledged model (one `n,count` line per value
  *    class) to `outFile` — exact regardless of interleaving because
  *    no other process touches this tid.
  *  - `verify <root> <outFile>`: dump the final table as `tid,n,count`
  *    lines plus a `versions:` line of the retained history, read by
  *    a FOURTH independent process (fresh metastore, so what it sees
  *    is exactly what the ledger documents say).
  *
  * Exit code 0 = mode completed; any exception = nonzero (the parent
  * asserts on it).
  */
object TwoDriverMain {
  private val T = "g2.xp.t"

  private def session(root: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-two-driver-child")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g2", classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.g2.root", root)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def conflict(t: Throwable): Boolean =
    t != null && (Option(t.getMessage).exists(m =>
      m.contains("row-level rewrite") || m.contains("another process committed") ||
        m.contains("concurrent") || m.contains("ledger CAS")) ||
      conflict(t.getCause))

  def main(args: Array[String]): Unit = args(0) match {
    case "setup" =>
      val spark = session(args(1))
      // Optional third arg: retention seconds (the N-driver soak uses a
      // SHORT window so retention GC actually fires mid-run and races
      // the other processes' clones and reads). The retention window is
      // the documented coherence contract: it must exceed the staleness
      // refresh debounce plus any plan-to-execute gap, so the soak's
      // value stays well above both while still expiring mid-run. The
      // snapshot COUNT cap is pinned high so only the time axis GCs —
      // count-cap expiry could evict a seconds-old snapshot under a
      // commit burst, which no retention window protects readers from.
      val retention = if (args.length > 2) args(2) else "600"
      spark.sql(s"DROP TABLE IF EXISTS $T PURGE")
      spark.sql(s"CREATE TABLE $T (tid BIGINT, n BIGINT) USING graft " +
        s"TBLPROPERTIES ('graft.retention.seconds'='$retention', " +
        "'graft.retention.snapshots'='100000')")
      spark.stop()

    // Randomized mixed-op soak writer: appends, row-level rewrites on
    // its own tid, table-property DDL, side-table CREATE/INSERT/DROP
    // (namespace ledger interleaving), compaction, vacuum (snapshot
    // GC), and clone → full-scan → drop — all racing N−1 identical
    // peers against ONE warehouse. The acknowledged per-tid model is
    // exact regardless of interleaving (no other process touches this
    // tid); maintenance ops change no rows so they never enter it.
    // A missing-file error anywhere (in particular scanning a clone
    // whose segments a peer's GC should have spared) is FATAL — only
    // optimistic-concurrency refusals are retried.
    case "soak" =>
      val Array(_, root, outFile, tidS, opsS, seedS) = args
      val tid = tidS.toInt
      val ops = opsS.toInt
      val spark = session(root)
      val model = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
      def missingFile(t: Throwable): Boolean =
        t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
          Option(t.getMessage).exists(m =>
            m.contains("FileNotFound") || m.contains("does not exist") ||
              m.contains("No such file")) ||
          missingFile(t.getCause))
      // True iff committed; retries conflicts; rethrows missing-file
      // (a GC'd-under-a-reader file must fail the soak loudly).
      def acked(stmt: String): Boolean = {
        var attempt = 0
        while (attempt <= 60) {
          try { spark.sql(stmt).collect(); return true }
          catch {
            case t: Throwable if missingFile(t) => throw t
            case t: Throwable if conflict(t) =>
              attempt += 1
              Thread.sleep(5L + attempt)
          }
        }
        System.err.println(s"[s$tid] GAVE UP $stmt")
        false
      }
      val clone = s"g2.xp.soak_clone_$tid"
      val side = s"g2.xp.soak_side_$tid"
      val rnd = new scala.util.Random(seedS.toLong)
      for (i <- 1 to ops) rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 =>
          val ns = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(5).toLong)
          if (acked(s"INSERT INTO $T VALUES ${ns.map(n => s"($tid, $n)").mkString(", ")}"))
            ns.foreach(n => model(n) += 1)
        case 4 | 5 =>
          if (model.nonEmpty && acked(s"UPDATE $T SET n = n + 10 WHERE tid = $tid")) {
            val bumped = model.toSeq
            model.clear()
            bumped.foreach { case (n, c) => model(n + 10) += c }
          }
        case 6 =>
          if (model.nonEmpty) {
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            if (acked(s"DELETE FROM $T WHERE tid = $tid AND n = $n"))
              model.remove(n)
          }
        case 7 =>
          acked(s"CALL g2.system.compact('xp', 't', '')"): Unit
        case 8 =>
          // Clone the shared table, scan the clone END TO END (every
          // segment file must still exist even while peers compact,
          // vacuum, and retention-GC), then drop it.
          acked(s"DROP TABLE IF EXISTS $clone PURGE"): Unit
          if (acked(s"CALL g2.system.clone('xp', 't', 'xp', 'soak_clone_$tid', '')")) {
            val r = spark.sql(s"SELECT count(*), coalesce(sum(n), 0) FROM $clone")
              .collect().head
            System.err.println(s"[s$tid] clone scan rows=${r.getLong(0)}")
            acked(s"DROP TABLE $clone PURGE"): Unit
          }
        case 9 => i % 3 match {
          // remove_orphan_files, NOT vacuum: vacuum's contract is the
          // operator's "nothing is reading" cutover (it expires every
          // non-current snapshot immediately, like a now-cutoff
          // expire_snapshots) — running it while peers hold in-flight
          // scan plans is out of its envelope BY DESIGN. Orphan cleanup
          // is the GC that IS safe under concurrency: referenced files
          // (any process's tables, clones, retained snapshots) are
          // spared via the warehouse sweep, and the age guard covers
          // peers' uncommitted in-flight segment writes.
          case 0 => acked(s"CALL g2.system.remove_orphan_files('xp', 't', 30000)"): Unit
          case 1 =>
            acked(s"ALTER TABLE $T SET TBLPROPERTIES ('soak.touch.$tid' = '$i')"): Unit
          case 2 =>
            acked(s"DROP TABLE IF EXISTS $side PURGE"): Unit
            if (acked(s"CREATE TABLE $side (k BIGINT) USING graft")) {
              acked(s"INSERT INTO $side VALUES ($i)"): Unit
              acked(s"DROP TABLE $side PURGE"): Unit
            }
        }
      }
      val out = model.toSeq.sorted.map { case (n, c) => s"$n,$c" }.mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), out)
      spark.stop()

    case "write" =>
      val Array(_, root, outFile, tidS, opsS) = args
      val tid = tidS.toInt
      val ops = opsS.toInt
      val spark = session(root)
      val model = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
      def version(): Long =
        try spark.sql(s"SELECT max(version) FROM $T.history").collect().head.getLong(0)
        catch { case _: Throwable => -1L }
      def acked(stmt: String): Boolean = {
        var attempt = 0
        while (attempt <= 60) {
          try {
            spark.sql(stmt)
            System.err.println(s"[w$tid] ACK(after ${attempt} retries) v=${version()} $stmt")
            return true
          } catch {
            case t: Throwable if conflict(t) =>
              attempt += 1
              Thread.sleep(5L + attempt)
          }
        }
        System.err.println(s"[w$tid] GAVE UP $stmt")
        false // provably not committed: every refusal is pre-publish
      }
      val rnd = new scala.util.Random(7000L + tid)
      for (_ <- 1 to ops) rnd.nextInt(4) match {
        case 0 | 1 =>
          val ns = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(5).toLong)
          if (acked(s"INSERT INTO $T VALUES ${ns.map(n => s"($tid, $n)").mkString(", ")}"))
            ns.foreach(n => model(n) += 1)
        case 2 =>
          if (model.nonEmpty && acked(s"UPDATE $T SET n = n + 10 WHERE tid = $tid")) {
            val bumped = model.toSeq
            model.clear()
            bumped.foreach { case (n, c) => model(n + 10) += c }
          }
        case 3 =>
          if (model.nonEmpty) {
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            if (acked(s"DELETE FROM $T WHERE tid = $tid AND n = $n"))
              model.remove(n)
          }
      }
      val out = model.toSeq.sorted.map { case (n, c) => s"$n,$c" }.mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), out)
      spark.stop()

    case "verify" =>
      val Array(_, root, outFile) = args
      val spark = session(root)
      val rows = spark.sql(s"SELECT tid, n, count(*) AS c FROM $T GROUP BY tid, n")
        .collect().map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}")
        .sorted.mkString("\n")
      val versions = spark.sql(s"SELECT version FROM $T.history ORDER BY version")
        .collect().map(_.getLong(0)).mkString(",")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), s"$rows\nversions:$versions")
      spark.stop()

    case "reseed" =>
      val spark = session(args(1))
      spark.sql(s"INSERT INTO $T VALUES (1, 111)")
      spark.stop()

    // Reincarnation pair: `hold` loads the table (pinning a pre-drop
    // ledger sequence in its metastore), then waits while `reincarnate`
    // DROPs and RECREATEs it in another process. hold's subsequent
    // INSERT must land on the NEW incarnation — with non-monotonic
    // sequences it would CAS its stale (old-schema, old-rows) state
    // ABOVE the new incarnation's documents and resurrect the dropped
    // table (the tombstone protocol exists for exactly this).
    case "hold" =>
      val Array(_, root, outFile) = args
      val spark = session(root)
      spark.sql("SHOW NAMESPACES IN g2").collect() // bind the durable root
      val n0 = spark.sql(s"SELECT count(*) FROM $T").collect().head.getLong(0)
      require(n0 == 1, s"hold expected the setup row, saw $n0")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(root, "hold_ready"), "1")
      val t0 = System.nanoTime()
      while (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, "reincarnated"))) {
        require(System.nanoTime() - t0 < 180e9, "reincarnate never finished")
        Thread.sleep(100)
      }
      // Must land on the NEW incarnation (or refuse then succeed on
      // retry) — never resurrect the old one.
      var attempt = 0
      var done = false
      while (!done && attempt <= 30) {
        try { spark.sql(s"INSERT INTO $T VALUES (9, 999)"); done = true }
        catch { case t: Throwable if conflict(t) => attempt += 1; Thread.sleep(50) }
      }
      require(done, "hold's insert never succeeded")
      val rows = spark.sql(s"SELECT tid, n, count(*) AS c FROM $T GROUP BY tid, n")
        .collect().map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}")
        .sorted.mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), rows)
      spark.stop()

    case "reincarnate" =>
      val Array(_, root) = args
      val spark = session(root)
      spark.sql("SHOW NAMESPACES IN g2").collect()
      val t0 = System.nanoTime()
      while (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, "hold_ready"))) {
        require(System.nanoTime() - t0 < 180e9, "hold never started")
        Thread.sleep(100)
      }
      spark.sql(s"DROP TABLE $T") // soft drop: the tombstone commit
      spark.sql(s"CREATE TABLE $T (tid BIGINT, n BIGINT) USING graft")
      spark.sql(s"INSERT INTO $T VALUES (5, 555)")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(root, "reincarnated"), "1")
      spark.stop()

    // Cross-process STREAMING writer: a MemoryStream-driven query
    // appends one epoch per micro-batch into the SHARED gauntlet table
    // through the catalog's streaming write (installEpoch) while a
    // batch writer in another process races it — epoch commits must
    // retry-merge lost CASes (not kill the query) and land exactly
    // once. Rows are (tid=9, epoch*100+j), disjoint from the batch
    // writers' tids, so the end-state check stays exact.
    case "swrite" =>
      val Array(_, root, outFile, epochsS, rowsS) = args
      val epochs = epochsS.toInt
      val rows = rowsS.toInt
      val spark = session(root)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val q = in.toDF().toDF("tid", "n").writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("swrite_ckpt_").toString)
        .toTable(T)
      val model = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (e <- 1 to epochs) {
        val batch = (0 until rows).map(j => (9L, e * 100L + j))
        in.addData(batch: _*)
        q.processAllAvailable() // one micro-batch = one epoch commit
        model ++= batch
        Thread.sleep(50)
      }
      q.stop()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
        model.map(p => s"${p._2},1").sorted.mkString("\n"))
      spark.stop()

    // Cross-process CDC tail: `feed` commits known batches from one
    // process while `tail` — a DIFFERENT process whose metastore was
    // loaded before those commits existed — streams the change feed.
    // The feed process waits for the tail's started-marker, so most
    // commits land while the stream is LIVE: without the ledger
    // staleness refresh in the stream's frontier, the tail would idle
    // forever on them.
    case "feed" =>
      val Array(_, root, batchesS, rowsS) = args
      val batches = batchesS.toInt
      val rows = rowsS.toInt
      val spark = session(root)
      spark.sql("DROP TABLE IF EXISTS g2.xp.s PURGE")
      spark.sql("CREATE TABLE g2.xp.s (b BIGINT, j BIGINT) USING graft " +
        "TBLPROPERTIES ('graft.retention.seconds'='600')")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(root, "feed_table_ready"), "1")
      val started = java.nio.file.Paths.get(root, "tail_started")
      val t0 = System.nanoTime()
      while (!java.nio.file.Files.exists(started)) {
        require(System.nanoTime() - t0 < 180e9, "tail never started")
        Thread.sleep(100)
      }
      for (b <- 0 until batches) {
        val vals = (0 until rows).map(j => s"($b, $j)").mkString(", ")
        spark.sql(s"INSERT INTO g2.xp.s VALUES $vals")
        Thread.sleep(150) // spread commits across the live stream's triggers
      }
      spark.stop()

    case "tail" =>
      val Array(_, root, outFile, expectedS) = args
      val expected = expectedS.toLong
      val spark = session(root)
      val t0 = System.nanoTime()
      while (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, "feed_table_ready"))) {
        require(System.nanoTime() - t0 < 180e9, "feed never created the table")
        Thread.sleep(100)
      }
      // Bind the durable root: the graft-changes SOURCE reads catalog
      // state directly, and the catalog plugin (which installs the
      // root) initializes only when the session first touches it.
      spark.sql("SHOW NAMESPACES IN g2").collect()
      val replica = new java.util.concurrent.ConcurrentHashMap[(Long, Long), Long]()
      val q = spark.readStream.format("graft-changes")
        .option("table", "xp.s").option("changesFrom", "0").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { r =>
            val key = (r.getLong(0), r.getLong(1))
            r.getString(r.fieldIndex("_change_type")) match {
              case "insert" | "update_postimage" =>
                replica.merge(key, 1L, (a, b) => a + b); ()
              case _ =>
                replica.merge(key, -1L, (a, b) => a + b); ()
            }
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .start()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(root, "tail_started"), "1")
      def total: Long = {
        var s = 0L; replica.forEach((_, v) => s += v); s
      }
      while (total < expected) {
        require(System.nanoTime() - t0 < 240e9,
          s"tail saw only $total of $expected rows — cross-process commits invisible?")
        Thread.sleep(200)
      }
      q.stop()
      val out = replica.entrySet().iterator()
      val sb = new StringBuilder
      val sorted = scala.collection.mutable.ArrayBuffer.empty[String]
      replica.forEach((k, v) => { sorted += s"${k._1},${k._2},$v"; () })
      sorted.sorted.foreach { l => sb.append(l).append('\n'); () }
      val _ = out
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
      spark.stop()
  }
}
