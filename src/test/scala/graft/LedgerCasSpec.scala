package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.connector.catalog.Identifier

/** The ledger CAS primitive in isolation — the property the whole
  * cross-process OCC protocol stands on: for one (table, sequence),
  * EXACTLY ONE concurrent `casWrite` wins, losers report false, and
  * the surviving document is byte-exactly the winner's. The original
  * implementation used `Files.move(ATOMIC_MOVE)`, which on POSIX is a
  * plain rename() that silently REPLACES an existing target — every
  * racer "won" and the first commit was overwritten; this spec pins
  * the put-if-absent contract directly so a future "simplification"
  * back to rename fails here in milliseconds, not in the forked-JVM
  * gauntlet.
  */
class LedgerCasSpec extends AnyFunSuite {
  private val ledger = graft.sources.GraftLedger
  private def ident(n: String) = Identifier.of(Array("cas"), n)

  test("N threads racing one sequence: exactly one casWrite wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cas_")
    val id = ident("t")
    for (seq <- 0L to 4L) {
      val threads = 8
      val barrier = new java.util.concurrent.CyclicBarrier(threads)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val fs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            barrier.await()
            if (ledger.casWrite(dir, id, s"""{"writer":$t,"seq":$seq}""", seq))
              wins.incrementAndGet(): Unit
          }
        })
      }
      fs.foreach(_.get())
      pool.shutdown()
      assert(wins.get() == 1, s"seq $seq: ${wins.get()} writers believed they won")
      // The surviving doc is exactly ONE writer's complete payload —
      // never torn, never a mix.
      val (json, s) = ledger.readLatest(dir, id).get
      assert(s == seq)
      assert(json.matches("""\{"writer":\d,"seq":""" + seq + "}"), json)
    }
    // Sequences advanced 0..4: GC kept a trailing window, latest reads 4.
    assert(ledger.latestSeq(dir, id) == 4L)
  }

  test("casWrite on an already-committed sequence loses without touching the doc") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cas2_")
    val id = ident("u")
    assert(ledger.casWrite(dir, id, """{"v":"first"}""", 0L))
    assert(!ledger.casWrite(dir, id, """{"v":"second"}""", 0L),
      "second CAS of the same sequence must lose")
    assert(ledger.readLatest(dir, id).get._1.contains("first"),
      "the loser must not overwrite the winner's document")
  }

  test("prefix-torn documents never validate: readers step down to the seal below") {
    // casWrite SEALS documents (trailing #graft-seal:<len>:<crc32>); a
    // crashed O_EXCL-fallback writer leaves a PREFIX of the sealed doc.
    // No prefix can carry a trailer matching the bytes before it, so
    // every torn shape must be rejected in favor of the doc below —
    // including the nasty one: a prefix that PARSES as valid JSON.
    val dir = java.nio.file.Files.createTempDirectory("graft_seal_")
    val id = ident("s")
    assert(ledger.casWrite(dir, id, """{"v":"good"}""", 0L))
    val d = dir.resolve(ledger.fileNameOf(id) + ".d")
    def plant(seq: Long, raw: String): Unit =
      java.nio.file.Files.writeString(d.resolve(f"$seq%020d.json"), raw): Unit
    // Reconstruct what seq 1's sealed bytes would be, then tear them.
    assert(ledger.casWrite(dir, id, """{"v":"later","xs":[1,2,3]}""", 1L))
    val sealed1 = java.nio.file.Files.readString(d.resolve(f"${1L}%020d.json"))
    java.nio.file.Files.delete(d.resolve(f"${1L}%020d.json"))
    for ((torn, what) <- Seq(
      (sealed1.substring(0, sealed1.indexOf("xs")), "mid-JSON tear"),
      (sealed1.substring(0, sealed1.indexOf("#graft-seal")), "tear before the trailer"),
      (sealed1.dropRight(4), "tear inside the trailer"),
      ("""{"v":"later"} {"half""", "complete small JSON value + trailing garbage"),
    )) {
      plant(1L, torn)
      val (json, seq) = ledger.readLatest(dir, id).get
      // "tear before the trailer" leaves the COMPLETE document body —
      // that is the writer's full intended doc (crash after body, before
      // trailer): serving it is correct, the legacy-parse fallback keeps
      // mixed-version reads alive. Every other tear must step down.
      if (what == "tear before the trailer") assert(seq == 1L, what)
      else assert(seq == 0L && json == """{"v":"good"}""", s"$what served: $json")
      java.nio.file.Files.delete(d.resolve(f"${1L}%020d.json"))
    }
    // Torn docs never block progress: the sequence is reclaimable/CAS-able
    // state, and a real re-commit of seq 1 reads back exactly.
    assert(ledger.casWrite(dir, id, """{"v":"retry"}""", 1L))
    assert(ledger.readLatest(dir, id).get == ("""{"v":"retry"}""", 1L))
  }

  test("legacy unsealed numbered documents still read (mixed-version ledger)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seal_legacy_")
    val id = ident("l")
    val d = dir.resolve(ledger.fileNameOf(id) + ".d")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.writeString(d.resolve(f"${0L}%020d.json"), """{"old":true}""")
    assert(ledger.readLatest(dir, id).get == ("""{"old":true}""", 0L))
    // A sealed commit on top shadows it as usual.
    assert(ledger.casWrite(dir, id, """{"new":true}""", 1L))
    assert(ledger.readLatest(dir, id).get == ("""{"new":true}""", 1L))
  }

  test("old numbered documents are GC'd but a trailing window survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cas3_")
    val id = ident("w")
    for (seq <- 0L to 9L) assert(ledger.casWrite(dir, id, s"""{"s":$seq}""", seq))
    val d = dir.resolve(ledger.fileNameOf(id) + ".d")
    val s = java.nio.file.Files.list(d)
    val n = try s.count() finally s.close()
    assert(n >= 2 && n <= 4, s"expected a small trailing doc window, found $n files")
    assert(ledger.readLatest(dir, id).get._2 == 9L)
  }
}
