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
