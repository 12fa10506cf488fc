package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** TESTDATA-DRIFT PREFLIGHT. The driver regenerates
  * `/root/testdata/sf*` between rounds and physical encodings have
  * changed silently before (round 10: `events.ts` flipped from
  * TIMESTAMP(NANOS)-as-long to plain timestamp[us], erroring 26 oracle
  * rows and corrupting streaming windows 1000×). This guard makes that
  * failure mode LOUD: every parquet footer is read and diffed against
  * the committed manifest (`tools/testdata_schema_manifest.json`),
  * and any delta fails with the exact per-column change.
  *
  * After an INTENTIONAL regeneration, re-generate the manifest with
  * `sbt "Test/runMain graft.GenTestdataManifest"` and review the diff
  * in git — the point is that a drift is a reviewed decision, never a
  * silent mid-round surprise.
  */
object TestdataManifest {
  val ManifestPath = "tools/testdata_schema_manifest.json"

  /** table file name → ordered "col:sparkType" strings. */
  type Manifest = Map[String, Seq[String]]

  def columnsOf(spark: org.apache.spark.sql.SparkSession, file: String): Seq[String] =
    spark.read.parquet(file).schema.fields.toSeq
      .map(f => s"${f.name}:${f.dataType.catalogString}")

  /** Human-actionable delta between the committed expectation and a
    * live footer; empty = no drift.
    */
  def diff(table: String, expected: Seq[String], actual: Seq[String]): Seq[String] = {
    val exp = expected.map(_.split(":", 2)).map(a => a(0) -> a(1)).toMap
    val act = actual.map(_.split(":", 2)).map(a => a(0) -> a(1)).toMap
    val missing = exp.keySet -- act.keySet
    val extra = act.keySet -- exp.keySet
    val retyped = (exp.keySet & act.keySet).filter(c => exp(c) != act(c))
    val reordered =
      if (missing.isEmpty && extra.isEmpty &&
          expected.map(_.split(":", 2)(0)) != actual.map(_.split(":", 2)(0)))
        Seq(s"$table: column ORDER changed " +
          s"(${expected.map(_.split(":", 2)(0)).mkString(",")} -> " +
          s"${actual.map(_.split(":", 2)(0)).mkString(",")})")
      else Nil
    missing.toSeq.sorted.map(c => s"$table: column $c:${exp(c)} MISSING from file") ++
      extra.toSeq.sorted.map(c => s"$table: UNEXPECTED column $c:${act(c)} in file") ++
      retyped.toSeq.sorted.map(c => s"$table: column $c RETYPED ${exp(c)} -> ${act(c)}") ++
      reordered
  }

  def load(): Manifest = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = M.readTree(Files.readString(Paths.get(ManifestPath)))
    import scala.jdk.CollectionConverters._
    root.properties().asScala.map { kv =>
      kv.getKey -> kv.getValue.elements().asScala.map(_.asText()).toSeq
    }.toMap
  }
}

/** Regenerate the committed manifest from the live sf0.01 footers
  * (run after a REVIEWED, intentional testdata change).
  */
object GenTestdataManifest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkTestSession.spark
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = M.createObjectNode()
    Files.list(Paths.get(dir)).filter(_.toString.endsWith(".parquet"))
      .sorted().forEach { p =>
        val arr = root.putArray(p.getFileName.toString)
        TestdataManifest.columnsOf(spark, p.toString).foreach(arr.add)
      }
    Files.writeString(Paths.get(TestdataManifest.ManifestPath),
      M.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    println(s"wrote ${TestdataManifest.ManifestPath} from $dir")
  }
}

class TestdataPreflightSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("every testdata parquet footer matches the committed schema manifest") {
    val manifest = TestdataManifest.load()
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => Paths.get(s"/root/testdata/$s")).filter(Files.isDirectory(_))
    assert(sfDirs.nonEmpty, "no testdata sf directories found")
    val deltas = sfDirs.flatMap { d =>
      manifest.toSeq.sortBy(_._1).flatMap { case (table, expected) =>
        val f = d.resolve(table)
        if (!Files.exists(f)) Seq(s"${d.getFileName}/$table: FILE MISSING")
        else TestdataManifest.diff(
          s"${d.getFileName}/$table", expected,
          TestdataManifest.columnsOf(spark, f.toString))
      }
    }
    assert(deltas.isEmpty,
      "TESTDATA DRIFT — the driver regenerated testdata with a different " +
        "schema/encoding. Fix the adaptive loaders (or re-generate the " +
        "manifest via `sbt \"Test/runMain graft.GenTestdataManifest\"` after " +
        "review). Exact deltas:\n  " + deltas.mkString("\n  "))
  }

  test("the guard trips loudly on a simulated re-encoding") {
    // The round-10 failure, replayed against the diff logic: ts
    // flipping timestamp -> bigint must surface as a RETYPED delta.
    val expected = Seq("event_id:bigint", "ts:timestamp", "value:double")
    val drifted = Seq("event_id:bigint", "ts:bigint", "value:double")
    val d = TestdataManifest.diff("events.parquet", expected, drifted)
    assert(d == Seq("events.parquet: column ts RETYPED timestamp -> bigint"))
    // Dropped + added column variants stay distinguishable.
    val d2 = TestdataManifest.diff("events.parquet", expected,
      Seq("event_id:bigint", "value:double", "props:string"))
    assert(d2.exists(_.contains("ts:timestamp MISSING")) &&
      d2.exists(_.contains("UNEXPECTED column props:string")))
  }
}
