package graft

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Model-based NESTED-EVOLUTION gauntlet: random sequences of
  * {insert era, ADD nested field, RENAME nested field, WIDEN nested
  * int field, DROP nested field} against an exact in-memory model of
  * the struct column (fixed seeds — deterministic regressions, not
  * fuzzing). Every mutation RE-READS the whole table and compares
  * per-row per-field, so an ordinal slip in the struct-rebuild
  * projection (the classic add-after-drop bug class), a widen that
  * clobbers a sibling, or a NULL parent sprouting values surfaces at
  * the exact op that broke, with the seed and op log in the message.
  */
class NestedGauntletSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s
  }

  // Inner-field model: ordered (name, kind) plus per-row values.
  // kind: "int" (widenable), "long" (post-widen), "str", "dbl".
  private case class Model(
      fields: mutable.ArrayBuffer[(String, String)],
      rows: mutable.LinkedHashMap[Long, Option[mutable.LinkedHashMap[String, Any]]])

  private def sqlLit(kind: String, v: Any): String = kind match {
    case "str" => s"'${v.toString}'"
    case "int" => s"CAST(${v} AS INT)"
    case "long" => s"CAST(${v} AS BIGINT)"
    case "dbl" => s"CAST(${v} AS DOUBLE)"
  }

  private def freshValue(kind: String, rnd: Random): Any = kind match {
    case "str" => "s" + rnd.nextInt(1000)
    case "int" => rnd.nextInt(100000)
    case "long" => rnd.nextLong() % 10000000000L
    case "dbl" => math.rint(rnd.nextDouble() * 1e6) / 100.0
  }

  private def check(t: String, m: Model, log: Seq[String], seed: Int): Unit = {
    val got = spark.sql(s"SELECT k, meta FROM $t ORDER BY k").collect()
    val ctx = s"seed=$seed after:\n  ${log.mkString("\n  ")}"
    assert(got.length == m.rows.size, s"row count ${got.length} != ${m.rows.size}; $ctx")
    val expected = m.rows.toSeq.sortBy(_._1)
    got.zip(expected).foreach { case (r, (k, exp)) =>
      assert(r.getLong(0) == k, s"key order; $ctx")
      exp match {
        case None =>
          assert(r.isNullAt(1), s"k=$k meta must be NULL; $ctx")
        case Some(vals) =>
          assert(!r.isNullAt(1), s"k=$k meta must not be NULL; $ctx")
          val st = r.getStruct(1)
          m.fields.zipWithIndex.foreach { case ((name, kind), i) =>
            val expectedV = vals.get(name).orNull
            val gotV = if (st.isNullAt(i)) null else st.get(i)
            val norm = (expectedV, kind) match {
              case (null, _) => null
              case (v: Int, "long") => v.toLong // widened era: ints read as longs
              case (v, _) => v
            }
            assert(gotV == norm,
              s"k=$k field $name (slot $i, $kind): got $gotV expected $norm; $ctx")
          }
      }
    }
  }

  private def run(seed: Int, depth: Int): Unit = {
    val rnd = new Random(seed)
    val t = s"graft.ng.t$seed"
    spark.sql(s"DROP TABLE IF EXISTS $t PURGE")
    spark.sql(s"CREATE TABLE $t (k BIGINT, meta STRUCT<f0: STRING, f1: INT>) USING graft")
    val m = Model(
      mutable.ArrayBuffer("f0" -> "str", "f1" -> "int"),
      mutable.LinkedHashMap.empty)
    var nextK = 0L
    var nextF = 2
    val log = mutable.ArrayBuffer[String]()

    def insertEra(): Unit = {
      val n = 1 + rnd.nextInt(4)
      val rows = (0 until n).map { _ =>
        val k = nextK; nextK += 1
        if (rnd.nextInt(5) == 0) { m.rows(k) = None; s"($k, NULL)" }
        else {
          val vals = mutable.LinkedHashMap[String, Any]()
          val parts = m.fields.map { case (name, kind) =>
            // Occasional NULL inner value.
            if (rnd.nextInt(6) == 0) { vals(name) = null; s"'$name', CAST(NULL AS ${kind match {
              case "str" => "STRING"; case "int" => "INT"; case "long" => "BIGINT"; case "dbl" => "DOUBLE" }})" }
            else { val v = freshValue(kind, rnd); vals(name) = v; s"'$name', ${sqlLit(kind, v)}" }
          }
          m.rows(k) = Some(vals)
          s"($k, named_struct(${parts.mkString(", ")}))"
        }
      }
      log += s"INSERT ${rows.mkString(", ")}"
      spark.sql(s"INSERT INTO $t VALUES ${rows.mkString(", ")}")
    }

    def addField(): Unit = {
      val name = s"f$nextF"; nextF += 1
      val kind = Seq("str", "int", "dbl")(rnd.nextInt(3))
      val sqlT = kind match { case "str" => "STRING"; case "int" => "INT"; case "dbl" => "DOUBLE" }
      log += s"ADD meta.$name $sqlT"
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (meta.$name $sqlT)")
      m.fields += (name -> kind)
      m.rows.values.foreach(_.foreach(_(name) = null))
    }

    def renameField(): Unit = {
      val i = rnd.nextInt(m.fields.length)
      val (old, kind) = m.fields(i)
      val nn = s"f$nextF"; nextF += 1
      log += s"RENAME meta.$old -> $nn"
      spark.sql(s"ALTER TABLE $t RENAME COLUMN meta.$old TO $nn")
      m.fields(i) = nn -> kind
      m.rows.values.foreach(_.foreach { vals =>
        if (vals.contains(old)) { vals(nn) = vals.remove(old).get }
      })
    }

    def widenField(): Unit = {
      val ints = m.fields.zipWithIndex.filter(_._1._2 == "int")
      if (ints.nonEmpty) {
        val ((name, _), i) = ints(rnd.nextInt(ints.length))
        log += s"WIDEN meta.$name INT -> BIGINT"
        spark.sql(s"ALTER TABLE $t ALTER COLUMN meta.$name TYPE BIGINT")
        m.fields(i) = name -> "long"
        m.rows.values.foreach(_.foreach { vals =>
          vals.get(name).foreach {
            case v: Int => vals(name) = v.toLong
            case _ => ()
          }
        })
      }
    }

    def dropField(): Unit = {
      if (m.fields.length > 1) {
        val i = rnd.nextInt(m.fields.length)
        val (name, _) = m.fields(i)
        log += s"DROP meta.$name"
        spark.sql(s"ALTER TABLE $t DROP COLUMN meta.$name")
        m.fields.remove(i)
        m.rows.values.foreach(_.foreach(_.remove(name)))
      }
    }

    insertEra() // never start empty
    check(t, m, log.toSeq, seed)
    (0 until depth).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => insertEra()
        case 4 | 5 => addField()
        case 6 => renameField()
        case 7 => widenField()
        case 8 | 9 => dropField()
      }
      check(t, m, log.toSeq, seed)
    }
    spark.sql(s"DROP TABLE $t PURGE")
  }

  // Soak knobs (same convention as the other gauntlets): depth and
  // extra seeds via env, so a long confidence pass needs no code edit.
  private val soakDepth =
    sys.env.get("SPARK_GRAFT_NESTED_OPS").flatMap(_.toIntOption).getOrElse(22)
  private val seeds: Seq[Int] =
    sys.env.get("SPARK_GRAFT_NESTED_SEEDS")
      .map(_.split(',').toSeq.flatMap(_.trim.toIntOption))
      .filter(_.nonEmpty).getOrElse(Seq(7, 19, 41))

  for (seed <- seeds) {
    test(s"random nested-evolution sequence keeps model equivalence (seed=$seed)") {
      run(seed, depth = soakDepth)
    }
  }
}
