package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftCatalog.{ColStat, Segment}
import graft.sources.ZoneMap

/** Pure-function tests for the catalog's zone-map segment pruner: the
  * decision must be EXACTLY "provably no matching row" — aggressive
  * where min/max prove emptiness, conservative everywhere else (missing
  * stats, unsupported types/shapes, nulls, precision edges).
  */
class ZoneMapSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("arr", ArrayType(LongType)))) // untracked type

  /** Segment with id ∈ [100, 200] (no nulls), name ∈ ["ham", "pig"]
    * (2 nulls), score ∈ [0.5, 9.5], flag = true only, arr untracked.
    */
  private val seg = Segment("/nope", rows = 50, bytes = 1000, stats = Vector(
    ColStat(100L, 200L, 0),
    ColStat("ham", "pig", 2),
    ColStat(0.5d, 9.5d, 0),
    ColStat(java.lang.Boolean.TRUE, java.lang.Boolean.TRUE, 0),
    ColStat(null, null, 0)))

  private def keep(f: Filter): Boolean = ZoneMap.mightMatch(f, schema, seg)

  test("range comparisons prune outside [min, max] and keep the boundary") {
    assert(!keep(EqualTo("id", 99L)) && !keep(EqualTo("id", 201L)))
    assert(keep(EqualTo("id", 100L)) && keep(EqualTo("id", 200L)) && keep(EqualTo("id", 150L)))
    assert(!keep(GreaterThan("id", 200L)) && keep(GreaterThan("id", 199L)))
    assert(!keep(GreaterThanOrEqual("id", 201L)) && keep(GreaterThanOrEqual("id", 200L)))
    assert(!keep(LessThan("id", 100L)) && keep(LessThan("id", 101L)))
    assert(!keep(LessThanOrEqual("id", 99L)) && keep(LessThanOrEqual("id", 100L)))
    // filter literal type may differ from the column's (Int vs Long col)
    assert(!keep(EqualTo("id", 99)) && keep(EqualTo("id", 150)))
    // doubles, strings, booleans
    assert(!keep(GreaterThan("score", 9.5d)) && keep(GreaterThan("score", 9.4d)))
    assert(!keep(EqualTo("name", "zebra")) && keep(EqualTo("name", "hog")))
    assert(!keep(EqualTo("flag", java.lang.Boolean.FALSE)) &&
      keep(EqualTo("flag", java.lang.Boolean.TRUE)))
  }

  test("IN prunes only when every value is out of range; null members disable proof") {
    assert(!keep(In("id", Array(1L, 2L, 300L))))
    assert(keep(In("id", Array(1L, 150L))))
    assert(keep(In("id", Array(1L, null)))) // null member → conservative
    assert(keep(In("id", Array.empty[Any]))) // empty IN → never prune here
  }

  test("null accounting: IsNull prunes null-free segments, IsNotNull prunes all-null ones") {
    assert(!keep(IsNull("id"))) // 0 nulls
    assert(keep(IsNull("name"))) // 2 nulls
    assert(keep(IsNotNull("id")))
    val allNullSeg = seg.copy(stats = seg.stats.updated(0, ColStat(null, null, 50)))
    assert(!ZoneMap.mightMatch(IsNotNull("id"), schema, allNullSeg))
    assert(!ZoneMap.mightMatch(EqualTo("id", 150L), schema, allNullSeg),
      "comparisons can't match an all-null column")
    assert(!ZoneMap.mightMatch(EqualNullSafe("id", null), schema, seg))
    assert(ZoneMap.mightMatch(EqualNullSafe("name", null), schema, seg))
  }

  test("AND prunes if either side proves empty; OR needs both") {
    assert(!keep(And(EqualTo("id", 150L), EqualTo("name", "zebra"))))
    assert(keep(And(EqualTo("id", 150L), EqualTo("name", "hog"))))
    assert(!keep(Or(EqualTo("id", 99L), EqualTo("name", "zebra"))))
    assert(keep(Or(EqualTo("id", 99L), EqualTo("name", "hog"))))
  }

  test("StringStartsWith prunes segments outside the prefix interval") {
    assert(!keep(StringStartsWith("name", "z"))) // max "pig" < "z"
    assert(!keep(StringStartsWith("name", "a"))) // min "ham" > "a", no prefix
    assert(keep(StringStartsWith("name", "ha")))
    assert(keep(StringStartsWith("name", "p")))
    // boundary: min itself carries the prefix
    assert(keep(StringStartsWith("name", "ham")))
  }

  test("conservative on anything unprovable") {
    // untracked column type (array) never prunes
    assert(keep(EqualTo("arr", 1L)))
    // unknown attribute
    assert(keep(EqualTo("nope", 1L)))
    // stat-less segment (legacy layout)
    val bare = Segment("/nope", rows = 50)
    assert(ZoneMap.mightMatch(EqualTo("id", 99L), schema, bare))
    // unsupported filter shape
    assert(keep(Not(EqualTo("id", 99L))))
    assert(keep(StringContains("name", "zz")))
  }

  test("big-long precision: 2^53-adjacent longs never collapse into a lossy double compare") {
    // min = max = 2^53; the literal 2^53 + 1 rounds to the SAME
    // double, so a doubleValue() comparison would wrongly keep (or,
    // worse, a stat built that way could wrongly prune). The exact
    // integral path must prove the mismatch.
    val big = 1L << 53
    assert(big.toDouble == (big + 1L).toDouble, "test premise: doubles collide")
    val s2 = seg.copy(stats = seg.stats.updated(0, ColStat(big, big, 0)))
    assert(!ZoneMap.mightMatch(EqualTo("id", big + 1L), schema, s2))
    assert(ZoneMap.mightMatch(EqualTo("id", big), schema, s2))
  }

  test("prunable() reports exactly the shapes the pruner understands") {
    assert(ZoneMap.prunable(EqualTo("id", 1L), schema))
    assert(ZoneMap.prunable(In("id", Array(1L, 2L)), schema))
    assert(ZoneMap.prunable(IsNull("arr"), schema)) // null counts track every type
    assert(!ZoneMap.prunable(EqualTo("nope", 1L), schema))
    assert(!ZoneMap.prunable(EqualTo("id", null), schema))
    assert(!ZoneMap.prunable(In("id", Array[Any](1L, null)), schema))
    assert(!ZoneMap.prunable(Not(EqualTo("id", 1L)), schema))
    assert(ZoneMap.prunable(And(EqualTo("id", 1L), StringContains("name", "x")), schema))
    assert(!ZoneMap.prunable(Or(EqualTo("id", 1L), StringContains("name", "x")), schema))
  }
}
