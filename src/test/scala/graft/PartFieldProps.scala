package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.types._

import graft.sources.{EqFilter, PartBucket, PartField, PartIdentity, PartTruncate}

/** ScalaCheck laws for the hidden-partitioning transforms and the
  * equality-delete row filter — the value-semantics layer that the
  * write router, the FunctionCatalog-resolved cluster functions,
  * compaction's migration/materialization, and the scan-side pruners
  * all share. A divergence in any of these mis-routes rows or
  * mis-prunes segments, so the laws here are the invariants everything
  * else leans on.
  */
object PartFieldProps extends Properties("PartField") {

  private val anyLong = Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
  private val micros = Gen.choose(-3650L * 86400000000L, 3650L * 86400000000L)

  property("bucket: range, determinism, int/long agreement") =
    Prop.forAll(anyLong, Gen.choose(1, 1024)) { (v, n) =>
      val b = PartField.bucketOfLong(n, v)
      b >= 0 && b < n && b == PartField.bucketOfLong(n, v) &&
        // a 32-bit value buckets identically through its widened long
        PartField.bucketOfLong(n, v.toInt.toLong) ==
          PartBucket(n, "c").eval(Integer.valueOf(v.toInt), IntegerType)
    }

  property("bucket(string) hashes UTF-8 bytes, matching the writer's String path") =
    Prop.forAll(Gen.alphaNumStr, Gen.choose(1, 64)) { (s, n) =>
      PartBucket(n, "c").eval(s, StringType) ==
        Integer.valueOf(PartField.bucketOfBytes(n,
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }

  property("days/hours floor: unit*k <= v < unit*(k+1), pre-epoch included") =
    Prop.forAll(micros) { v =>
      val d = PartField.epochDay(v); val h = PartField.epochHour(v)
      d * 86400000000L <= v && v < (d + 1) * 86400000000L &&
        h * 3600000000L <= v && v < (h + 1) * 3600000000L
    }

  property("months/years agree with LocalDate") =
    Prop.forAll(Gen.choose(-100000L, 100000L)) { day =>
      val ld = java.time.LocalDate.ofEpochDay(day)
      PartField.epochMonth(day) == (ld.getYear - 1970) * 12 + ld.getMonthValue - 1 &&
        PartField.epochYear(day) == ld.getYear - 1970
    }

  property("truncate(string): code-point prefix, idempotent") =
    Prop.forAll(Gen.asciiPrintableStr, Gen.choose(1, 16)) { (s, w) =>
      val t = PartField.truncString(w, s)
      s.startsWith(t) && t.codePointCount(0, t.length) <= w &&
        PartField.truncString(w, t) == t
    }

  property("truncate(integral): floor-to-interval law") =
    Prop.forAll(anyLong, Gen.choose(1L, 1000L)) { (v, w) =>
      val t = PartTruncate(w, "c").eval(java.lang.Long.valueOf(v), LongType)
        .asInstanceOf[java.lang.Long].longValue()
      t <= v && v - t < w && Math.floorMod(t, w) == 0L
    }

  private val ident = Gen.identifier.suchThat(s =>
    s.nonEmpty && !s.contains("(") && !s.contains(")") && !s.contains(","))

  property("canonical strings round-trip through parse") =
    Prop.forAll(ident, Gen.choose(1, 512), Gen.oneOf(
      Seq[String => PartField](
        PartIdentity.apply,
        graft.sources.PartDays.apply, graft.sources.PartHours.apply,
        graft.sources.PartMonths.apply, graft.sources.PartYears.apply))) {
      (col, n, mk) =>
        val pf = mk(col)
        PartField.parse(pf.canonical) == pf &&
          PartField.parse(PartBucket(n, col).canonical) == PartBucket(n, col) &&
          PartField.parse(PartTruncate(n.toLong, col).canonical) ==
            PartTruncate(n.toLong, col)
    }

  // ---- EqFilter: reader-side subtraction vs brute-force membership ----

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))
  private val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
    .create(schema.fields.map(_.dataType))
  private def rowOf(k: Long, s: String) = proj(
    org.apache.spark.sql.catalyst.InternalRow(
      k, org.apache.spark.unsafe.types.UTF8String.fromString(s))).copy()

  private val kvGen = Gen.zip(Gen.choose(0L, 30L), Gen.oneOf("a", "b", "c"))

  property("EqFilter.matches == key-set membership (never false positive/negative)") =
    Prop.forAll(Gen.listOfN(40, kvGen), Gen.nonEmptyListOf(kvGen)) { (rows, keys) =>
      val filter = EqFilter(
        IndexedSeq(0, 1), IndexedSeq(LongType, StringType),
        keys.map { case (k, s) => IndexedSeq[Any](java.lang.Long.valueOf(k), s) }.toSet)
      rows.forall { case (k, s) =>
        filter.matches(rowOf(k, s)) ==
          keys.contains((k, s))
      }
    }

  property("EqFilter.compile scopes by sequence number") =
    Prop.forAll(Gen.choose(0L, 10L), Gen.choose(0L, 10L)) { (segSeq, eqSeq) =>
      val seg = graft.sources.GraftCatalog.Segment("/x", rows = 1L, seq = segSeq)
      val eq = graft.sources.GraftCatalog.EqDelete(
        Seq("k"), Vector(IndexedSeq[Any](java.lang.Long.valueOf(1L))), eqSeq)
      EqFilter.compile(schema, Seq(eq), seg).nonEmpty == (eqSeq > segSeq)
    }
}
