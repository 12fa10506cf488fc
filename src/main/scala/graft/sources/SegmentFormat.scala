package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.UUID


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.types.StructType

// Segment metadata machinery (value comparator, filter evaluation,
// zone maps, segment file IO, equality-delete filters, metadata
// columns) — split from GraftCatalog.scala (same package, no
// behavior change).


/** Evaluates V1 source Filters against stored InternalRows — the
  * delete-path twin of what a file source does with partition values.
  * Only shapes/types it can prove are supported; `supported` is the
  * `canDeleteWhere` gate, so an unprovable predicate rejects the DELETE
  * instead of misapplying it.
  */
/** THE value comparator for every metadata path — zone-map pruning,
  * the delete-filter evaluator, and the aggregate-pushdown fold all
  * compare the same universe of boxed values (stat entries, pushed
  * filter literals, decoded row values), and comparator drift between
  * hand-rolled copies IS a wrong-results bug (a lossy double compare
  * prunes a matching segment; a UTF-16 string compare disagrees with
  * the UTF-8 order the stats writer picked min/max by).
  *
  * Contract: integrals compare exactly as longs; an integral/floating
  * mix goes through BigDecimal so a >2^53 long can't collapse into a
  * lossy double compare; NaN/infinities order per Double.compare (NaN
  * largest — Spark's order); decimals (Spark internal or java.math)
  * compare exactly; strings compare in UTF-8 BINARY order, matching
  * the stats writer's UTF8String min/max selection. None = the pair
  * is not comparable here — callers must treat that as "don't know".
  */
private[graft] object GraftCompare {
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: org.apache.spark.sql.types.Decimal, _) => cmp(x.toJavaBigDecimal, b)
    case (_, y: org.apache.spark.sql.types.Decimal) => cmp(a, y.toJavaBigDecimal)
    case (x: String, y: String) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case (x: Number, y: Number) =>
      val xd = x.doubleValue(); val yd = y.doubleValue()
      val integral = (n: Number) => n match {
        case _: java.lang.Long | _: java.lang.Integer |
             _: java.lang.Short | _: java.lang.Byte => true
        case _ => false
      }
      if (xd.isNaN || yd.isNaN || xd.isInfinite || yd.isInfinite)
        Some(java.lang.Double.compare(xd, yd))
      else if (integral(x) && integral(y))
        Some(java.lang.Long.compare(x.longValue(), y.longValue()))
      else
        Some(new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString)))
    case _ => None
  }
}

private[sources] object GraftFilterEval {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  private def ordinal(schema: StructType, attr: String): Int = schema.fieldIndex(attr)

  private def comparable(schema: StructType, attr: String): Boolean =
    schema.fields(ordinal(schema, attr)).dataType match {
      case _: NumericType | StringType | BooleanType => true
      case _ => false
    }

  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, _) => comparable(schema, a)
    case GreaterThan(a, _) => comparable(schema, a)
    case GreaterThanOrEqual(a, _) => comparable(schema, a)
    case LessThan(a, _) => comparable(schema, a)
    case LessThanOrEqual(a, _) => comparable(schema, a)
    case In(a, _) => comparable(schema, a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case Not(c) => supported(c, schema)
    case AlwaysTrue() | AlwaysFalse() => true
    case _ => false
  }

  /** Row value at `attr` as a JVM-comparable external value (UTF8String
    * → String etc.), or null.
    */
  private def value(schema: StructType, row: InternalRow, attr: String): Any = {
    val i = ordinal(schema, attr)
    if (row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case StringType => row.getUTF8String(i).toString
      case dt => row.get(i, dt)
    }
  }

  /** Three-way comparison via the shared exact comparator
    * ([[GraftCompare]]); filter literals arrive as external JVM values
    * whose numeric subtypes may differ from the column's (e.g. Integer
    * literal on a BIGINT column, java BigDecimal vs internal Decimal).
    */
  private def cmp(l: Any, r: Any): Option[Int] = GraftCompare.cmp(l, r)

  /** SQL THREE-valued evaluation: Some(true) = the row matches,
    * Some(false) = it doesn't, None = UNKNOWN (a NULL operand or an
    * incomparable pair). The DELETE/overwrite caller applies the
    * predicate as "act iff TRUE", so UNKNOWN keeps the row — exactly
    * SQL semantics. A two-valued evaluator here was a data-loss bug:
    * NOT(a = 5) over a NULL `a` flipped false to TRUE and deleted a
    * row SQL says must survive.
    */
  private def eval3(f: Filter, schema: StructType, row: InternalRow): Option[Boolean] = {
    def cmp3(a: String, v: Any)(p: Int => Boolean): Option[Boolean] = {
      val x = value(schema, row, a)
      if (x == null || v == null) None else cmp(x, v).map(p)
    }
    f match {
      case EqualTo(a, v) => cmp3(a, v)(_ == 0)
      case GreaterThan(a, v) => cmp3(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp3(a, v)(_ >= 0)
      case LessThan(a, v) => cmp3(a, v)(_ < 0)
      case LessThanOrEqual(a, v) => cmp3(a, v)(_ <= 0)
      case In(a, vs) =>
        val x = value(schema, row, a)
        if (x == null) None
        else {
          val eqs = vs.toSeq.map(v => if (v == null) None else cmp(x, v).map(_ == 0))
          if (eqs.exists(_.contains(true))) Some(true)
          else if (eqs.forall(_.contains(false))) Some(false)
          else None // a NULL list element: x IN (..., NULL) is UNKNOWN when unmatched
        }
      case IsNull(a) => Some(value(schema, row, a) == null)
      case IsNotNull(a) => Some(value(schema, row, a) != null)
      case And(l, r) => // Kleene AND
        (eval3(l, schema, row), eval3(r, schema, row)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) => // Kleene OR
        (eval3(l, schema, row), eval3(r, schema, row)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(c) => eval3(c, schema, row).map(!_)
      case AlwaysTrue() => Some(true)
      case AlwaysFalse() => Some(false)
      case _ => None // unknown shape: never act on it
    }
  }

  /** Row matches iff the predicate evaluates to TRUE (not UNKNOWN). */
  def eval(f: Filter, schema: StructType, row: InternalRow): Boolean =
    eval3(f, schema, row).contains(true)
}

/** Zone-map pruning: decides, from a segment's per-column min/max/null
  * stats — plus its [[SegmentBloom]] bits for point predicates —
  * whether a pushed Filter can PROVABLY match no row of the
  * segment — then the scan skips the file entirely (parquet row-group
  * statistics + column Bloom filters, Delta data-skipping, same move).
  * Everything here is conservative: any unknown shape, type, or
  * missing stat keeps the segment. Pruning is file-level and therefore
  * INEXACT — Spark always re-applies the full predicate above the scan.
  */
private[graft] object ZoneMap {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._
  import GraftCatalog.{ColStat, Segment}

  /** Shapes/types the pruner understands — what the scan reports as
    * `pushedFilters` (honesty in `explain`: only filters that actually
    * participate in skipping).
    */
  def prunable(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, v) => cmpOk(schema, a, v)
    case EqualNullSafe(a, v) => v == null || cmpOk(schema, a, v)
    case GreaterThan(a, v) => cmpOk(schema, a, v)
    case GreaterThanOrEqual(a, v) => cmpOk(schema, a, v)
    case LessThan(a, v) => cmpOk(schema, a, v)
    case LessThanOrEqual(a, v) => cmpOk(schema, a, v)
    case In(a, vs) => vs.nonEmpty && vs.forall(v => v != null && cmpOk(schema, a, v))
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case StringStartsWith(a, p) => p != null && cmpOk(schema, a, p)
    case And(l, r) => prunable(l, schema) || prunable(r, schema)
    case Or(l, r) => prunable(l, schema) && prunable(r, schema)
    case AlwaysFalse() => true
    case _ => false
  }

  private def cmpOk(schema: StructType, attr: String, v: Any): Boolean =
    schema.fieldNames.contains(attr) && v != null && (v match {
      case _: Number | _: String | _: java.lang.Boolean => true
      // Temporal literals prune against the writer's internal-encoding
      // stats once normalized (see `norm`).
      case _: java.sql.Timestamp | _: java.sql.Date | _: java.time.Instant |
           _: java.time.LocalDate | _: java.time.LocalDateTime => true
      case _ => false
    })

  /** Normalize a pushed temporal literal to the INTERNAL encoding the
    * stats writer tracked (micros for timestamps, epoch days for
    * dates) so `cmp` sees two integrals. Non-temporal values pass
    * through untouched; a literal/type mismatch yields the original
    * value, where `cmp` returns None and pruning safely declines.
    */
  private[sources] def norm(schema: StructType, attr: String, v: Any): Any = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val dt = schema.fields.find(_.name == attr).map(_.dataType)
    (dt, v) match {
      case (Some(TimestampType | TimestampNTZType), t: java.sql.Timestamp) =>
        DateTimeUtils.fromJavaTimestamp(t)
      case (Some(TimestampType | TimestampNTZType), i: java.time.Instant) =>
        DateTimeUtils.instantToMicros(i)
      case (Some(TimestampType | TimestampNTZType), l: java.time.LocalDateTime) =>
        DateTimeUtils.localDateTimeToMicros(l)
      case (Some(DateType), d: java.sql.Date) => DateTimeUtils.fromJavaDate(d)
      case (Some(DateType), l: java.time.LocalDate) => DateTimeUtils.localDateToDays(l)
      case _ => v
    }
  }

  /** True unless the segment PROVABLY holds no matching row. */
  def mightMatch(f: Filter, schema: StructType, seg: Segment): Boolean =
    !provablyEmpty(f, schema, seg)

  private def stat(schema: StructType, seg: Segment, attr: String): Option[ColStat] = {
    val i = schema.fieldNames.indexOf(attr)
    if (i < 0 || seg.stats.length <= i) None else Some(seg.stats(i))
  }

  /** Bloom probe: true only when the column carries [[SegmentBloom]]
    * bits, the literal's type family matches the column's (the
    * canonical hash is only meaningful within a family — integrals
    * hash via longValue, strings via UTF-8 bytes), and the bits PROVE
    * absence. Anything else — no bloom (old ledger segment, builder
    * overflow, untracked type), family mismatch — keeps the segment.
    */
  private def bloomMiss(schema: StructType, seg: Segment, attr: String, v: Any): Boolean = {
    val i = schema.fieldNames.indexOf(attr)
    if (i < 0 || seg.blooms.length <= i || v == null) false
    else seg.blooms(i).exists { bits =>
      val compatible = (schema.fields(i).dataType, v) match {
        case (LongType | IntegerType | ShortType | ByteType,
              _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
              _: java.lang.Byte) => true
        case (StringType, _: String) => true
        case _ => false
      }
      compatible && SegmentBloom.hashOf(v).exists(h => !SegmentBloom.contains(bits, h))
    }
  }

  /** Column provably all-null in this segment: a tracked column with no
    * surviving min and every row counted null. (An UNtracked column
    * also has a null min but nulls == 0 < rows, so it never triggers.)
    */
  private def allNull(s: ColStat, seg: Segment): Boolean =
    s.min == null && s.nulls == seg.rows

  /** Exact three-way compare via the shared [[GraftCompare]] — one
    * comparator for stats, filters, and folds, so pruning can never
    * disagree with the order the stats writer picked min/max by.
    */
  private[sources] def cmp(a: Any, b: Any): Option[Int] = GraftCompare.cmp(a, b)

  /** PROVABLY-DISJOINT probe of an equality delete against one
    * segment: true only when every key of a SINGLE-column delete is
    * excluded by the segment's zone map or Bloom bits. Serves the
    * change feed's paired-update guard — an eq delete REMOVED
    * in-range (RESTORE, or publish-time GC) forces the delete+insert
    * degrade only when it could actually have touched the source
    * segment's rows; in upsert-heavy tables most deletes provably
    * never did. Conservative on multi-column keys, null keys, missing
    * stats, or untracked types: not provably disjoint.
    */
  private[sources] def eqDisjoint(
      schema: StructType, seg: Segment, eq: GraftCatalog.EqDelete): Boolean =
    eq.keyCols.length == 1 && eq.keys.forall { k =>
      // The ONE EqualTo probe (zone map + Bloom + all-null + empty
      // segment) — not a hand copy that could drift from the scan's
      // pruning semantics.
      k.head != null && !mightMatch(EqualTo(eq.keyCols.head, k.head), schema, seg)
    }

  private def provablyEmpty(f: Filter, schema: StructType, seg: Segment): Boolean = {
    if (seg.stats.isEmpty || seg.rows == 0) return false
    def withStat(attr: String)(p: ColStat => Boolean): Boolean =
      stat(schema, seg, attr).exists(s => allNull(s, seg) || (s.min != null && p(s)))
    def outOfRange(attr: String, v: Any): Boolean =
      v != null && withStat(attr)(s =>
        cmp(v, s.min).exists(_ < 0) || cmp(v, s.max).exists(_ > 0))
    // Temporal literals normalize to the internal encodings the stats
    // writer tracked before any compare (integral vs integral).
    def misses(attr: String, v0: Any): Boolean = {
      val v = norm(schema, attr, v0)
      outOfRange(attr, v) || bloomMiss(schema, seg, attr, v)
    }
    f match {
      case EqualTo(a, v) => misses(a, v)
      case EqualNullSafe(a, v) =>
        // `nulls == 0` proves no-nulls only for a TRACKED column (an
        // untracked one never counts — its stat is (null, null, 0) with
        // rows > 0). `min != null` is the tracked-and-saw-values
        // witness; without it, keep the segment.
        if (v == null) stat(schema, seg, a).exists(s => s.nulls == 0 && s.min != null)
        else misses(a, v)
      case GreaterThan(a, v0) => val v = norm(schema, a, v0)
        v != null && withStat(a)(s => cmp(s.max, v).exists(_ <= 0))
      case GreaterThanOrEqual(a, v0) => val v = norm(schema, a, v0)
        v != null && withStat(a)(s => cmp(s.max, v).exists(_ < 0))
      case LessThan(a, v0) => val v = norm(schema, a, v0)
        v != null && withStat(a)(s => cmp(s.min, v).exists(_ >= 0))
      case LessThanOrEqual(a, v0) => val v = norm(schema, a, v0)
        v != null && withStat(a)(s => cmp(s.min, v).exists(_ > 0))
      case In(a, vs) => vs.nonEmpty && vs.forall(v => misses(a, v))
      case IsNull(a) => stat(schema, seg, a).exists(s => s.nulls == 0 && s.min != null)
      case IsNotNull(a) => stat(schema, seg, a).exists(s => allNull(s, seg))
      case StringStartsWith(a, p) =>
        // values in [p, successor(p)) start with p; the segment misses
        // that interval iff max < p, or min > p without carrying it as
        // a prefix (then min >= successor(p), so every value is too).
        p != null && withStat(a)(s =>
          cmp(s.max, p).exists(_ < 0) ||
            (cmp(s.min, p).exists(_ > 0) && (s.min match {
              case m: String => !m.startsWith(p)
              case _ => false
            })))
      case And(l, r) =>
        provablyEmpty(l, schema, seg) || provablyEmpty(r, schema, seg)
      case Or(l, r) =>
        provablyEmpty(l, schema, seg) && provablyEmpty(r, schema, seg)
      case AlwaysFalse() => true
      case _ => false
    }
  }
}

/** Segment file I/O: `[int32 size][UnsafeRow bytes]` records. Writers
  * stream (no buffering of the whole segment); readers reuse one
  * `UnsafeRow` pointed at each record's buffer (the `PartitionReader`
  * contract allows instance reuse).
  */
private[sources] object SegmentIO {
  import GraftCatalog.{ColStat, Segment}

  def delete(seg: Segment): Unit =
    try Files.deleteIfExists(Paths.get(seg.path))
    catch { case _: java.io.IOException => () }

  def newPath(dir: String): String =
    Paths.get(dir, s"seg-${UUID.randomUUID()}.graft").toString

  /** Open a streaming writer; call `add` per row, then `finish` for the
    * Segment (or `abort` to drop the file). Collects the per-column
    * zone map (min/max/null-count) and byte size as it streams — one
    * typed read + compare per column per row, no second pass.
    */
  final class Writer(dir: String, schema: StructType) {
    import org.apache.spark.sql.types._
    private val path = newPath(dir)
    private var out: DataOutputStream = _
    private var n = 0L
    private var bytes = 0L
    private val width = schema.length
    private val mins = new Array[Any](width)
    private val maxs = new Array[Any](width)
    private val nulls = new Array[Long](width)
    // Column types the zone map tracks; others get ColStat(null, null, 0)
    // with a rows-long null count of 0 — ZoneMap treats a null min with
    // nulls < rows as "unsupported, never prune".
    // Temporal columns track through their INTERNAL encodings (micros
    // Long / epoch-day Int) — ZoneMap normalizes pushed temporal
    // literals to the same encodings, which is what makes time-range
    // segment skipping work on event tables (the 100 TB time-series
    // case: a `ts BETWEEN ...` should read days, not history).
    private val tracked: Array[Boolean] = schema.fields.map(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | BooleanType | StringType |
           TimestampType | TimestampNTZType | DateType => true
      case _ => false
    })
    // Bloom-tracked columns (point-lookup-shaped types) get a distinct-
    // hash builder; floats/booleans don't (degenerate point equality).
    private val blooms: Array[SegmentBloom.Builder] =
      schema.fields.map(f =>
        if (SegmentBloom.trackable(f.dataType)) new SegmentBloom.Builder else null)

    private def colValue(row: UnsafeRow, i: Int): Any = schema.fields(i).dataType match {
      case LongType | TimestampType | TimestampNTZType => row.getLong(i)
      case IntegerType | DateType => row.getInt(i)
      case ShortType => row.getShort(i)
      case ByteType => row.getByte(i)
      case DoubleType => row.getDouble(i)
      case FloatType => row.getFloat(i)
      case BooleanType => row.getBoolean(i)
      // UnsafeRow string reads point into the (reused) row buffer —
      // clone before retaining as a min/max.
      case StringType => row.getUTF8String(i).clone()
      case _ => null
    }

    // Exact same-type comparisons (a column's values share one boxed
    // type); Double/Float use compare() so NaN orders largest, matching
    // Spark's ordering.
    private def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) => x < y
      case (x: java.lang.Integer, y: java.lang.Integer) => x < y
      case (x: java.lang.Short, y: java.lang.Short) => x < y
      case (x: java.lang.Byte, y: java.lang.Byte) => x < y
      case (x: java.lang.Double, y: java.lang.Double) =>
        java.lang.Double.compare(x, y) < 0
      case (x: java.lang.Float, y: java.lang.Float) =>
        java.lang.Float.compare(x, y) < 0
      case (x: java.lang.Boolean, y: java.lang.Boolean) => !x && y
      case (x: org.apache.spark.unsafe.types.UTF8String,
            y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y) < 0
      case _ => false
    }

    def add(row: UnsafeRow): Unit = {
      if (out == null) // lazy: a rowless task publishes no segment
        out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 16))
      val b = row.getBytes
      out.writeInt(b.length)
      out.write(b)
      bytes += 4L + b.length
      n += 1
      var i = 0
      while (i < width) {
        if (tracked(i)) {
          if (row.isNullAt(i)) nulls(i) += 1
          else {
            val v = colValue(row, i)
            if (mins(i) == null || lt(v, mins(i))) mins(i) = v
            if (maxs(i) == null || lt(maxs(i), v)) maxs(i) = v
            if (blooms(i) != null) blooms(i).add(v)
          }
        }
        i += 1
      }
    }

    def finish(): Option[Segment] =
      if (out == null) None
      else {
        out.close()
        // UTF8String min/max become external Strings: serializable in
        // the metastore and directly comparable to pushed Filter values.
        def ext(v: Any): Any = v match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other
        }
        val stats = Vector.tabulate(width)(i => ColStat(ext(mins(i)), ext(maxs(i)), nulls(i)))
        val bl = Vector.tabulate(width)(i =>
          if (blooms(i) == null) None else blooms(i).result())
        Some(Segment(path, n, bytes, stats, blooms = bl))
      }
    def abort(): Unit = {
      if (out != null) out.close()
      try Files.deleteIfExists(Paths.get(path))
      catch { case _: java.io.IOException => () }
    }
  }

  /** Iterate a segment's rows. The yielded `UnsafeRow` is REUSED —
    * copy before retaining.
    */
  /** Iterate a segment's LIVE rows (deletion-vector ordinals are read
    * past and skipped, so every maintenance rewrite — compact, Z-order,
    * ALTER migration, delete-rewrite — materializes deletes for free).
    */
  def foreachRow(seg: Segment, numFields: Int)(f: UnsafeRow => Unit): Unit =
    foreachRowPhysical(seg, numFields) { (row, ord) =>
      if (!seg.dv.exists(d => ord <= Int.MaxValue && d.contains(ord.toInt))) f(row)
    }

  /** Iterate ALL physical rows with their file ordinals — the
    * deletion-vector builder's view (a DELETE must address rows by
    * physical position, deleted-or-not).
    */
  def foreachRowPhysical(seg: Segment, numFields: Int)(f: (UnsafeRow, Long) => Unit): Unit = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(seg.path), 1 << 16))
    try {
      val row = new UnsafeRow(numFields)
      // One growable buffer for the whole segment — per-record byte[]
      // allocation on the scan hot path was the only thing the reused
      // UnsafeRow wrapper still paid for. pointTo takes an explicit
      // size, so an oversized buffer is fine (and getBytes copies
      // exactly sizeInBytes when a consumer retains the row).
      var buf = new Array[Byte](1 << 10)
      var i = 0L
      while (i < seg.rows) {
        val size = in.readInt()
        if (size > buf.length) buf = new Array[Byte](math.max(size, buf.length << 1))
        in.readFully(buf, 0, size)
        row.pointTo(buf, size)
        f(row, i)
        i += 1
      }
    } finally in.close()
  }

  /** Stream `seg` (laid out with `inFields` columns) through `f` into a
    * fresh segment in `dir` whose rows follow `outSchema` (zone maps are
    * re-collected under the OUTPUT layout); rows mapped to None are
    * dropped. Always yields a segment (possibly empty-file-free: None
    * when no rows survive).
    */
  def rewriteOpt(seg: Segment, dir: String, inFields: Int, outSchema: StructType)(
      f: UnsafeRow => Option[UnsafeRow]): Option[Segment] = {
    import GraftCatalog.{RunAccumulator, RunCursor}
    val w = new Writer(dir, outSchema)
    // Migrations are value-rewrites of the SAME rows — row ids and
    // update-seqs carry over run-by-run (dv-masked or f-dropped rows
    // break runs, exactly like compaction's fold).
    val acc = new RunAccumulator
    val cur = new RunCursor(seg.lineage)
    foreachRowPhysical(seg, inFields) { (r, ord) =>
      val masked = seg.dv.exists(d => ord <= Int.MaxValue && d.contains(ord.toInt))
      if (!masked) f(r) match {
        case Some(out) =>
          w.add(out)
          cur.at(ord) match {
            case Some((id, q)) => acc.push(id, q)
            case None => acc.invalidate()
          }
        case None => ()
      }
    }
    // A rewrite never crosses partition boundaries: the rewritten
    // segment inherits the source segment's partition key (and the
    // spec that key is valued over) AND its data sequence number — a
    // 1:1 re-projection copies eq-deleted rows verbatim, so the
    // equality filters must keep applying to the output exactly as
    // they did to the source.
    w.finish().map(_.copy(key = seg.key, spec = seg.spec, seq = seg.seq,
      lineage = acc.result()))
  }
}

/** One compiled equality-delete filter a reader applies to a segment:
  * key-column ordinals + types in the table layout, and the external
  * key tuples to subtract. Compiled per (segment, applicable deletes)
  * at plan time — the empty-list fast path costs nothing on tables
  * that never upserted.
  */
private[graft] case class EqFilter(
    idx: IndexedSeq[Int], dts: IndexedSeq[org.apache.spark.sql.types.DataType],
    keys: Set[IndexedSeq[Any]]) extends Serializable {
  def matches(r: UnsafeRow): Boolean = {
    import org.apache.spark.sql.types.StringType
    val tuple: IndexedSeq[Any] = idx.indices.map { j =>
      val i = idx(j)
      if (r.isNullAt(i)) null
      else dts(j) match {
        case StringType => r.getUTF8String(i).toString
        case dt => r.get(i, dt)
      }
    }
    keys.contains(tuple)
  }
}

private[graft] object EqFilter {
  /** Compile each delete ONCE per plan (the `keys.toSet` build is the
    * expensive part — per-segment recompilation would copy a 100k-key
    * set once per split and serialize one copy per task). Share the
    * result across segments via [[applicable]].
    */
  def compileAll(
      schema: StructType,
      eqs: Seq[GraftCatalog.EqDelete]): IndexedSeq[(Long, EqFilter)] =
    eqs.iterator.map { eq =>
      val idx = eq.keyCols.map(schema.fieldIndex).toIndexedSeq
      eq.seq -> EqFilter(idx, idx.map(schema.fields(_).dataType), eq.keys.toSet)
    }.toIndexedSeq

  /** The pre-compiled filters applicable to `seg` (strictly newer than
    * its data sequence number).
    */
  def applicable(
      compiled: IndexedSeq[(Long, EqFilter)],
      seg: GraftCatalog.Segment): Seq[EqFilter] =
    compiled.collect { case (sq, f) if sq > seg.seq => f }

  /** One-shot convenience for single-segment callers. */
  def compile(
      schema: StructType, eqs: Seq[GraftCatalog.EqDelete],
      seg: GraftCatalog.Segment): Seq[EqFilter] =
    applicable(compileAll(schema, eqs), seg)

  /** keep-predicate over live rows, or None when nothing applies. */
  def keepOf(fs: Seq[EqFilter]): Option[UnsafeRow => Boolean] =
    if (fs.isEmpty) None else Some(r => !fs.exists(_.matches(r)))

}

/** A catalog table: batch-readable, batch-writable (append + truncate)
  * with the same two-phase commit protocol as GraftMemorySink, and
  * DELETE-capable (`SupportsDelete`): `DELETE FROM graft.ns.t WHERE …`
  * ships the WHERE down as source Filters and the table rewrites its
  * committed segments — the metadata-delete path (file-source analogue:
  * dropping whole partitions), not a row-level MERGE rewrite.
  * Predicates the evaluator can't prove (`canDeleteWhere` false) fail
  * the statement instead of deleting the wrong rows.
  */
/** The catalog's metadata columns (the Iceberg `_file`/`_pos` shape):
  * hidden from `SELECT *`, served by the scan when referenced.
  * `_pos` is the PHYSICAL ordinal — rows masked by a deletion vector
  * leave visible gaps, which is exactly what makes it useful for
  * debugging merge-on-read state.
  */
private[sources] object GraftMetaCols {
  import org.apache.spark.sql.types.{LongType, StringType}
  val Segment = "_segment"
  val Pos = "_pos"
  val RowId = "_row_id"
  val LastUpdatedSeq = "_last_updated_seq"
  val names: Seq[String] = Seq(Segment, Pos, RowId, LastUpdatedSeq)
  private final case class Col(
      name: String, dataType: org.apache.spark.sql.types.DataType,
      override val comment: String, nullable: Boolean = false)
      extends MetadataColumn {
    override def isNullable: Boolean = nullable
  }
  val columns: Array[MetadataColumn] = Array(
    Col(Segment, StringType, "segment file path serving this row"),
    Col(Pos, LongType, "physical row ordinal within the segment (dv gaps visible)"),
    // Row lineage (see Segment.lineage): null for rows of segments
    // committed by a pre-lineage ledger or whose runs an
    // order-perturbing rewrite dropped mid-flight.
    Col(RowId, LongType,
      "stable table-scoped row id, assigned at first commit and carried " +
        "through 1:1 rewrites and compaction", nullable = true),
    Col(LastUpdatedSeq, LongType,
      "snapshot version of the commit that last changed this row " +
        "(SEGMENT granularity on CoW row-level rewrites: untouched rows " +
        "co-located in a touched segment re-stamp too — see Segment.lineage)",
      nullable = true))
}

