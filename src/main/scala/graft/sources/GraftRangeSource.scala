package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 custom source (SURVEY.md §2b extension surface; the one
  * Catalyst extension point the engine didn't exercise elsewhere): a
  * deterministic numeric relation `[start, end)` with derived columns
  *
  *   id  BIGINT    — the range value
  *   val DOUBLE    — id * 0.25 (dyadic ⇒ sums are exact in double)
  *   tag BIGINT    — id % 7
  *
  * generated INSIDE the reader, so pushdown is observable:
  *
  *  - **Filter pushdown** (`SupportsPushDownFilters`): comparisons on
  *    `id` narrow the `[start, end)` bounds BEFORE splits are planned —
  *    the DSv2 analogue of parquet row-group pruning; a pushed
  *    `id >= x` genuinely shrinks what the source enumerates, it isn't
  *    re-filtered post-scan. Non-`id` filters are returned as residual
  *    for Spark to evaluate.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only the requested fields — a 1-column projection
  *    never computes the other two (the "scan reads all columns for a
  *    2-column projection is wrong" rule, applied to a generator).
  *  - **Splits**: the (possibly narrowed) range is cut into `slices`
  *    contiguous `InputPartition`s — the multi-executor parallelism
  *    contract; at 100 TB `slices` is sized to the cluster, and each
  *    split is an independent task with no shared state.
  *
  * Registered via META-INF/services as short name `graft-range`:
  * `spark.read.format("graft-range").option("start", …).option("end", …)`.
  */
class GraftRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val start = Option(properties.get("start")).map(_.toLong).getOrElse(0L)
    val end = Option(properties.get("end")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException("graft-range requires an 'end' option"))
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8)
    require(slices > 0, s"slices must be positive, got $slices")
    val rowsPerBatch = Option(properties.get("rowsPerBatch")).map(_.toLong).getOrElse(1000L)
    require(rowsPerBatch > 0, s"rowsPerBatch must be positive, got $rowsPerBatch")
    new GraftRangeTable(start, end, slices, rowsPerBatch)
  }
}

object GraftRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", LongType, nullable = false)))
}

private[sources] class GraftRangeTable(
    start: Long, end: Long, slices: Int, rowsPerBatch: Long = 1000L)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range[$start, $end)"
  override def schema(): StructType = GraftRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(start, end, slices, rowsPerBatch)
}

private[sources] class GraftRangeScanBuilder(
    start: Long, end: Long, slices: Int, rowsPerBatch: Long = 1000L)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var lo = start
  private var hi = end // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = GraftRangeSource.schema
  private var pushedAggs: Option[Seq[GraftRangeAgg]] = None

  private def lit(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Saturating successor: `v + 1` overflows at Long.MaxValue and would
    * wrap a pushed `id <= MaxValue` into an empty scan (hi = MinValue).
    * Saturation is exact here because `hi <= Long.MaxValue` always — an
    * id of MaxValue can never be in `[lo, hi)` anyway.
    */
  private def satInc(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  /** A pushed comparison on `id` is absorbed COMPLETELY into the scan
    * bounds (the range is dense and sorted by construction), so it is
    * both `pushedFilters` (source handles it) and not residual. Anything
    * else — other columns, IsNull, Or — stays with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case EqualTo("id", v) if lit(v).isDefined =>
        val x = lit(v).get; lo = math.max(lo, x); hi = math.min(hi, satInc(x))
        pushed :+= EqualTo("id", v); false
      case GreaterThan("id", v) if lit(v).isDefined =>
        lo = math.max(lo, satInc(lit(v).get)); pushed :+= GreaterThan("id", v); false
      case GreaterThanOrEqual("id", v) if lit(v).isDefined =>
        lo = math.max(lo, lit(v).get); pushed :+= GreaterThanOrEqual("id", v); false
      case LessThan("id", v) if lit(v).isDefined =>
        hi = math.min(hi, lit(v).get); pushed :+= LessThan("id", v); false
      case LessThanOrEqual("id", v) if lit(v).isDefined =>
        hi = math.min(hi, satInc(lit(v).get)); pushed :+= LessThanOrEqual("id", v); false
      case _ => true
    }
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown: a dense range answers ungrouped COUNT(*) /
    * MIN(id) / MAX(id) in O(1) from its (already filter-narrowed)
    * bounds — the aggregation is pushed COMPLETELY (Spark plans no
    * aggregate at all, scale analogue: answering from footer/metadata
    * statistics instead of scanning). Anything else — group-bys,
    * aggregates over computed columns — is declined and runs above the
    * scan as usual.
    */
  private def translate(agg: Aggregation): Option[Seq[GraftRangeAgg]] = {
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
        case _ => false
      }
    if (agg.groupByExpressions.nonEmpty) return None
    val translated = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(GraftRangeAgg.CountStar)
      case m: Min if isId(m.column) => Some(GraftRangeAgg.MinId)
      case m: Max if isId(m.column) => Some(GraftRangeAgg.MaxId)
      case _ => None
    }
    if (translated.nonEmpty && translated.forall(_.isDefined)) Some(translated.flatten)
    else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some(t) => pushedAggs = Some(t); true
      case None => false
    }

  /** LIMIT pushdown: the range is dense and generated in order, so
    * LIMIT n is exactly the first n ids — the scan bounds shrink to
    * [lo, lo+n) and the pushdown is COMPLETE. A TopN ordered by `id`
    * narrows from whichever end the sort points at — but completeness
    * differs by direction: the reader always EMITS ascending, so an
    * ascending TopN is complete (scan output order IS the requested
    * order), while a descending TopN is only PARTIAL — the scan keeps
    * just the top-n ids `[hi-n, hi)` but Spark must retain its
    * Sort+Limit to reverse them (`isPartiallyPushed` true). Any other
    * sort key declines (row order ≠ range order).
    */
  private var partiallyPushed = false

  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, if (lo > hi - limit) hi else lo + limit)
    true
  }
  override def isPartiallyPushed(): Boolean = partiallyPushed

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val byIdOnly = orders.length == 1 && (orders(0).expression() match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (!byIdOnly) return false
    val n = math.max(0, math.min(limit.toLong, math.max(0L, hi - lo)))
    if (orders(0).direction() == SortDirection.ASCENDING) hi = lo + n
    else { lo = hi - n; partiallyPushed = true }
    true
  }

  override def build(): Scan = pushedAggs match {
    case Some(aggs) => GraftRangeAggScan(lo, math.max(lo, hi), aggs)
    case None => GraftRangeScan(lo, math.max(lo, hi), slices, required, rowsPerBatch)
  }
}

/** The three metadata-answerable aggregates over a dense range. */
private[graft] sealed trait GraftRangeAgg extends Serializable
private[graft] object GraftRangeAgg {
  case object CountStar extends GraftRangeAgg
  case object MinId extends GraftRangeAgg
  case object MaxId extends GraftRangeAgg
}

/** O(1) scan for a completely-pushed aggregation: one split, one row,
  * values computed from the bounds — no range enumeration at all.
  */
private[graft] case class GraftRangeAggScan(lo: Long, hi: Long, aggs: Seq[GraftRangeAgg])
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(aggs.map {
    case GraftRangeAgg.CountStar => StructField("COUNT(*)", LongType, nullable = false)
    case GraftRangeAgg.MinId => StructField("MIN(id)", LongType, nullable = true)
    case GraftRangeAgg.MaxId => StructField("MAX(id)", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeAggScan[$lo, $hi) aggs=[${aggs.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRangeSplit(0, 1)) // one carrier split; values come from bounds

  override def createReaderFactory(): PartitionReaderFactory = {
    val n = hi - lo
    val row = InternalRow.fromSeq(aggs.map {
      case GraftRangeAgg.CountStar => n
      case GraftRangeAgg.MinId => if (n > 0) lo else null
      case GraftRangeAgg.MaxId => if (n > 0) hi - 1 else null
    })
    GraftRowsFactory(Array(row))
  }
}

private[graft] case class GraftRangeScan(
    lo: Long, hi: Long, slices: Int, required: StructType,
    rowsPerBatch: Long = 1000L) extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering {

  // Runtime-filter-narrowed bounds (SPARK-35779 "DPP for V2"): at
  // execution time Spark hands the scan an IN predicate built from the
  // OTHER join side's keys; a dense range prunes to [min, max+1] of
  // those values — a superset of the exact set, which is all a runtime
  // filter needs (the join still filters exactly). Deliberately NOT
  // constructor fields: scan equality (exchange reuse) must ignore them.
  @transient private var rtLo: Long = Long.MinValue
  @transient private var rtHi: Long = Long.MaxValue
  private[graft] def effectiveBounds: (Long, Long) =
    (math.max(lo, rtLo), math.min(hi, rtHi))

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val isId = p.children()(0) match {
          case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
          case _ => false
        }
        val vals: Seq[Long] = p.children().drop(1).toSeq.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[java.lang.Number] =>
            l.value().asInstanceOf[java.lang.Number].longValue()
        }
        if (isId && vals.nonEmpty) {
          rtLo = math.max(rtLo, vals.min)
          rtHi = math.min(rtHi, if (vals.max == Long.MaxValue) Long.MaxValue else vals.max + 1)
        }
      }
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Exact statistics from the (filter-narrowed) bounds — what lets the
    * planner auto-broadcast a small narrowed range in a join without an
    * explicit hint (the metadata-statistics analogue of parquet footer
    * row counts).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * (8L * required.length.max(1)))
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftRangeMicroBatchStream(lo, hi, slices, required, rowsPerBatch)
  override def description(): String =
    s"GraftRangeScan[$lo, $hi) slices=$slices cols=[${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val (elo, ehi) = effectiveBounds
    val n = ehi - elo
    if (n <= 0) return Array.empty
    val parts = math.min(slices.toLong, n).toInt
    // Per-split bounds WITHOUT the i*n product (which overflows for
    // n > Long.MaxValue / parts): base size + one extra row for the
    // first (n % parts) splits. Every term stays <= n.
    val base = n / parts
    val rem = n % parts
    Array.tabulate(parts) { i =>
      val start = elo + i * base + math.min(i.toLong, rem)
      val end = start + base + (if (i < rem) 1L else 0L)
      GraftRangeSplit(start, end)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftRangeReaderFactory(required.fieldNames)
}

private[graft] case class GraftRangeSplit(lo: Long, hi: Long) extends InputPartition

/** Streaming offset = the exclusive high-watermark id already emitted.
  * The range is dense, so one long IS the complete source position —
  * the checkpointed json round-trips it exactly.
  */
private[graft] case class GraftRangeOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** The MICRO_BATCH_READ half of the source (same splits + reader as the
  * batch scan): each trigger admits up to `rowsPerBatch` ids
  * (`SupportsAdmissionControl`), so a bounded range replays as a
  * multi-batch stream with real offset tracking — restart from a
  * checkpoint resumes at the committed watermark and re-emits nothing.
  * `SupportsTriggerAvailableNow` lets `Trigger.AvailableNow` drain the
  * remaining range through the SAME rate-limited path (N batches, then
  * stop) instead of one giant batch.
  *
  * Statelessness matters here: the stream object keeps NO mutable
  * progress — every batch is derived from the (start, end] offsets the
  * engine hands back, which is what makes recovery trivially correct.
  */
private[graft] class GraftRangeMicroBatchStream(
    lo: Long, hi: Long, slices: Int, required: StructType, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = GraftRangeOffset(lo)
  override def deserializeOffset(json: String): Offset = GraftRangeOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def reportLatestOffset(): Offset = GraftRangeOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled entry point")

  /** Admission control honors the engine's ReadLimit faithfully:
    * `ReadAllAvailable` (Trigger.Once) drains to `hi` in ONE batch,
    * `ReadMaxRows` caps the slice, and a `CompositeReadLimit` takes the
    * tightest row cap among its parts (min-rows semantics don't apply
    * to a bounded replay source — there is never a reason to wait).
    * Unknown limit kinds fall back to the configured batch size rather
    * than silently under- or over-delivering.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftRangeOffset].v
    // Only limit kinds that CAP the batch participate in the min: a
    // composite like (minRows, maxRows) must resolve to maxRows, not to
    // the tighter-of(configured batch size, maxRows) — min-row /
    // trigger-hint parts are not caps and would wrongly throttle.
    def capOf(l: ReadLimit): Option[Long] = l match {
      case _: ReadAllAvailable => Some(Long.MaxValue)
      case r: ReadMaxRows => Some(math.max(1L, r.maxRows()))
      case c: CompositeReadLimit =>
        val caps = c.getReadLimits.flatMap(capOf)
        if (caps.isEmpty) None else Some(caps.min)
      case _ => None
    }
    val step = capOf(limit).getOrElse(rowsPerBatch)
    GraftRangeOffset(math.min(hi, if (s > hi - step) hi else s + step))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftRangeScan(
      start.asInstanceOf[GraftRangeOffset].v,
      end.asInstanceOf[GraftRangeOffset].v,
      slices, required).planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory =
    GraftRangeReaderFactory(required.fieldNames)
}

private[graft] case class GraftRangeReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[GraftRangeSplit]
    new PartitionReader[InternalRow] {
      // Field names resolve to ordinal codes ONCE per reader, and the
      // output row object is reused (the PartitionReader contract:
      // `get()` may return the same instance; Spark copies if it
      // retains) — no per-row string matching or Seq allocation in the
      // innermost loop.
      private val codes: Array[Int] = fields.map {
        case "id" => 0
        case "val" => 1
        case "tag" => 2
      }
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(codes.length)
      private var cur = split.lo - 1
      override def next(): Boolean = { cur += 1; cur < split.hi }
      override def get(): InternalRow = {
        var i = 0
        while (i < codes.length) {
          codes(i) match {
            case 0 => row.update(i, cur)
            case 1 => row.update(i, cur * 0.25)
            case 2 => row.update(i, cur % 7)
          }
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
