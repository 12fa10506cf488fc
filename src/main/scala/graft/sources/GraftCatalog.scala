package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, DoubleType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 CATALOG plugin — the metadata half of the engine's
  * extension surface (GraftRangeSource/GraftMemorySink are the
  * read/write halves): a `TableCatalog` whose tables are created,
  * written, and queried entirely through SQL DDL/DML once registered as
  *
  *   spark.sql.catalog.graft = graft.sources.GraftCatalog
  *
  *   CREATE TABLE graft.demo.t (id BIGINT, name STRING) USING graft
  *   INSERT INTO graft.demo.t SELECT ...
  *   SELECT ... FROM graft.demo.t
  *
  * Storage is an in-JVM map (the protocol under test is the CATALOG
  * contract — identifier resolution, create/drop/rename lifecycle,
  * analyzer schema checks, and the V2 write path Spark routes INSERT
  * through); a production catalog swaps the map for a metastore and the
  * row store for files, with the identical Spark-facing surface.
  * Namespaces are implicit (any single-level namespace "exists"), the
  * usual shape for a demo/metadata-light catalog.
  *
  * The catalog also serves FUNCTIONS (`FunctionCatalog`) — the V2 UDF
  * extension point where SQL resolves `graft.math.clamp(...)` through
  * the catalog instead of the session registry. The bound function
  * carries the `invoke` magic method, so Catalyst compiles calls to a
  * direct (codegen'd) method invocation — no row boxing on the hot
  * path; `produceResult` stays as the interpreted fallback.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog {
  import GraftCatalog._

  private var catalogName: String = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    store.keySet().asScala.filter(_.namespace.sameElements(namespace)).toArray

  override def loadTable(ident: Identifier): Table = {
    val entry = store.get(ident)
    if (entry == null) throw new NoSuchTableException(ident)
    new GraftCatalogTable(ident, entry.schema)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (store.putIfAbsent(ident, TableEntry(schema, Array.empty)) != null)
      throw new TableAlreadyExistsException(ident.toString, ident.name())
    new GraftCatalogTable(ident, schema)
  }

  /** Schema evolution: ADD COLUMN (appended, nullable) migrates the
    * committed rows eagerly — every stored UnsafeRow is re-projected to
    * the widened layout with NULL in the new slot, atomically with the
    * schema swap (a lazy per-read pad would leave mixed layouts in the
    * store). Everything else (drop/rename/retype) is rejected: narrowing
    * changes silently break readers.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (store.get(ident) == null) throw new NoSuchTableException(ident)
    val result = store.compute(ident, (_, prev) => {
      require(prev != null, s"table $ident dropped mid-alter")
      changes.foldLeft(prev) { (entry, ch) =>
        ch match {
          case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
            val f = org.apache.spark.sql.types.StructField(
              add.fieldNames()(0), add.dataType(), nullable = true)
            val exprs = entry.schema.fields.zipWithIndex.map { case (of, i) =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                i, of.dataType, of.nullable)
            }.toSeq :+ org.apache.spark.sql.catalyst.expressions.Literal(null, f.dataType)
            val proj =
              org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(exprs)
            TableEntry(
              StructType(entry.schema.fields :+ f),
              entry.rows.map(r => proj(r).copy()))
          case other =>
            throw new UnsupportedOperationException(
              s"graft catalog supports only ADD COLUMN, got: $other")
        }
      }
    })
    new GraftCatalogTable(ident, result.schema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    // Clear the streaming-epoch ledger too: a re-created table must not
    // inherit old high-watermarks and silently skip early epochs.
    epochs.keySet.asScala.filter(_._1 == ident).foreach(epochs.remove)
    store.remove(ident) != null
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val entry = store.get(oldIdent)
    if (entry == null) throw new NoSuchTableException(oldIdent)
    if (store.putIfAbsent(newIdent, entry) != null)
      throw new TableAlreadyExistsException(newIdent.toString, newIdent.name())
    epochs.asScala.toSeq.foreach { case (k @ (id, qid), e) =>
      if (id == oldIdent) { epochs.remove(k); epochs.put((newIdent, qid), e) }
    }
    store.remove(oldIdent)
  }

  // ---- SupportsNamespaces: implicit single-level namespaces ----
  override def listNamespaces(): Array[Array[String]] =
    store.keySet().asScala.map(_.namespace.toSeq).toSet.map((s: Seq[String]) => s.toArray).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new IllegalArgumentException(s"no such namespace: ${namespace.mkString(".")}")
    util.Collections.emptyMap()
  }
  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog namespaces carry no metadata")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (cascade) listTables(namespace).foreach(dropTable)
    true
  }

  // ---- FunctionCatalog ----
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("math")))
      Array(Identifier.of(namespace, "clamp"))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(Array("math")) && ident.name == "clamp")
      GraftClampFunction
    else throw new NoSuchFunctionException(ident)
}

/** `graft.math.clamp(x, lo, hi)` — catalog-resolved scalar function. */
private[graft] object GraftClampFunction extends UnboundFunction {
  override def name(): String = "clamp"
  override def description(): String =
    "clamp(x, lo, hi): x bounded into [lo, hi]"

  override def bind(inputType: StructType): BoundFunction = {
    // Accept any numeric triple: the bound `inputTypes()` declares
    // doubles, and the analyzer inserts the casts (numeric literals
    // arrive as decimals — rejecting them here would force callers to
    // CAST by hand).
    val numeric = inputType.fields.forall(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    if (inputType.length != 3 || !numeric)
      throw new UnsupportedOperationException(
        s"clamp expects 3 numeric arguments, got ${inputType.simpleString}")
    new GraftClampBound
  }
}

/** Named (not anonymous) class on purpose: Catalyst finds the `invoke`
  * magic method by PUBLIC reflection, and scalac compiles non-interface
  * methods of anonymous classes as private.
  */
private[graft] class GraftClampBound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(DoubleType, DoubleType, DoubleType)
  override def resultType(): DataType = DoubleType
  override def name(): String = "clamp"
  override def canonicalName(): String = "graft.math.clamp"
  override def isResultNullable: Boolean = false
  // MAGIC METHOD: exact-signature `invoke` — Catalyst lowers the call to
  // a direct method invocation inside codegen (no row boxing).
  def invoke(x: Double, lo: Double, hi: Double): Double =
    math.max(lo, math.min(x, hi))
  override def produceResult(input: InternalRow): java.lang.Double =
    invoke(input.getDouble(0), input.getDouble(1), input.getDouble(2))
}

object GraftCatalog {
  private[sources] case class TableEntry(schema: StructType, rows: Array[UnsafeRow])

  private val store = new ConcurrentHashMap[Identifier, TableEntry]()

  /** Committed row count of a catalog table (test observability). */
  def rowCount(ns: String, table: String): Int =
    Option(store.get(Identifier.of(Array(ns), table))).map(_.rows.length).getOrElse(0)

  private[sources] def install(
      ident: Identifier, rows: Array[UnsafeRow], truncate: Boolean): Unit =
    store.compute(ident, (_, prev) => {
      require(prev != null, s"table $ident dropped mid-write")
      if (truncate) prev.copy(rows = rows) else prev.copy(rows = prev.rows ++ rows)
    })

  private[sources] def rowsOf(ident: Identifier): Array[UnsafeRow] =
    Option(store.get(ident)).map(_.rows).getOrElse(Array.empty)

  /** Last committed streaming epoch per (table, STREAMING QUERY) — the
    * exactly-once ledger: a replayed epoch after failure/restart commits
    * as a no-op. Keyed by the stable query id, not just the table: two
    * independent streaming queries appending to one table each count
    * epochs from 0 and must not dedup against each other.
    */
  private val epochs = new ConcurrentHashMap[(Identifier, String), java.lang.Long]()

  private[sources] def installEpoch(
      ident: Identifier, queryId: String, epochId: Long, rows: Array[UnsafeRow]): Boolean = {
    var applied = false
    store.compute(ident, (_, prev) => {
      require(prev != null, s"table $ident dropped mid-stream")
      val key = (ident, queryId)
      val last = Option(epochs.get(key)).map(_.longValue()).getOrElse(Long.MinValue)
      if (epochId <= last) prev // replayed epoch: already visible, skip
      else {
        epochs.put(key, epochId)
        applied = true
        prev.copy(rows = prev.rows ++ rows)
      }
    })
    applied
  }

  private[sources] def deleteWhere(
      ident: Identifier,
      schema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    store.compute(ident, (_, prev) => {
      require(prev != null, s"table $ident dropped mid-delete")
      prev.copy(rows =
        prev.rows.filterNot(r => filters.forall(GraftFilterEval.eval(_, schema, r))))
    })
}

/** Evaluates V1 source Filters against stored InternalRows — the
  * delete-path twin of what a file source does with partition values.
  * Only shapes/types it can prove are supported; `supported` is the
  * `canDeleteWhere` gate, so an unprovable predicate rejects the DELETE
  * instead of misapplying it.
  */
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

  /** Three-way comparison for supported types; filter literals arrive as
    * external JVM values whose numeric subtypes may differ from the
    * column's (e.g. Integer literal on a BIGINT column).
    */
  private def cmp(l: Any, r: Any): Option[Int] = (l, r) match {
    case (a: Number, b: Number) => Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: java.lang.Boolean, b: java.lang.Boolean) => Some(a.compareTo(b))
    case _ => None
  }

  def eval(f: Filter, schema: StructType, row: InternalRow): Boolean = f match {
    case EqualTo(a, v) => cmp(value(schema, row, a), v).contains(0)
    case GreaterThan(a, v) => cmp(value(schema, row, a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(value(schema, row, a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(value(schema, row, a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(value(schema, row, a), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(value(schema, row, a), v).contains(0))
    case IsNull(a) => value(schema, row, a) == null
    case IsNotNull(a) => value(schema, row, a) != null
    case And(l, r) => eval(l, schema, row) && eval(r, schema, row)
    case Or(l, r) => eval(l, schema, row) || eval(r, schema, row)
    case Not(c) => !eval(c, schema, row)
    case AlwaysTrue() => true
    case AlwaysFalse() => false
    case _ => false
  }
}

/** A catalog table: batch-readable, batch-writable (append + truncate)
  * with the same two-phase commit protocol as GraftMemorySink, and
  * DELETE-capable (`SupportsDelete`): `DELETE FROM graft.ns.t WHERE …`
  * ships the WHERE down as source Filters and the table rewrites its
  * committed rows — the metadata-delete path (file-source analogue:
  * dropping whole partitions), not a row-level MERGE rewrite.
  * Predicates the evaluator can't prove (`canDeleteWhere` false) fail
  * the statement instead of deleting the wrong rows.
  */
private[sources] class GraftCatalogTable(ident: Identifier, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {
  override def name(): String = ident.toString
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => GraftFilterEval.supported(f, schema0))

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    GraftCatalog.deleteWhere(ident, schema0, filters)

  /** GROUP-BASED row-level ops (UPDATE / MERGE INTO / complex DELETE):
    * Spark rewrites the statement into (scan the affected groups) ⋈
    * (source) → recomputed rows → replace those groups. This table's one
    * group is the WHOLE table — the op's scan reads everything and its
    * write is the truncate-commit, so the replacement is atomic under
    * the same two-phase protocol as INSERT OVERWRITE. (A file-backed
    * table would scope groups to matched files/partitions instead.)
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String = s"GraftRowLevel(${info.command()}, $ident)"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () => GraftCatalogScan(ident, schema0)
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite =
              new GraftCatalogBatchWrite(ident, schema0, truncateFirst = true)
          }
        }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftCatalogScan(ident, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftCatalogBatchWrite(ident, schema0, truncateFirst)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftCatalogStreamingWrite(ident, schema0, info.queryId())
      }
    }
}

private[sources] case class GraftCatalogScan(ident: Identifier, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftCatalogScan($ident)"

  // The committed rows ship inside the partition (driver-side store —
  // the catalog's analogue of a small metastore-backed table); a
  // file-backed catalog would plan real splits here instead.
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftCatalogPartition(GraftCatalog.rowsOf(ident)))
  override def createReaderFactory(): PartitionReaderFactory =
    GraftCatalogReaderFactory()
}

private[sources] case class GraftCatalogPartition(rows: Array[UnsafeRow])
    extends InputPartition

private[sources] case class GraftCatalogReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[GraftCatalogPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

private[sources] class GraftCatalogBatchWrite(
    ident: Identifier, target: StructType,
    truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftProjectingWriterFactory(target)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case m: GraftSinkTaskRows => m }
      .sortBy(_.partitionId)
      .flatMap(_.rows)
    GraftCatalog.install(ident, all, truncateFirst)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming write path (`writeStream.toTable("graft.ns.t")`): each
  * epoch's task buffers ship as commit messages and the driver-side
  * `commit(epochId, …)` appends them atomically — AT MOST ONCE per
  * epoch, keyed on the engine-supplied epoch id, so a replayed batch
  * after failure or checkpoint restart is a no-op. This is the native
  * exactly-once sink the foreachBatch + batch-id-DELETE recipe
  * hand-rolls.
  */
private[sources] class GraftCatalogStreamingWrite(
    ident: Identifier, target: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    GraftCatalogStreamingWriterFactory(target)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case m: GraftSinkTaskRows => m }
      .sortBy(_.partitionId)
      .flatMap(_.rows)
    GraftCatalog.installEpoch(ident, queryId, epochId, all)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class GraftCatalogStreamingWriterFactory(target: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    GraftProjectingWriterFactory(target).createWriter(partitionId, taskId)
}

/** Projects incoming rows onto the TABLE schema before buffering.
  * Row-level rewrites (UPDATE / MERGE / rewrite-DELETE) deliver rows
  * with a leading `__row_operation` metadata column — and deliver them
  * RAW even though the LogicalWriteInfo schema claims the plain table
  * schema — so the projection is derived from the ACTUAL record width
  * at runtime: the last `target.length` fields are the data columns.
  * Storing positionally would shift every field and read back garbage.
  */
private[sources] case class GraftProjectingWriterFactory(target: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      private var proj: UnsafeProjection = _
      private var projFields = -1
      private val buf = ArrayBuffer.empty[UnsafeRow]
      override def write(record: InternalRow): Unit = {
        if (record.numFields != projFields) {
          val offset = record.numFields - target.length
          require(offset >= 0,
            s"row has ${record.numFields} fields, table needs ${target.length}")
          val exprs = target.zipWithIndex.map { case (f, i) =>
            BoundReference(offset + i, f.dataType, f.nullable)
          }
          proj = UnsafeProjection.create(exprs)
          projFields = record.numFields
        }
        buf += proj(record).copy()
      }
      override def commit(): WriterCommitMessage = GraftSinkTaskRows(partitionId, buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
