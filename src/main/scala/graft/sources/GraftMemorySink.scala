package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (`graft-sink`) — the batch-write half of the
  * engine's source extension surface (GraftRangeSource is the read
  * half): per-task `DataWriter`s buffer row COPIES, task `commit()`
  * ships them as `WriterCommitMessage`s, and nothing becomes visible
  * until the driver-side job `commit()` installs all tasks' rows
  * atomically — the two-phase contract that gives a V2 sink exactly-once
  * semantics on the batch path (a failed/speculated task's buffered
  * rows are `abort()`ed, never merged).
  *
  * The committed store is an in-JVM named table keyed by the `name`
  * option — a test/demo sink (the parquet/ORC writers are the
  * production file sinks); what is under test is the COMMIT PROTOCOL,
  * which is identical at any scale.
  *
  *   df.write.format("graft-sink").option("name", "t").mode("append").save()
  *   GraftMemorySink.rows("t")   // visible only after job commit
  */
class GraftMemorySink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sink"

  // The sink accepts whatever schema the query writes (there is nothing
  // to infer from).
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val name = Option(properties.get("name")).getOrElse(
      throw new IllegalArgumentException("graft-sink requires a 'name' option"))
    new GraftMemorySinkTable(name, schema)
  }
}

object GraftMemorySink {
  private val store = new ConcurrentHashMap[String, (StructType, Array[UnsafeRow])]()

  /** Committed rows of a named sink table (empty until a job commits). */
  def rows(name: String): Seq[UnsafeRow] =
    Option(store.get(name)).map(_._2.toSeq).getOrElse(Seq.empty)

  def schemaOf(name: String): Option[StructType] =
    Option(store.get(name)).map(_._1)

  def clear(name: String): Unit = store.remove(name)

  /** Replace the table's committed rows (truncate/overwrite path). */
  private[sources] def install(
      name: String, schema: StructType, rows: Array[UnsafeRow]): Unit =
    store.put(name, (schema, rows))

  /** Append-mode commit: merge atomically with any previously committed
    * job's rows — a second `.mode("append").save()` to the same name
    * must ADD to the table, not silently replace it.
    */
  private[sources] def installAppend(
      name: String, schema: StructType, rows: Array[UnsafeRow]): Unit =
    store.merge(name, (schema, rows), (prev, next) => {
      // A second job appending a DIFFERENT layout would mix row widths
      // under the first job's schema — every later read then
      // misinterprets the appended bytes. Refuse instead.
      require(prev._1.map(_.dataType) == next._1.map(_.dataType),
        s"graft_sink($name): append schema ${next._1.simpleString} does not match " +
          s"the committed schema ${prev._1.simpleString}")
      (prev._1, prev._2 ++ next._2)
    })
}

private[sources] class GraftMemorySinkTable(name: String, schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_sink($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // Spark signals overwrite by calling truncate(); a plain append
      // never does, and the commit must merge, not replace.
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftMemorySinkBatchWrite(name, info.schema(), truncateFirst)
      }
    }
}

private[sources] class GraftMemorySinkBatchWrite(
    name: String, schema: StructType, truncateFirst: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftMemorySinkWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // Atomic install: all tasks' rows become visible together, sorted
    // by (partition, task-local order) for a deterministic view.
    val all = messages.collect { case m: GraftSinkTaskRows => m }
      .sortBy(_.partitionId)
      .flatMap(_.rows)
    if (truncateFirst) GraftMemorySink.install(name, schema, all)
    else GraftMemorySink.installAppend(name, schema, all)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** One task's buffered output; UnsafeRow is Externalizable, so the rows
  * ship to the driver inside the commit message.
  */
private[sources] case class GraftSinkTaskRows(
    partitionId: Int, rows: Array[UnsafeRow]) extends WriterCommitMessage

private[sources] case class GraftMemorySinkWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[UnsafeRow]
      // The V2 write path does not guarantee UnsafeRow (codegen off can
      // surface Generic/JoinedRow) — project anything else instead of
      // dying on a cast.
      private lazy val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
      override def write(record: InternalRow): Unit =
        // The engine reuses the incoming row buffer; copy before retaining.
        buf += (record match {
          case u: UnsafeRow => u.copy()
          case other => toUnsafe(other).copy()
        })
      override def commit(): WriterCommitMessage =
        GraftSinkTaskRows(partitionId, buf.toArray)
      override def abort(): Unit = buf.clear() // discarded, never visible
      override def close(): Unit = ()
    }
}
