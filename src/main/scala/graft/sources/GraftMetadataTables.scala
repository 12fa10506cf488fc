package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES (the Iceberg `db.table.files` / `db.table.history`
  * shape): every catalog table exposes SELECT-able system relations —
  *
  * {{{
  *   SELECT * FROM graft.ns.t.files       -- one row per live segment
  *   SELECT * FROM graft.ns.t.history     -- one row per retained snapshot
  *   SELECT * FROM graft.ns.t.eq_deletes  -- outstanding merge-on-read upsert deletes
  *   SELECT * FROM graft.ns.t.branches    -- open WAP branches
  * }}}
  *
  * Resolution rides the normal multi-part identifier path: the
  * analyzer hands the catalog `namespace = [ns, t], name = files`,
  * which no real table occupies (namespaces are single-level), so
  * `loadTable` falls through here. Rows are computed from the
  * metastore AT SCAN-PLAN TIME (a metadata query, zero segment-file
  * reads) and are therefore always current — the observability surface
  * DESCRIBE/procedures can't give you, because these JOIN: "which
  * segments hold a ghost of key k", "commits per hour", "branch ages"
  * are one SQL query away.
  */
private[sources] object GraftMetadataTables {

  private val FilesSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("live_rows", LongType, nullable = false),
    StructField("dv_deleted", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("sorted", BooleanType, nullable = false),
    StructField("spec", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    // Row lineage (X16): the segment's first assigned row id and its
    // latest update-seq — null for pre-lineage segments.
    StructField("first_row_id", LongType, nullable = true),
    StructField("last_updated_seq", LongType, nullable = true)))

  private val HistorySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("segments", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("data_change", BooleanType, nullable = false),
    StructField("eq_deletes", IntegerType, nullable = false),
    StructField("is_current", BooleanType, nullable = false)))

  private val EqDeletesSchema = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("key_cols", StringType, nullable = false),
    StructField("keys", LongType, nullable = false)))

  private val BranchesSchema = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("base_version", LongType, nullable = false),
    StructField("segments", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  private val PartitionsSchema = StructType(Seq(
    StructField("spec", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField("segments", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("live_rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  private val Kinds: Map[String, StructType] = Map(
    "files" -> FilesSchema, "history" -> HistorySchema,
    "eq_deletes" -> EqDeletesSchema, "branches" -> BranchesSchema,
    "partitions" -> PartitionsSchema)

  /** `loadTable` fallthrough: `namespace = [..ns, table], name = kind`
    * for a kind we serve, over a base table that exists.
    */
  def resolve(ident: Identifier): Option[Table] = {
    if (ident.namespace().length < 2) return None
    // Case-insensitive, matching Spark's default identifier resolution
    // (FROM graft.ns.t.FILES must find `files`).
    val kind = ident.name().toLowerCase(java.util.Locale.ROOT)
    val schema = Kinds.getOrElse(kind, return None)
    val base = Identifier.of(
      ident.namespace().dropRight(1), ident.namespace().last)
    if (!GraftCatalog.entryExists(base)) return None
    Some(new MetaTable(base, kind, schema))
  }

  private def s(v: String): UTF8String = UTF8String.fromString(v)

  private def rowsFor(base: Identifier, kind: String): Array[InternalRow] = kind match {
    case "files" =>
      GraftCatalog.segmentsOf(base).map { seg =>
        new GenericInternalRow(Array[Any](
          s(seg.path), seg.seq, seg.rows, seg.liveRows, seg.deletedRows,
          seg.bytes, seg.sorted, s(seg.spec.mkString(",")),
          s(seg.key.mkString("/")),
          seg.lineage.headOption.map(r => java.lang.Long.valueOf(r._1)).orNull,
          if (seg.lineage.isEmpty) null
          else java.lang.Long.valueOf(seg.lineage.map(_._3).max))): InternalRow
      }.toArray
    case "history" =>
      val snaps = GraftCatalog.retainedSnapshots(base)
      val cur = snaps.lastOption.map(_.version)
      snaps.map { sn =>
        new GenericInternalRow(Array[Any](
          sn.version, sn.wallMs * 1000L, sn.segments.length,
          sn.segments.map(_.liveRows).sum, sn.dataChange,
          sn.eqDeletes.length, cur.contains(sn.version))): InternalRow
      }.toArray
    case "eq_deletes" =>
      GraftCatalog.eqDeletesOf(base).map { eq =>
        new GenericInternalRow(Array[Any](
          eq.seq, s(eq.keyCols.mkString(",")), eq.keys.length.toLong)): InternalRow
      }.toArray
    case "branches" =>
      GraftCatalog.branchesOf(base).map { case (name, baseV, segs, rows) =>
        new GenericInternalRow(Array[Any](
          s(name), baseV, segs, rows)): InternalRow
      }.toArray
    case "partitions" =>
      // Per (spec, key) group — the small-files / skew dashboard: a
      // hot partition shows as one row with a large segment count.
      GraftCatalog.segmentsOf(base).groupBy(seg => (seg.spec, seg.key)).toSeq
        .sortBy { case ((spec, key), _) =>
          spec.mkString(" ") + "\u0000" + key.mkString(" ") }
        .map { case ((spec, key), group) =>
          new GenericInternalRow(Array[Any](
            s(spec.mkString(",")), s(key.mkString("/")), group.length,
            group.map(_.rows).sum, group.map(_.liveRows).sum,
            group.map(_.bytes).sum)): InternalRow
        }.toArray
    case other => throw new IllegalStateException(s"unknown metadata table $other")
  }

  private final class MetaTable(base: Identifier, kind: String, schema0: StructType)
      extends Table with SupportsRead {
    override def name(): String = s"$base.$kind"
    override def schema(): StructType = schema0
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def properties(): JMap[String, String] = java.util.Collections.emptyMap()
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new Scan with Batch {
        override def readSchema(): StructType = schema0
        override def toBatch: Batch = this
        override def description(): String = s"GraftMetadataScan($base.$kind)"
        // Rows resolve at PLAN time — always-current metadata, one
        // driver-computed carrier split, no files opened.
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftCatalogPartition(Vector.empty, 0))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftRowsFactory(rowsFor(base, kind))
      }
  }
}
