package graft.sources

import org.apache.spark.sql.catalyst.expressions.{
  ArrayTransform, CreateNamedStruct, Expression, GetStructField, If, IsNull,
  LambdaFunction, Literal, NamedLambdaVariable, TransformValues}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Recursive nested-schema path machinery for ALTER TABLE at arbitrary
  * depth: `meta.a.b`, `items.element.discount`, `m.value.tag`, ….
  *
  * A path is the TableChange `fieldNames()` TAIL (the part inside the
  * top-level column): plain names descend into struct fields, and the
  * reserved names `element` / `value` descend into an array's element
  * and a map's value — the same addressing Spark's own analyzer and
  * the Iceberg spec use. Map KEYS are never a mutation target (key
  * identity is the map's semantics; even a metadata-only rename there
  * is refused for uniformity), so every traversal through `key`
  * refuses. A struct FIELD literally named "element"/"value"/"key" is
  * unambiguous — the parent's type decides which meaning applies.
  *
  * Two sides, kept in lockstep by construction:
  *  - TYPE rewriting (`retypeAt`/`restructAt`) for the evolved schema;
  *  - VALUE rewriting (`rebuildExpr`) producing a Catalyst expression
  *    that converts an old-layout value to the new layout, preserving
  *    NULL at every level: NULL structs stay NULL (the `If(IsNull)`
  *    guard), NULL containers stay NULL (`ArrayTransform` /
  *    `TransformValues` null-propagate), NULL elements stay NULL.
  *    Widenings never come here — a top-level `Cast` already upcasts
  *    structs/arrays/maps element-wise at any depth.
  *
  * The higher-order functions are CodegenFallback — fine for the one
  * place these expressions run: the streamed per-segment migration
  * projection, not any query hot path.
  */
private[sources] object NestedSchema {

  /** Where added fields land within the enclosing struct. */
  sealed trait FieldPos
  case object First extends FieldPos
  final case class After(name: String) extends FieldPos

  /** The struct-set edit applied at the END of a rebuild path. */
  sealed trait StructEdit
  /** Insert `kids` (backfilled NULL in existing rows) at `pos`
    * (None = append at the end).
    */
  final case class AddFields(kids: Seq[StructField], pos: Option[FieldPos] = None)
    extends StructEdit
  /** Remove fields by name (validated present by the caller). */
  final case class DropFields(names: Set[String]) extends StructEdit

  /** One slot list used by BOTH the type and the value rebuild — the
    * two sides splice identically by construction. (field, Some(i)) =
    * carried from source ordinal i; (field, None) = added NULL.
    */
  private def addSlots(
      st: StructType, kids: Seq[StructField], pos: Option[FieldPos],
      full: String): Seq[(StructField, Option[Int])] = {
    val base: Seq[(StructField, Option[Int])] =
      st.fields.toIndexedSeq.zipWithIndex.map { case (f, i) => (f, Some(i)) }
    val added = kids.map(k => (k, None: Option[Int]))
    pos match {
      case None => base ++ added
      case Some(First) => added ++ base
      case Some(After(n)) =>
        val i = base.indexWhere(_._1.name == n)
        if (i < 0) throw new IllegalArgumentException(
          s"AFTER target field $n not found in the struct at $full")
        base.patch(i + 1, added, 0)
    }
  }

  private def editSlots(
      st: StructType, edit: StructEdit, full: String): Seq[(StructField, Option[Int])] =
    edit match {
      case DropFields(names) =>
        st.fields.toIndexedSeq.zipWithIndex
          .filterNot { case (f, _) => names(f.name) }
          .map { case (f, i) => (f, Some(i)) }
      case AddFields(kids, pos) => addSlots(st, kids, pos, full)
    }

  private def badStep(dt: DataType, step: String, full: String): Nothing =
    throw new UnsupportedOperationException(
      s"cannot address '$step' inside ${dt.simpleString} (resolving $full); arrays " +
        "descend via '.element', maps via '.value'")

  private def keyRefused(full: String): Nothing =
    throw new UnsupportedOperationException(
      s"cannot alter inside map KEY at $full — key identity is the map's semantics")

  /** Rewrite the type at the END of `path` via `f` (validating the
    * whole traversal). `full` is the user-facing dotted name for
    * error messages.
    */
  def retypeAt(dt: DataType, path: Seq[String], full: String)(
      f: DataType => DataType): DataType =
    path.headOption match {
      case None => f(dt)
      case Some(step) => dt match {
        case st: StructType =>
          val i = st.fieldNames.indexOf(step)
          if (i < 0) throw new IllegalArgumentException(
            s"no such field $full (missing '$step' in ${st.simpleString})")
          val nf = st.fields(i)
            .copy(dataType = retypeAt(st.fields(i).dataType, path.tail, full)(f))
          StructType(st.fields.updated(i, nf))
        case at: ArrayType if step == "element" =>
          at.copy(elementType = retypeAt(at.elementType, path.tail, full)(f))
        case mt: MapType if step == "value" =>
          mt.copy(valueType = retypeAt(mt.valueType, path.tail, full)(f))
        case _: MapType if step == "key" => keyRefused(full)
        case other => badStep(other, step, full)
      }
    }

  /** Rewrite the STRUCT addressed by `path` via `f`; refuses if the
    * path lands on a non-struct.
    */
  def restructAt(dt: DataType, path: Seq[String], full: String)(
      f: StructType => StructType): DataType =
    retypeAt(dt, path, full) {
      case st: StructType => f(st)
      case other => throw new UnsupportedOperationException(
        s"$full does not address a struct (${other.simpleString})")
    }

  /** Build the expression converting a value `e` of type `dt` to the
    * layout produced by applying `edit` to the struct at `path`.
    * Every level preserves NULL; untouched siblings are carried
    * by position (`GetStructField`), never re-encoded.
    */
  def rebuildExpr(
      e: Expression, dt: DataType, path: Seq[String], edit: StructEdit,
      full: String): Expression =
    path.headOption match {
      case None =>
        val st = dt match {
          case s: StructType => s
          case other => throw new UnsupportedOperationException(
            s"$full does not address a struct (${other.simpleString})")
        }
        // (field, Some(sourceOrdinal)) carried; (field, None) added NULL.
        val slots = editSlots(st, edit, full)
        val newSt = StructType(slots.map(_._1))
        val rebuilt = CreateNamedStruct(slots.flatMap {
          case (f, Some(i)) =>
            Seq(Literal(f.name), GetStructField(e, i, Some(f.name)): Expression)
          case (f, None) =>
            Seq(Literal(f.name), Literal.create(null, f.dataType): Expression)
        })
        If(IsNull(e), Literal.create(null, newSt), rebuilt)
      case Some(step) => dt match {
        case st: StructType =>
          val i = st.fieldNames.indexOf(step)
          if (i < 0) throw new IllegalArgumentException(
            s"no such field $full (missing '$step' in ${st.simpleString})")
          val rebuilt = CreateNamedStruct(
            st.fields.toIndexedSeq.zipWithIndex.flatMap { case (f, j) =>
              val child = GetStructField(e, j, Some(f.name))
              val v: Expression =
                if (j == i) rebuildExpr(child, f.dataType, path.tail, edit, full)
                else child
              Seq(Literal(f.name), v)
            })
          val newType = retypeAt(st, path, full)(t =>
            editType(t, edit, full))
          If(IsNull(e), Literal.create(null, newType), rebuilt)
        case at: ArrayType if step == "element" =>
          val lv = NamedLambdaVariable("el", at.elementType, at.containsNull)
          val body = rebuildExpr(lv, at.elementType, path.tail, edit, full)
          ArrayTransform(e, LambdaFunction(body, Seq(lv)))
        case mt: MapType if step == "value" =>
          val kv = NamedLambdaVariable("mk", mt.keyType, nullable = false)
          val vv = NamedLambdaVariable("mv", mt.valueType, mt.valueContainsNull)
          val body = rebuildExpr(vv, mt.valueType, path.tail, edit, full)
          TransformValues(e, LambdaFunction(body, Seq(kv, vv)))
        case _: MapType if step == "key" => keyRefused(full)
        case other => badStep(other, step, full)
      }
    }

  /** The schema-side twin of `rebuildExpr`'s leaf: apply `edit` to a
    * struct type. Callers validate presence/absence BEFORE building
    * (better messages); this re-checks nothing.
    */
  def editType(dt: DataType, edit: StructEdit, full: String): StructType = {
    val st = dt match {
      case s: StructType => s
      case other => throw new UnsupportedOperationException(
        s"$full does not address a struct (${other.simpleString})")
    }
    StructType(editSlots(st, edit, full).map(_._1))
  }
}
