package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, If}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, MergeIntoTable, MergeRows, Project, ReplaceData, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Refuses explicit assignments to `GENERATED ALWAYS AS IDENTITY`
  * columns in UPDATE and MERGE UPDATE actions (the warehouse rule:
  * ALWAYS identity values are engine-minted, never user-written).
  * Without this guard an UPDATE rewrites the id as ordinary data —
  * and since only GENERATED values advance the allocation watermark,
  * a user-written id can silently collide with a future generated one.
  *
  * Two sighting points, because the row-level rewrite rules sit
  * EARLIER in the same fixed-point resolution batch and may consume
  * the statement in the very iteration it becomes resolved (observed:
  * MERGE rewrites before any extended rule ever sees MergeIntoTable):
  *
  *  1. The pre-rewrite statement (UpdateTable / MergeIntoTable), when
  *     resolution takes enough iterations for extended rules to get a
  *     look — gives the cleanest error, fires on whatever shape the
  *     rewrite rules would produce.
  *  2. The rewritten ReplaceData, structurally:
  *     - UPDATE: every column is projected as If(cond, assigned,
  *       original) — untouched columns self-assign (both branches the
  *       same attribute), so branch inequality IS the explicit write.
  *     - MERGE: MergeRows instruction outputs are positional over its
  *       output row; the identity slot must be either the TARGET
  *       relation's own attribute (carried row) or a foldable NULL
  *       (insert-action slot the writer will fill by generation).
  *
  * INSERT-side runtime enforcement additionally lives in the writer,
  * which separates carried rows from new rows via _row_id metadata.
  */
case class IdentityUpdateGuard(session: SparkSession) extends Rule[LogicalPlan] {
  private val Locale = java.util.Locale.ROOT

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case u: UpdateTable =>
        check(u.table, u.assignments)
      case m: MergeIntoTable =>
        val assigns =
          (m.matchedActions ++ m.notMatchedBySourceActions).flatMap {
            case u: UpdateAction => u.assignments
            case _ => Nil
          }
        check(m.targetTable, assigns)
      case rd: ReplaceData =>
        checkRewritten(rd)
      case _ => ()
    }
    plan
  }

  /** ALWAYS identity column names of a v2 table, lower-cased. Must be
    * read from the connector Column surface: the relation's StructType
    * carries names but not identity metadata.
    */
  private def alwaysIdentityCols(table: Table): Set[String] =
    table.columns().toSeq
      .filter(c => c.identityColumnSpec() != null &&
        !c.identityColumnSpec().isAllowExplicitInsert)
      .map(_.name.toLowerCase(Locale)).toSet

  private def refuse(name: String): Nothing =
    throw new UnsupportedOperationException(
      s"identity column $name is GENERATED ALWAYS — " +
        "UPDATE cannot assign it (ids are engine-minted; a user-written " +
        "value could collide with a future generated one)")

  private def check(table: LogicalPlan, assignments: Seq[Assignment]): Unit = {
    val always: Set[String] = table.collectFirst {
      case r: DataSourceV2Relation => alwaysIdentityCols(r.table)
    }.getOrElse(Set.empty)
    if (always.isEmpty) return
    assignments.foreach { a =>
      a.key match {
        case k: AttributeReference if always.contains(k.name.toLowerCase(Locale)) =>
          val selfAssign = a.value match {
            case v: AttributeReference => v.exprId == k.exprId
            case _ => false
          }
          if (!selfAssign) refuse(k.name)
        case _ => ()
      }
    }
  }

  private def checkRewritten(rd: ReplaceData): Unit = {
    val (always, targetAttrIds): (Set[String], Map[String, Long]) =
      rd.table match {
        case r: DataSourceV2Relation =>
          (alwaysIdentityCols(r.table),
            r.output.map(a => a.name.toLowerCase(Locale) -> a.exprId.id).toMap)
        case _ => (Set.empty, Map.empty)
      }
    if (always.isEmpty) return

    def strip(e: Expression): Expression = e match {
      case Alias(child, _) => strip(child)
      case other => other
    }

    def foldsToNull(e0: Expression): Boolean = {
      val e = strip(e0)
      e.foldable && e.deterministic && e.eval() == null
    }

    def carriedAttr(e: Expression, col: String): Boolean = strip(e) match {
      case a: AttributeReference => targetAttrIds.get(col).contains(a.exprId.id)
      case _ => false
    }

    rd.query.foreach {
      // MERGE shape: instruction outputs are positional over mr.output.
      case mr: MergeRows =>
        always.foreach { col =>
          val idx = mr.output.indexWhere(_.name.toLowerCase(Locale) == col)
          if (idx >= 0) {
            val instructions = mr.matchedInstructions ++
              mr.notMatchedInstructions ++ mr.notMatchedBySourceInstructions
            instructions.flatMap(_.outputs).foreach { row =>
              if (idx < row.length) {
                val e = row(idx)
                if (!carriedAttr(e, col) && !foldsToNull(e)) refuse(col)
              }
            }
          }
        }
      // UPDATE shape: If(cond, assigned, original) per column —
      // untouched columns self-assign, so branch inequality is the
      // explicit write. No foldsToNull exemption here: every row in an
      // UPDATE is a CARRIED row, so a NULL slot is never a legitimate
      // generation marker (that is a MergeRows insert-action shape
      // only) — letting `SET id = NULL` through would make the writer
      // silently mint a fresh id for an existing row.
      case p: Project =>
        p.projectList.foreach {
          case Alias(If(_, assigned, orig), name)
              if always.contains(name.toLowerCase(Locale)) &&
                carriedAttr(orig, name.toLowerCase(Locale)) =>
            if (!assigned.semanticEquals(orig)) refuse(name)
          case _ => ()
        }
      case _ => ()
    }
  }
}
