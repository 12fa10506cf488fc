package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, AttributeSet, EqualTo, Expression, IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.constraints.{
  Constraint, ForeignKey, PrimaryKey, Unique}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftCatalog

/** RELY-STYLE JOIN ELIMINATION from declared informational constraints
  * (the Snowflake/Databricks shape): an INNER equi-join from an
  * FK-bearing child to its PK/UNIQUE parent, where NOTHING above the
  * join references the parent's columns, is removed — each child row
  * with a non-NULL key matches EXACTLY one parent row (FK: a match
  * exists; PK/UNIQUE: at most one), so the join neither filters nor
  * multiplies and only a NULL-key drop remains, reproduced by an
  * `IsNotNull` filter on the FK columns (skipped when the columns are
  * non-nullable). At 100 TB this deletes the scan of a dimension table
  * from every query that joins to it out of habit (views, BI tools)
  * without touching its columns.
  *
  * TRUST GATE: constraints are accepted NOT ENFORCED (x26), so a
  * declared FK may be silently violated — elimination fires ONLY when
  * the user grants trust, either coarsely with TBLPROPERTY
  * `'graft.constraints.rely'='true'` on the CHILD table, or in the
  * standard SQL form with the per-constraint `RELY` flag on BOTH the
  * FK and the parent's PK/UNIQUE. `CALL graft.system
  * .verify_constraints` is the audit tool that makes the claim
  * checkable. Without either grant the rule must never fire.
  *
  * Soundness gates (all must hold, else the plan is untouched):
  *  - the join is INNER and its condition is PURELY a conjunction of
  *    child-column = parent-column equalities;
  *  - the parent side is a bare DataSourceV2Relation (optionally under
  *    an attribute-only Project — the shape column pruning leaves) of
  *    a graft table whose PK or UNIQUE constraint covers a SUBSET of
  *    the matched parent key columns (uniqueness on C ⇒ uniqueness on
  *    any superset);
  *  - the child side's key attributes belong VERBATIM to a graft
  *    relation reachable through Filter/Project/Join nodes (none
  *    fabricate non-NULL values for an existing ExprId — outer-join
  *    NULLs are dropped by the rebuilt IsNotNull exactly as the
  *    original inner join would drop them; a Union in between COULD
  *    emit those ExprIds with the other branch's values and declines);
  *  - that child table declares a FOREIGN KEY exactly pairing the
  *    matched child columns to the matched parent columns of the
  *    parent table, and carries the RELY property;
  *  - nothing above the join references the parent side (matched as
  *    `Project(onlyChildSide, Join)` — the shape the surrounding
  *    column-pruning fixpoint produces whenever parent columns are
  *    genuinely unused).
  *
  * Runs as an operator-optimization rule (fixpoint batch), so the
  * leftover Project/Filter fold into neighbors and the freed parent
  * scan never plans. Ref: SURVEY.md §2b X26 (constraint verification);
  * the optimizer-consumption gap was VERDICT r18 "What's missing" #4.
  */
case class RelyJoinElimination(session: SparkSession) extends Rule[LogicalPlan] {

  private val RelyProp = "graft.constraints.rely"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.relyJoinElimination.enabled", "true") != "true")
      return plan
    plan.transformUp {
      case p @ Project(pl, Join(l, r, Inner, Some(cond), _))
          if pl.forall(_.references.subsetOf(l.outputSet)) =>
        eliminate(pl, keep = l, drop = r, cond).getOrElse(p)
      case p @ Project(pl, Join(l, r, Inner, Some(cond), _))
          if pl.forall(_.references.subsetOf(r.outputSet)) =>
        eliminate(pl, keep = r, drop = l, cond).getOrElse(p)
    }
  }

  /** The eliminated form — `Project(pl, keep [+ IsNotNull(fkCols)])` —
    * or None when any gate fails.
    */
  private def eliminate(
      pl: Seq[NamedExpression], keep: LogicalPlan, drop: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val resolver = session.sessionState.conf.resolver
    // 1. Condition: pure conjunction of keep-attr = drop-attr.
    val pairs: Seq[(Attribute, Attribute)] = conjuncts(cond).map {
      case EqualTo(a: Attribute, b: Attribute)
          if keep.outputSet.contains(a) && drop.outputSet.contains(b) => (a, b)
      case EqualTo(b: Attribute, a: Attribute)
          if keep.outputSet.contains(a) && drop.outputSet.contains(b) => (a, b)
      case _ => return None
    }
    if (pairs.isEmpty) return None
    // 2. Parent: bare (attribute-Project-wrapped) graft relation with
    //    PK/UNIQUE covering a subset of the matched key columns.
    val parentRel = bareParent(drop).getOrElse(return None)
    val parentIdent = parentRel.identifier.getOrElse(return None)
    // A `VERSION/TIMESTAMP AS OF` (or segment-pinned) relation carries
    // the SAME identifier as the live table, but the catalog's
    // constraints describe only the CURRENT state — a historical parent
    // may lack later-added keys, a pinned child may reference
    // since-deleted parents. Declining mirrors MvRewrite's pin gate.
    if (GraftCatalog.isPinnedTable(parentRel.table)) return None
    val parentCols = pairs.map(_._2.name)
    // 3. Child: the key attrs' relation, reachable via Filter/Project
    //    only, declaring the matching FK, with trust granted either by
    //    the child table's RELY property (the coarse opt-in) or by the
    //    standard per-constraint RELY flag on BOTH constraints.
    val childKeys = pairs.map(_._1)
    val childRel = relationOwning(keep, AttributeSet(childKeys)).getOrElse(return None)
    val childIdent = childRel.identifier.getOrElse(return None)
    if (GraftCatalog.isPinnedTable(childRel.table)) return None
    if (childRel.catalog != parentRel.catalog) return None
    val tableRely = try {
      Option(GraftCatalog.tablePropsJava(childIdent).get(RelyProp)).contains("true")
    } catch { case NonFatal(_) => false }
    val uniqueCovered = constraintsOf(parentIdent).exists {
      case pk: PrimaryKey => (tableRely || pk.rely()) &&
        colsSubset(pk.columns.map(_.fieldNames), parentCols, resolver)
      case uq: Unique => (tableRely || uq.rely()) &&
        colsSubset(uq.columns.map(_.fieldNames), parentCols, resolver)
      case _ => false
    }
    if (!uniqueCovered) return None
    val catName = parentRel.catalog.map(_.name())
    val fkMatches = constraintsOf(childIdent).exists {
      case fk: ForeignKey =>
        (tableRely || fk.rely()) &&
          sameIdent(fk.referencedTable(), parentIdent, catName) &&
          fk.columns().length == pairs.length &&
          fk.columns().zip(fk.referencedColumns()).forall { case (c, rc) =>
            c.fieldNames.length == 1 && rc.fieldNames.length == 1 &&
              pairs.exists { case (ck, pk) =>
                resolver(ck.name, c.fieldNames.head) &&
                  resolver(pk.name, rc.fieldNames.head)
              }
          }
      case _ => false
    }
    if (!fkMatches) return None
    // 4. Rebuild: the inner join dropped NULL-key child rows; FK
    //    semantics let NULL keys exist, so reproduce the drop.
    val nullable = childKeys.filter(_.nullable)
    val filtered: LogicalPlan =
      if (nullable.isEmpty) keep
      else Filter(nullable.map(IsNotNull(_): Expression).reduce(And), keep)
    Some(Project(pl, filtered))
  }

  /** The parent relation under at most one attribute-only Project (the
    * column-pruned shape).
    */
  private def bareParent(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation => Some(r)
    case Project(outs, r: DataSourceV2Relation)
        if outs.forall(_.isInstanceOf[Attribute]) => Some(r)
    case _ => None
  }

  /** The graft relation whose output contains every key attribute,
    * reachable through Filter/Project/Join nodes — operators that
    * never fabricate NON-NULL values for an existing ExprId. Joins are
    * admissible on either side (each output attribute's non-NULL
    * values come verbatim from exactly one side; an OUTER join can
    * only fabricate NULLs, which the rebuilt IsNotNull filter drops
    * exactly as the original inner join to the parent would have) —
    * this is what lets a star query shed SEVERAL unused dims and a
    * snowflake chain shed its tail, one fixpoint round each.
    */
  private def relationOwning(
      p: LogicalPlan, keys: AttributeSet): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation if keys.subsetOf(r.outputSet) => Some(r)
    case Filter(_, child) => relationOwning(child, keys)
    case Project(outs, child)
        if keys.subsetOf(AttributeSet(outs.collect { case a: Attribute => a })) =>
      relationOwning(child, keys)
    case Join(l, r, _, _, _) =>
      if (keys.subsetOf(l.outputSet)) relationOwning(l, keys)
      else if (keys.subsetOf(r.outputSet)) relationOwning(r, keys)
      else None
    case _ => None
  }

  private def constraintsOf(ident: org.apache.spark.sql.connector.catalog.Identifier)
      : Seq[Constraint] =
    try GraftCatalog.constraintsOf(ident)
    catch { case NonFatal(_) => Nil }

  /** Every constraint column (single-part only) appears among the
    * matched key columns.
    */
  private def colsSubset(
      constraintCols: Seq[Array[String]], matched: Seq[String],
      resolver: (String, String) => Boolean): Boolean =
    constraintCols.nonEmpty && constraintCols.forall { fn =>
      fn.length == 1 && matched.exists(resolver(_, fn.head))
    }

  /** FK `referencedTable` keeps whatever qualification the DDL used
    * (often catalog-qualified, e.g. `graft.ns.t`); the relation's
    * identifier is catalog-relative — accept either form.
    */
  private def sameIdent(
      a: org.apache.spark.sql.connector.catalog.Identifier,
      b: org.apache.spark.sql.connector.catalog.Identifier,
      catalogName: Option[String]): Boolean =
    a.name() == b.name() && (
      a.namespace().toSeq == b.namespace().toSeq ||
        catalogName.exists(c => a.namespace().toSeq == c +: b.namespace().toSeq))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
}
