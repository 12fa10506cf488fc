package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, ExprId, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftCatalog, GraftMvOps}

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the aggregate-navigator
  * move (Calcite/BigQuery/Snowflake shape): a query that aggregates a
  * catalog table with exactly the GROUP BY columns and aggregate
  * expressions of one of its materialized views, while that MV is
  * FRESH (its recorded source version == the source's current
  * version), is rewritten to read the MV table instead — turning a
  * full-table aggregation into a scan of the (usually tiny)
  * pre-aggregated result. At 100 TB this is the difference between
  * re-reading the fact table for every dashboard query and answering
  * from a rollup the ingest pipeline already maintains incrementally.
  *
  * Two match shapes:
  *  - EXACT: query grouping set == MV grouping set → plain MV scan;
  *  - ROLLUP: query grouping ⊂ MV grouping (including the global
  *    aggregate) AND every aggregate is rollup-derivable
  *    (sum→sum-of-sums, count→sum-of-counts, min→min, max→max; never
  *    DISTINCT/FILTER or non-distributive aggs) → re-aggregate the
  *    MV's rows at the coarser grain.
  *
  * Soundness gates (all must hold, else the plan is untouched):
  *  - the aggregate's child is the source relation, either bare or
  *    under ONE WHERE that references MV GROUP columns exclusively —
  *    such a filter commutes with the pre-aggregation (the MV's rows
  *    partition exactly by the group columns) and is remapped onto the
  *    MV scan, where it rides zone-map pruning; any filter touching a
  *    non-group column kills the match;
  *  - every grouping expression is a plain column that is exactly the
  *    MV's GROUP BY set;
  *  - every aggregate output matches one of the MV's stored aggregate
  *    expressions STRUCTURALLY (the MV's spec is parsed, its columns
  *    bound against the same source relation, and both sides compared
  *    by name-normalized canonical SQL — `count(*)` ≡ `count(1)`,
  *    qualifiers and case are immaterial, `sum(a)` ≢ `sum(b)`);
  *  - output types agree exactly;
  *  - the MV is fresh AT ANALYSIS TIME (same consistency contract as
  *    any compiled plan: a write racing query planning wins or loses
  *    at the version lookup, exactly as it would at scan pinning).
  *
  * The rewrite preserves the original output `ExprId`s through
  * aliases, so parent operators (sorts, filters above the aggregate,
  * joins) are oblivious. Runs as a resolution rule: the substituted
  * relation then flows through the NORMAL optimizer — column pruning
  * and filter pushdown apply to the MV scan like any other table.
  * Enabled by default (it is exact, unlike the LSH rewrite); disable
  * with `spark.graft.mvRewrite.enabled=false`.
  */
case class MvRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.mvRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    // Whole-PLAN resolution gate, not per-Aggregate: constructs the
    // analyzer finishes by REWRITING the aggregate (HAVING pushes its
    // condition's aggregates into the Aggregate's output; ORDER BY
    // aggregate aliases likewise) would find their Aggregate gone if
    // we fired mid-fixed-point. Once the plan is fully resolved the
    // resolution batch still iterates, so the rewrite always gets its
    // turn — just last.
    if (!plan.resolved) return plan
    // Metastore pre-gate: no MVs anywhere → no per-plan traversal. An
    // analyzer rule runs on EVERY fixed-point iteration of EVERY query
    // (iterative operators analyze hundreds of plans); the common
    // MV-free session must pay nothing beyond this map probe.
    if (!GraftCatalog.anyMvDefined) return plan
    plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        rewrite(agg).getOrElse(agg)
    }
  }

  /** The aggregate's child, as (optional WHERE condition, relation).
    * One Filter directly below the aggregate is admissible — whether
    * it commutes with the MV substitution is decided later, once the
    * candidate's group columns are known. Pass-through projections
    * (bare attributes, no aliasing — what a `SELECT *` VIEW expansion
    * inserts) are transparent: they neither rename nor compute, so the
    * aggregate's expressions still reference the relation's columns by
    * their original names.
    */
  private def stripChild(
      p: LogicalPlan): Option[(Option[Expression], DataSourceV2Relation)] =
    p match {
      case s: SubqueryAlias => stripChild(s.child)
      case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        stripChild(pr.child)
      case f: Filter =>
        stripChild(f.child).flatMap {
          // At most ONE filter on the path (two conjoin fine, but keep
          // the shape simple and predictable).
          case (None, r) => Some((Some(f.condition), r))
          case _ => None
        }
      case r: DataSourceV2Relation => Some((None, r))
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (filterCond, relation) = stripChild(agg.child) match {
      case Some((c, r))
          if r.catalog.exists(_.isInstanceOf[GraftCatalog]) && r.identifier.isDefined =>
        (c, r)
      case _ => return None
    }
    val srcIdent = relation.identifier.get
    if (srcIdent.namespace().length != 1) return None
    val resolver = conf.resolver

    // Grouping must be plain source columns.
    val groupAttrs: Seq[Attribute] = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }

    val candidates =
      GraftCatalog.freshMvsFor(srcIdent.namespace()(0), srcIdent.name())
    if (candidates.isEmpty) return None

    candidates.view.flatMap { case (mvIdent, props) =>
      tryCandidate(agg, relation, groupAttrs, filterCond, mvIdent, props, resolver)
    }.headOption
  }

  private def tryCandidate(
      agg: Aggregate, relation: DataSourceV2Relation, groupAttrs: Seq[Attribute],
      filterCond: Option[Expression],
      mvIdent: Identifier, props: Map[String, String],
      resolver: (String, String) => Boolean): Option[LogicalPlan] = {
    val mvGroupCols = props(GraftMvOps.GroupProp).split(',').toSeq
    if (groupAttrs.map(_.name.toLowerCase).distinct.length != groupAttrs.length) return None
    // A WHERE below the aggregate commutes with the MV substitution
    // only when it references MV GROUP columns exclusively (the MV's
    // rows partition exactly by those, so slicing them before or after
    // pre-aggregation is the same set of input rows), is deterministic,
    // and carries no subquery.
    val condAdmissible = filterCond.forall { c =>
      c.deterministic &&
        c.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])
          .isEmpty &&
        c.references.forall(a => mvGroupCols.exists(resolver(_, a.name)))
    }
    if (!condAdmissible) return None
    // Grouping relationship: EXACT (same set → scan the MV as-is) or
    // ROLLUP (query groups ⊂ MV groups, incl. the global aggregate →
    // re-aggregate the MV's — far fewer — rows).
    val exact = groupAttrs.length == mvGroupCols.length &&
      mvGroupCols.forall(c => groupAttrs.exists(a => resolver(a.name, c)))
    val rollup = !exact &&
      groupAttrs.forall(a => mvGroupCols.exists(c => resolver(c, a.name)))
    if (!exact && !rollup) return None

    // Bind each MV aggregate spec against the SAME source relation and
    // key it by normalized canonical SQL. Any unresolvable spec kills
    // the candidate (never rewrite on a guess).
    val specs: Seq[(String, String)] = GraftMvOps.splitTop(props(GraftMvOps.AggsProp)).map { item =>
      resolveSpec(item, relation) match {
        case Some(al: Alias) => norm(al.child) -> al.name
        case _ => return None
      }
    }
    val specByKey = specs.toMap
    if (specByKey.size != specs.length) return None // ambiguous duplicate aggs

    // Load the MV relation up front; both paths bind to its output.
    val catalog = relation.catalog.get.asInstanceOf[TableCatalog]
    val mvTable =
      try catalog.loadTable(mvIdent)
      catch { case NonFatal(_) => return None }
    val mvRelation = DataSourceV2Relation.create(mvTable, relation.catalog, Some(mvIdent))
    def mvAttr(col: String): Option[Attribute] =
      mvRelation.output.find(a => resolver(a.name, col))
    def groupColFor(a: Attribute): Option[String] = mvGroupCols.find(resolver(_, a.name))

    // The (possibly filtered) MV input: base group-column references in
    // the WHERE are remapped onto the MV's own columns, so the slice
    // rides the MV scan's zone-map pruning.
    var condMapped = true
    val mvChild: LogicalPlan = filterCond match {
      case None => mvRelation
      case Some(c) =>
        val mapped = c.transformUp {
          case a: AttributeReference =>
            mvGroupCols.find(resolver(_, a.name)).flatMap(mvAttr) match {
              case Some(m) => m
              case None => condMapped = false; a
            }
        }
        Filter(mapped, mvRelation)
    }
    if (!condMapped) return None

    if (exact) {
      // Map every aggregate output onto an MV column; types must agree.
      val outputs = agg.aggregateExpressions.map {
        case a: Attribute if groupColFor(a).isDefined =>
          val m = mvAttr(groupColFor(a).get).getOrElse(return None)
          if (m.dataType != a.dataType) return None
          Alias(m, a.name)(exprId = a.exprId)
        case al @ Alias(child: Attribute, _) if groupColFor(child).isDefined =>
          val m = mvAttr(groupColFor(child).get).getOrElse(return None)
          if (m.dataType != al.dataType) return None
          Alias(m, al.name)(exprId = al.exprId)
        case al: Alias =>
          val m = specByKey.get(norm(al.child)).flatMap(mvAttr).getOrElse(return None)
          if (m.dataType != al.dataType) return None
          Alias(m, al.name)(exprId = al.exprId)
        case _ => return None
      }
      Some(Project(outputs, mvChild))
    } else {
      // ROLLUP: re-aggregate the MV. Derivable shapes only — sum→sum,
      // count→sum (a count of counts is wrong; a sum of counts is the
      // count), min→min, max→max. DISTINCT/FILTER aggregates and
      // anything non-distributive (avg, stddev, count(distinct)) are
      // NOT derivable from a coarser rollup and kill the candidate.
      val outputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: Attribute if groupColFor(a).isDefined =>
          val m = mvAttr(groupColFor(a).get).getOrElse(return None)
          if (m.dataType != a.dataType) return None
          Alias(m, a.name)(exprId = a.exprId)
        case al @ Alias(child: Attribute, _) if groupColFor(child).isDefined =>
          val m = mvAttr(groupColFor(child).get).getOrElse(return None)
          if (m.dataType != al.dataType) return None
          Alias(m, al.name)(exprId = al.exprId)
        case al @ Alias(ae: AggregateExpression, _)
            if !ae.isDistinct && ae.filter.isEmpty =>
          val src = specByKey.get(norm(ae)).flatMap(mvAttr).getOrElse(return None)
          val reagg = ae.aggregateFunction match {
            case _: Sum | _: Count => Sum(src).toAggregateExpression()
            case _: Min => Min(src).toAggregateExpression()
            case _: Max => Max(src).toAggregateExpression()
            case _ => return None
          }
          // Re-summing widens decimal precision; cast restores the
          // original type EXACTLY (always a widening, never lossy).
          val shaped =
            if (reagg.dataType == al.dataType) reagg else Cast(reagg, al.dataType)
          Alias(shaped, al.name)(exprId = al.exprId)
        case _ => return None
      }
      val newGroups: Seq[Expression] =
        groupAttrs.map(a => groupColFor(a).flatMap(mvAttr).getOrElse(return None))
      Some(Aggregate(newGroups, outputs, mvChild))
    }
  }

  /** Minimal spec binder: column references resolve against the source
    * relation's output, functions through the session registry
    * (aggregates wrapped exactly as the analyzer would), `count(*)` →
    * `count(1)`, timezone-needing casts stamped with the session zone.
    * Anything it cannot bind returns None — the rewrite then simply
    * does not fire.
    */
  private def resolveSpec(spec: String, relation: DataSourceV2Relation): Option[Expression] = {
    val parsed =
      try session.sessionState.sqlParser.parseExpression(spec)
      catch { case NonFatal(_) => return None }
    val resolver = conf.resolver
    var failed = false
    val bound = parsed.transformUp {
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        relation.output.find(a => resolver(a.name, u.nameParts.head)).getOrElse {
          failed = true; u
        }
      case u: UnresolvedFunction if u.nameParts.length == 1 =>
        val args = u.arguments.map {
          case _: UnresolvedStar => Literal(1)
          case other => other
        }
        try {
          session.sessionState.functionRegistry
            .lookupFunction(FunctionIdentifier(u.nameParts.head), args) match {
            case af: AggregateFunction => af.toAggregateExpression(u.isDistinct)
            case other => other
          }
        } catch { case NonFatal(_) => failed = true; u }
      case c: Cast if c.needsTimeZone && c.timeZoneId.isEmpty =>
        c.withTimeZone(conf.sessionLocalTimeZone)
    }
    if (failed || !bound.resolved) None else Some(bound)
  }

  /** Name-normalized structural key: attribute identity by lowercase
    * NAME (not ExprId — the two sides bind independently), qualifiers
    * stripped, then canonical SQL text. Exact-match comparison — no
    * algebraic equivalences beyond what `.sql` normalizes.
    */
  private def norm(e: Expression): String =
    e.transformUp {
      case a: AttributeReference =>
        AttributeReference(a.name.toLowerCase, a.dataType, nullable = true)(
          exprId = ExprId(0), qualifier = Nil)
    }.sql.toLowerCase
}
