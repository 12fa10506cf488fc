package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, Project, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, StringType, StructType}

/** V2 VIEW support for graft catalogs, wired through
  * `SparkSessionExtensions` — stock Spark 4.1 ships the `ViewCatalog`
  * API but no DDL execution or read resolution for it
  * (`ResolveSessionCatalog` rejects view commands on any non-session
  * catalog), so the engine provides both halves itself, the same way
  * Iceberg's extensions do:
  *
  *  - [[GraftViewParser]] intercepts parsed CREATE [OR REPLACE] VIEW /
  *    DROP VIEW / SHOW VIEWS plans whose (fully qualified) target is a
  *    graft catalog and swaps in runnable commands — BEFORE the
  *    analyzer rule that would reject them.
  *  - [[GraftViewReadRule]] resolves `SELECT … FROM graft.ns.v` by
  *    expanding the stored view text inline (late binding: the query
  *    re-parses and re-resolves against CURRENT base-table state),
  *    re-qualifying the view body's unqualified relations against the
  *    catalog/namespace captured at definition time.
  *
  * Scope: view targets must be fully qualified (`graft.ns.v`); ALTER
  * VIEW property changes go through the `ViewCatalog.alterView` API
  * (exercised in tests) rather than SQL. Cycles fail with an explicit
  * "recursive view" error instead of an analyzer loop.
  */
object GraftViewSupport {
  def isGraftCatalog(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[graft.sources.GraftCatalog].getName)

  def viewCatalog(spark: SparkSession, name: String): ViewCatalog =
    spark.sessionState.catalogManager.catalog(name).asInstanceOf[ViewCatalog]

  def identOf(parts: Seq[String]): Identifier =
    Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)

  /** Expansion stack for cycle detection (analysis is single-threaded
    * per query; ThreadLocal keeps concurrent queries independent).
    */
  private[plans] val expanding: ThreadLocal[List[(String, Identifier)]] =
    ThreadLocal.withInitial(() => Nil)
}

class GraftViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftViewSupport._

  private def graftTarget(child: LogicalPlan): Option[Seq[String]] = child match {
    case UnresolvedIdentifier(parts, _) if parts.length >= 3 &&
        isGraftCatalog(spark, parts.head) => Some(parts)
    case _ => None
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case cv: CreateView =>
        graftTarget(cv.child) match {
          case Some(parts) if cv.originalText.isDefined =>
            GraftCreateViewCommand(parts, cv.userSpecifiedColumns, cv.comment,
              cv.properties, cv.originalText.get, cv.allowExisting, cv.replace)
          case _ => cv
        }
      case dv: DropView =>
        graftTarget(dv.child) match {
          case Some(parts) => GraftDropViewCommand(parts, dv.ifExists)
          case None => dv
        }
      case sv: ShowViews => sv.namespace match {
        case UnresolvedNamespace(parts, _) if parts.length >= 2 &&
            isGraftCatalog(spark, parts.head) =>
          GraftShowViewsCommand(parts, sv.pattern)
        case _ => sv
      }
      case other => other
    }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

case class GraftCreateViewCommand(
    parts: Seq[String],
    userColumns: Seq[(String, Option[String])],
    comment: Option[String],
    properties: Map[String, String],
    originalText: String,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  import GraftViewSupport._

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = viewCatalog(spark, parts.head)
    val ident = identOf(parts)
    if (cat.viewExists(ident)) {
      if (allowExisting) return Nil
      if (!replace)
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    }
    // Analyze the body NOW: definition-time validation + schema capture
    // (the stored schema is advisory; reads re-resolve late-bound).
    val analyzed = spark.sessionState
      .executePlan(spark.sessionState.sqlParser.parsePlan(originalText)).analyzed
    val queryCols = analyzed.schema.fieldNames
    if (userColumns.nonEmpty && userColumns.length != queryCols.length)
      throw new IllegalArgumentException(
        s"view column list has ${userColumns.length} names but the query produces " +
          s"${queryCols.length} columns")
    val aliases =
      if (userColumns.isEmpty) queryCols else userColumns.map(_._1).toArray
    val schema = StructType(analyzed.schema.fields.zip(aliases).map {
      case (f, a) => f.copy(name = a)
    })
    val colComments =
      if (userColumns.isEmpty) queryCols.map(_ => null: String)
      else userColumns.map(_._2.orNull).toArray
    val props = new java.util.HashMap[String, String]()
    properties.foreach { case (k, v) => props.put(k, v) }
    comment.foreach(props.put(ViewCatalog.PROP_COMMENT, _))
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, originalText, cm.currentCatalog.name(),
      cm.currentNamespace, schema, queryCols, aliases, colComments, props)
    if (replace) cat.dropView(ident)
    cat.createView(info)
    Nil
  }
}

case class GraftDropViewCommand(parts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  import GraftViewSupport._
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = viewCatalog(spark, parts.head).dropView(identOf(parts))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(identOf(parts))
    Nil
  }
}

case class GraftShowViewsCommand(parts: Seq[String], pattern: Option[String])
    extends LeafRunnableCommand {
  import GraftViewSupport._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = parts.drop(1)
    viewCatalog(spark, parts.head).listViews(ns: _*).toSeq
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name()), p).nonEmpty))
      .map(id => Row(ns.mkString("."), id.name(), false))
  }
}

/** Late-binding read resolution: expands a graft-catalog view reference
  * into its re-parsed body (unqualified base relations re-qualified
  * against the definition context), aliased to the stored column names.
  */
case class GraftViewReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewSupport._

  private def isGraftView(parts: Seq[String]): Boolean =
    parts.length >= 3 && isGraftCatalog(spark, parts.head) &&
      viewCatalog(spark, parts.head).viewExists(identOf(parts))

  /** Expand one view reference into its re-parsed, re-qualified body —
    * RECURSIVELY: nested graft-view references expand within this same
    * invocation, while the cycle-detection stack is still live. (A
    * one-level-per-fixed-point-iteration expansion would pop the stack
    * before the nested reference resolves, so a cycle A→B→A would never
    * trip the guard — it would just grind the analyzer to its
    * max-iterations abort.)
    */
  private def expand(parts: Seq[String]): LogicalPlan = {
    val ident = identOf(parts)
    val key = (parts.head, ident)
    if (expanding.get().contains(key))
      throw new IllegalStateException(
        s"recursive view reference: ${parts.mkString(".")} (expansion chain " +
          s"${(key :: expanding.get()).reverse.map(_._2).mkString(" -> ")})")
    expanding.set(key :: expanding.get())
    try {
      val v = viewCatalog(spark, parts.head).loadView(ident)
      val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
      val qualified = parsed.transformUp {
        case r @ UnresolvedRelation(ps, opts, streaming) if ps.length <= 2 &&
            !spark.sessionState.catalog.isTempView(ps) =>
          val full =
            if (ps.length == 1) v.currentCatalog +: v.currentNamespace.toSeq :+ ps.head
            else v.currentCatalog +: ps
          UnresolvedRelation(full, opts, streaming)
      }
      val nested = qualified.transformUp {
        case UnresolvedRelation(ps, _, false) if isGraftView(ps) => expand(ps)
      }
      val aliased =
        if (v.columnAliases.sameElements(v.queryColumnNames)) nested
        else Project(
          v.queryColumnNames.zip(v.columnAliases).toSeq.map { case (q, a) =>
            Alias(UnresolvedAttribute.quoted(q), a)()
          }, nested)
      SubqueryAlias(parts, aliased)
    } finally expanding.set(expanding.get().tail)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedRelation(parts, _, false) if isGraftView(parts) => expand(parts)
  }
}
