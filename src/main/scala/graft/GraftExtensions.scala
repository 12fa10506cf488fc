package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, MinHash32, SimHash64, SrpBucket}

/** Production registration path for graft's native expressions
  * (SURVEY.md §2b custom-operator preference (c)): deploy with
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * and `cosine_sim` is available in SQL on every session of the
  * cluster. Driver-contract queries instead register per-session via
  * `CosineSim.register` because they receive an already-built session;
  * both paths install the same expression builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSim].getCanonicalName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors", ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("srp_bucket"),
      new ExpressionInfo(
        classOf[SrpBucket].getCanonicalName, null, "srp_bucket",
        "srp_bucket(v, bits, seed) - sign-random-projection LSH bucket", ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        val bits = children(1) match { case Literal(v: Int, _) => v }
        val seed = children(2) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
        }
        SrpBucket(children(0), bits, seed)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(
        classOf[SimHash64].getCanonicalName, null, "simhash64",
        "simhash64(hashes) - 64-bit SimHash signature over shingle hashes", ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash32"),
      new ExpressionInfo(
        classOf[MinHash32].getCanonicalName, null, "minhash32",
        "minhash32(hashes) - 32-permutation MinHash signature over shingle hashes", ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHash32(children(0))))
    // Opt-in approximate LSH rewrite for cosine-threshold product joins —
    // inert until spark.graft.cosineLshRewrite.enabled=true.
    ext.injectOptimizerRule(_ => graft.plans.CosineLshRewrite)
    // Planner strategy for the TopKPerGroup custom logical operator.
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // V2 views on graft catalogs: DDL interception at the parser (stock
    // Spark rejects view commands on non-session catalogs before any
    // injected rule could run) + late-binding read resolution.
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftViewParser(session, delegate))
    ext.injectResolutionRule(session => graft.plans.GraftViewReadRule(session))
    // Transparent materialized-view rewrite: EXACT (freshness-gated),
    // so on by default — spark.graft.mvRewrite.enabled=false disables.
    ext.injectResolutionRule(session => graft.plans.MvRewriteRule(session))
    // GENERATED ALWAYS AS IDENTITY: UPDATE/MERGE-UPDATE assignments to
    // the column are refused at analysis (ids are engine-minted).
    ext.injectResolutionRule(session => graft.plans.IdentityUpdateGuard(session))
    // RELY join elimination: inner FK→PK joins whose parent columns go
    // unreferenced are removed — fires ONLY for tables opted in with
    // TBLPROPERTY 'graft.constraints.rely'='true' (constraints are NOT
    // ENFORCED, so consuming them for planning is the user's call).
    ext.injectOptimizerRule(session => graft.plans.RelyJoinElimination(session))
    // Neutralized DPP filters (DynamicPruningExpression(true)) are
    // removed before BatchScanExec warns about translating them.
    ext.injectColumnar(_ => graft.plans.StripTrueRuntimeFilters)
  }
}
