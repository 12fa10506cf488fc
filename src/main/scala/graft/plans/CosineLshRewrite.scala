package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{CosineSim, SrpBucket}

/** Opt-in Catalyst rewrite (SURVEY.md §4b "LSH similarity-join rewrite"
  * stretch goal): a cross/unconditioned inner join filtered by
  * `cosine_sim(a, b) >= t` — an O(|L|·|R|) plan — gains an LSH-bucket
  * equi-join condition `srp_bucket(a) = srp_bucket(b)`, turning the
  * cartesian product into a hash-partitioned join on the bucket key.
  *
  * This is APPROXIMATE-BY-DESIGN: only pairs agreeing in all `Bits`
  * projection signs meet, so recall < 1 for t < 1 (for sign-random
  * projections, P(pair survives) = (1 − θ/π)^Bits, θ = angle). That is
  * why the rule is OFF by default and gated behind
  * `spark.graft.cosineLshRewrite.enabled` — it is an approximate-query-
  * processing accelerator for high-threshold near-dup joins at scale,
  * not a semantics-preserving optimization. The original cosine filter
  * is kept, so precision is unaffected.
  *
  * Applies once by construction: the rewrite injects a cross-side
  * srp_bucket equality, and [[hasCrossSideEquiKey]] skips any join
  * that already has one — that guard IS the idempotence mechanism in
  * the fixpoint optimizer batch, so weakening it re-opens unbounded
  * re-application.
  */
object CosineLshRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.cosineLshRewrite.enabled"
  val Bits = 8
  val Seed = 7001L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      // By the time user-provided rules run, PushPredicateThroughJoin has
      // already folded the Filter into the join condition — so match the
      // conditioned join that still has NO cross-side equi predicate.
      case j @ Join(left, right, jt, Some(cond), hint)
          if (jt == Inner || jt == Cross) && !hasCrossSideEquiKey(j) =>
        val cosPair = splitConjunctivePredicates(cond)
          .flatMap(thresholdCosine)
          .collectFirst {
            case (a, b)
                if a.references.subsetOf(left.outputSet) &&
                  b.references.subsetOf(right.outputSet) =>
              (a, b)
            case (a, b)
                if a.references.subsetOf(right.outputSet) &&
                  b.references.subsetOf(left.outputSet) =>
              (b, a)
          }
        cosPair match {
          case Some((a, b)) =>
            val bucketEq = EqualTo(SrpBucket(a, Bits, Seed), SrpBucket(b, Bits, Seed))
            Join(left, right, Inner,
              Some(org.apache.spark.sql.catalyst.expressions.And(cond, bucketEq)), hint)
          case None => j
        }
    }
  }

  /** `cosine_sim(a, b) {>,>=} t` in any spelling a user (or the SQL
    * parser) produces — strict or non-strict, literal on either side.
    * SQL literals like `0.95` parse as decimals, but by the time user
    * rules run, type coercion + constant folding have collapsed the
    * cast to a plain double Literal, so one literal pattern suffices
    * for both the DSL and `spark.sql` entry paths.
    */
  private def thresholdCosine(p: Expression): Option[(Expression, Expression)] = p match {
    case GreaterThanOrEqual(CosineSim(a, b), Literal(t: Double, DoubleType)) if t > 0.0 =>
      Some((a, b))
    case GreaterThan(CosineSim(a, b), Literal(t: Double, DoubleType)) if t >= 0.0 =>
      Some((a, b))
    case LessThanOrEqual(Literal(t: Double, DoubleType), CosineSim(a, b)) if t > 0.0 =>
      Some((a, b))
    case LessThan(Literal(t: Double, DoubleType), CosineSim(a, b)) if t >= 0.0 =>
      Some((a, b))
    case _ => None
  }

  /** True if the join condition already has an equi predicate with one
    * side from each input — then the join is hash-partitionable as-is
    * (and, post-rewrite, this guard makes the rule idempotent).
    */
  private def hasCrossSideEquiKey(j: Join): Boolean =
    j.condition.toSeq.flatMap(splitConjunctivePredicates).exists {
      case EqualTo(x, y) =>
        // Both operands must actually REFERENCE their side: a literal's
        // empty reference set is a subset of anything, and col = 5 is
        // not a hash-partitionable cross-side key.
        x.references.nonEmpty && y.references.nonEmpty &&
          ((x.references.subsetOf(j.left.outputSet) && y.references.subsetOf(j.right.outputSet)) ||
            (x.references.subsetOf(j.right.outputSet) && y.references.subsetOf(j.left.outputSet)))
      case _ => false
    }
}
