package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built
  * entirely from higher-order functions (`zip_with` + `aggregate`) so the
  * whole computation stays inside Catalyst codegen — no UDF
  * serialization, no codegen fence (SURVEY.md §2b L3/X1 upgrade path).
  *
  * Accumulation is in Double regardless of input element type, matching
  * the DuckDB oracle's DOUBLE[] arithmetic bit-for-bit (same sequential
  * fold order).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic sign-random-projection LSH bucket: `bits` hyperplanes
    * drawn from a fixed-seed PRNG (never `Math.random` — SURVEY §7 risk 2),
    * bit i set iff `v · plane_i > 0`. Neighbors in angle agree on most
    * bits, so equal buckets are candidate pairs. At 100 TB this is the
    * shuffle key that replaces the O(n²) cross join.
    */
  def lshBucket(v: Column, bits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(bits)(Seq.fill(64)(rnd.nextGaussian()))
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc.bitwiseOR(
        when(dot(v, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L)))
    }
  }
}
