package graft

import graft.functions.WeightedMean
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the custom UDAF (SURVEY.md §5b item 3): the
  * buffer merge must be associative + commutative with `zero` as
  * identity, or Spark's partial→final split would give
  * partitioning-dependent results.
  */
object WeightedMeanProps extends Properties("WeightedMean") {

  private val pair = for {
    v <- Gen.choose(-1e6, 1e6)
    w <- Gen.choose(0.0, 1e3)
  } yield (v, w)

  private def reduceAll(xs: List[(Double, Double)]): (Double, Double) =
    xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)

  property("merge is commutative") = Prop.forAll(Gen.listOf(pair), Gen.listOf(pair)) { (a, b) =>
    WeightedMean.merge(reduceAll(a), reduceAll(b)) ==
      WeightedMean.merge(reduceAll(b), reduceAll(a))
  }

  // Double addition is only associative up to ulps; the law that matters
  // for partial→final correctness is associativity within float noise.
  private def close(a: (Double, Double), b: (Double, Double)): Boolean = {
    def ok(x: Double, y: Double) =
      math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    ok(a._1, b._1) && ok(a._2, b._2)
  }

  property("merge is associative (up to float noise)") =
    Prop.forAll(Gen.listOf(pair), Gen.listOf(pair), Gen.listOf(pair)) { (a, b, c) =>
      val (ra, rb, rc) = (reduceAll(a), reduceAll(b), reduceAll(c))
      close(
        WeightedMean.merge(WeightedMean.merge(ra, rb), rc),
        WeightedMean.merge(ra, WeightedMean.merge(rb, rc)))
    }

  property("zero is the merge identity") = Prop.forAll(Gen.listOf(pair)) { a =>
    val r = reduceAll(a)
    WeightedMean.merge(r, WeightedMean.zero) == r &&
      WeightedMean.merge(WeightedMean.zero, r) == r
  }

  property("finish = Σvw / Σw (NaN on empty)") = Prop.forAll(Gen.nonEmptyListOf(pair)) { a =>
    val expected = a.map { case (v, w) => v * w }.sum / a.map(_._2).sum
    val got = WeightedMean.finish(reduceAll(a))
    (expected.isNaN && got.isNaN) || math.abs(got - expected) <= 1e-9 * math.max(1.0, math.abs(expected))
  }
}
