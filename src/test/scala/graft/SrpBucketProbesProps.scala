package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{SrpBucket, SrpBucketProbes}

/** Laws for the margin-ranked multi-probe bucket list — the properties
  * the self-join and persisted-index probers rely on:
  *  1. element 0 IS the exact [[SrpBucket]] value for the same
  *     (bits, seed) — a probe set that drifted from the stored bucket
  *     scheme would silently lose its guaranteed-exact candidate;
  *  2. every neighbor differs from the exact bucket in EXACTLY one
  *     bit, all neighbors distinct;
  *  3. the flipped bits are precisely the nprobe smallest hyperplane
  *     |margins| (ties broken consistently) — the multi-probe recall
  *     argument is about WHICH bits flip, not just how many.
  */
object SrpBucketProbesProps extends Properties("SrpBucketProbes") {

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(2, 64).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-3.0, 3.0).map(_.toFloat)).map(_.toArray))

  private val caseGen = for {
    v <- vecGen
    bits <- Gen.choose(1, 24)
    nprobe <- Gen.choose(0, bits)
    seed <- Gen.choose(0L, 1L << 40)
  } yield (v, bits, nprobe, seed)

  // Reference margins: the same plane construction, computed directly.
  private def margins(v: Array[Float], bits: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(SrpBucket.MaxDim)(rnd.nextGaussian()))
    planes.map { p =>
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, SrpBucket.MaxDim)
      while (i < n) { dot += v(i).toDouble * p(i); i += 1 }
      dot
    }
  }

  property("element 0 is the exact bucket; neighbors are distinct 1-bit flips of the lowest margins") =
    Prop.forAll(caseGen) { case (v, bits, nprobe, seed) =>
      val arr = new GenericArrayData(v.map(x => x: Any))
      val probes = SrpBucketProbes(Literal(null), bits, seed, nprobe)
        .probes(arr).toLongArray()
      val exact = SrpBucket(Literal(null), bits, seed)
        .nullSafeEval(arr).asInstanceOf[Long]
      val head = probes(0) == exact
      val flips = probes.drop(1)
      val oneBit = flips.forall(p => java.lang.Long.bitCount(p ^ exact) == 1)
      val distinct = flips.distinct.length == flips.length
      // The flipped bit INDEXES must be the nprobe lowest |margins|
      // under the same (|margin|, index) order the kernel uses.
      val m = margins(v, bits, seed)
      val expectIdx = (0 until bits).sortBy(b => (math.abs(m(b)), b)).take(nprobe).toSet
      val gotIdx = flips.map(p => java.lang.Long.numberOfTrailingZeros(p ^ exact)).toSet
      val rightBits = gotIdx == expectIdx
      head && oneBit && distinct && rightBits
    }
}
