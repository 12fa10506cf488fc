package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.sources.SegmentBloom

/** ScalaCheck laws for the per-segment column Bloom filter. The one
  * that keeps pruning EXACT is zero false negatives: a value added to
  * the builder must always probe present — a single false negative
  * would silently drop rows from a point-lookup. The fp bound is a
  * quality property (with generous slack over the design ≈0.8%), and
  * the int→long canonicalization law is what keeps pruning sound
  * across an ALTER COLUMN widening.
  */
object SegmentBloomProps extends Properties("SegmentBloom") {

  private val longs = Gen.listOfN(500, Gen.choose(Long.MinValue, Long.MaxValue))
  private val strs = Gen.listOfN(300, Gen.alphaNumStr.suchThat(_.nonEmpty))

  private def build(vs: Seq[Any]): Option[Array[Long]] = {
    val b = new SegmentBloom.Builder
    vs.foreach(b.add)
    b.result()
  }

  property("no false negatives (longs)") = Prop.forAll(longs) { vs =>
    val boxed = vs.map(java.lang.Long.valueOf)
    build(boxed).forall { bits =>
      boxed.forall(v => SegmentBloom.hashOf(v).forall(SegmentBloom.contains(bits, _)))
    }
  }

  property("no false negatives (strings)") = Prop.forAll(strs) { vs =>
    build(vs).forall { bits =>
      vs.forall(v => SegmentBloom.hashOf(v).forall(SegmentBloom.contains(bits, _)))
    }
  }

  property("false-positive rate stays within slack of design") = Prop.forAll(
    Gen.choose(0L, Long.MaxValue / 2)) { seed =>
    val present = (0 until 2000).map(i => java.lang.Long.valueOf(seed + i * 2L))
    build(present).forall { bits =>
      // Probe 2000 values guaranteed absent (odd offsets).
      val fp = (0 until 2000).count { i =>
        val v = java.lang.Long.valueOf(seed + i * 2L + 1L)
        SegmentBloom.hashOf(v).exists(SegmentBloom.contains(bits, _))
      }
      fp <= 120 // design fp ~0.8% of 2000 = 16; 6% absolute ceiling
    }
  }

  property("integral widening canonicalizes (int hits a long-written bloom)") = Prop.forAll(
    Gen.listOfN(200, Gen.choose(Int.MinValue, Int.MaxValue))) { ints =>
    val asLongs = ints.map(i => java.lang.Long.valueOf(i.toLong))
    build(asLongs).forall { bits =>
      ints.forall(i => SegmentBloom.hashOf(java.lang.Integer.valueOf(i))
        .forall(SegmentBloom.contains(bits, _)))
    }
  }

  property("empty and overflowed builders yield no bloom (never 'provably absent')") = {
    val empty = new SegmentBloom.Builder
    val over = new SegmentBloom.Builder
    (0 to SegmentBloom.MaxDistinct).foreach(i => over.add(java.lang.Long.valueOf(i.toLong)))
    val untracked = new SegmentBloom.Builder
    untracked.add(java.lang.Double.valueOf(1.5))
    Prop(empty.result().isEmpty && over.result().isEmpty && untracked.result().isEmpty)
  }
}
