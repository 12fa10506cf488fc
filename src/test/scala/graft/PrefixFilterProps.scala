package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the L9 prefix-filter lemma (the AllPairs/PPJoin
  * candidate rule `SimilarityQueries.l9ProbeIndex` rides, Bayardo et
  * al. WWW'07): under ANY total token order shared by both sides,
  * jac(A,B) ≥ t implies the first |A|−⌈t|A|⌉+1 tokens of A intersect
  * the first |B|−⌈t|B|⌉+1 tokens of B. The engine's exactness claim is
  * precisely this — candidates = prefix∩prefix is a SUPERSET of every
  * qualifying pair — so the adversarial law here generates random
  * token sets (mutation chains, so near-dup pairs actually occur), a
  * random (df, g) ranking with heavy TIES (df values drawn from a tiny
  * range) and DRIFT (df assignments that disagree with true corpus
  * frequencies, the incremental-append state where probes rank under a
  * stale persisted order), plus random thresholds — and asserts no
  * qualifying pair ever escapes the candidate set. The companion law
  * pins the engine's integer-exact prefix length `sz − (sz·4+4) div 5
  * + 1` to the mathematical `|A| − ⌈0.8·|A|⌉ + 1` so the SQL shape in
  * `ensureL9Index`/`l9ProbeIndex` cannot silently diverge from the
  * lemma's precondition.
  */
object PrefixFilterProps extends Properties("PrefixFilter") {

  // The verdict's bar for this law: ≥ 500 generated cases per property.
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(500)

  /** Prefix of `doc` under the (df, g) total order at threshold
    * num/den — the exact rule both the index build and the probe use:
    * keep the first |doc| − ⌈t·|doc|⌉ + 1 tokens, rarest first,
    * absent-from-df tokens ranking at df 0 (the probe's rule for
    * tokens the stored order has never seen).
    */
  private def prefix(
      doc: Set[Long], df: Map[Long, Long], num: Int, den: Int): Set[Long] = {
    val sz = doc.size
    val k = sz - (sz * num + den - 1) / den + 1 // sz − ⌈num·sz/den⌉ + 1
    doc.toSeq.sortBy(g => (df.getOrElse(g, 0L), g)).take(k).toSet
  }

  private def jaccard(a: Set[Long], b: Set[Long]): Double = {
    val i = (a & b).size
    if (a.isEmpty && b.isEmpty) 1.0 else i.toDouble / (a.size + b.size - i)
  }

  /** Mutation-chain corpus: a base set plus documents derived by
    * swapping a few tokens — the generator that makes jac ≥ t pairs
    * common instead of measure-zero.
    */
  private val corpusGen: Gen[(Vector[Set[Long]], Map[Long, Long], Int, Int)] = for {
    baseSize <- Gen.choose(3, 15)
    base <- Gen.listOfN(baseSize, Gen.choose(0L, 24L)).map(_.toSet)
      .suchThat(_.size >= 3)
    nDocs <- Gen.choose(2, 12)
    docs <- Gen.listOfN(nDocs, for {
      drops <- Gen.choose(0, 2)
      adds <- Gen.choose(0, 2)
      dropSet <- Gen.pick(math.min(drops, base.size - 1), base.toSeq)
      addSet <- Gen.listOfN(adds, Gen.choose(25L, 40L))
    } yield base -- dropSet ++ addSet)
    // df with heavy ties AND drift: values in 0..3 assigned at random,
    // some tokens absent entirely (rank at 0 like never-seen tokens).
    dfEntries <- Gen.mapOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 3L)))
    // Random threshold t = num/den in [1/2, 1): the lemma must hold
    // for every t, not just the engine's 4/5.
    den <- Gen.choose(2, 9)
    num <- Gen.choose((den + 1) / 2, den - 1)
  } yield ((base +: docs).toVector, dfEntries, num, den)

  property("candidate superset: jac ≥ t pairs always share a prefix token") =
    Prop.forAll(corpusGen) { case (docs, df, num, den) =>
      val t = num.toDouble / den
      val prefixes = docs.map(d => prefix(d, df, num, den))
      val qualifying = for {
        i <- docs.indices; j <- docs.indices
        if i < j && jaccard(docs(i), docs(j)) >= t
      } yield (i, j)
      qualifying.forall { case (i, j) =>
        (prefixes(i) & prefixes(j)).nonEmpty
      }
    }

  property("engine's integer prefix length equals |A| − ⌈0.8|A|⌉ + 1") =
    Prop.forAll(Gen.choose(1, 100000)) { sz =>
      // The SQL shape: rn <= sz - (sz * 4 + 4) div 5 + 1.
      val engineKeep = sz - (sz * 4 + 4) / 5 + 1
      val mathKeep = sz - math.ceil(0.8 * sz).toInt + 1
      engineKeep == mathKeep
    }

  property("prefix ranking is stable under df ties (tie-break by g is total)") =
    Prop.forAll(corpusGen) { case (docs, df, num, den) =>
      // Re-ranking twice (or after shuffling the input order) must
      // yield the same prefix — the (df, g) order is total, so batch
      // and index builds can never disagree on a doc's prefix.
      docs.forall { d =>
        val p1 = prefix(d, df, num, den)
        val shuffled = scala.util.Random.shuffle(d.toSeq).toSet
        p1 == prefix(shuffled, df, num, den)
      }
    }
}
