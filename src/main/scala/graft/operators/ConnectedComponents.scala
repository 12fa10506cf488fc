package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list via
  * iterative label propagation (SURVEY.md §2b L2: "connected components
  * via iterative joins" — the step that turns near-dup PAIRS into dedup
  * CLUSTERS so one representative per cluster survives).
  *
  * Algorithm: every vertex starts labeled with itself; each round a
  * vertex adopts the minimum label among itself and its neighbors;
  * converged when no label changes. Rounds = graph diameter (dedup
  * clusters are near-cliques, so 2–3 rounds in practice).
  *
  * Scale notes (100 TB):
  *  - per round: one shuffle join (edges ⋈ labels on dst) + one
  *    aggregate — the same plan GraphX/GraphFrames CC lowers to;
  *  - labels are persisted per round and the previous round unpersisted,
  *    so lineage doesn't grow with iterations;
  *  - `maxIter` bounds the driver loop; the loop condition is a count
  *    of CHANGED labels (an aggregate, not a data collect).
  */
object ConnectedComponents {

  /** edges: two numeric columns (i, j). Returns (v, component) where
    * component = min vertex id reachable from v.
    *
    * ADAPTIVE strategy, decided from one BOUNDED probe: a
    * `limit(threshold + 1).collect()` executes the edge pipeline once
    * and caps driver exposure at threshold+1 rows (two longs each —
    * ~1.6 MB at the default threshold, the same bounded-driver-collect
    * license as the ANN probe ids). When the whole edge list fits the
    * probe, the graph union-finds ON THE DRIVER and the result returns
    * as a LocalRelation — zero further jobs, zero shuffles, vs the
    * previous small path's persist + count job + one-task repartition +
    * localCheckpoint (three extra driver-latency jobs and a cache
    * round-trip to move a few thousand edges). Near-dup edge sets are
    * typically tiny relative to the corpus, so this is the steady
    * state. Above the threshold the iterative label-propagation path
    * scales to graphs no single process can hold (the probe's partial
    * pass is the price of finding out — bounded by the threshold, and
    * amortized against the rounds such a graph pays anyway). Both
    * paths compute the same min-label fixpoint (equivalence
    * property-tested in OperatorSpec).
    */
  def run(
      edges: DataFrame, maxIter: Int = 20,
      smallGraphThreshold: Long = 100000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Both paths cast endpoints to long up front, so the OUTPUT schema
    // is (v: bigint, component: bigint) regardless of which path the
    // edge count selects — a consumer must not see its types flip when
    // data crosses the threshold.
    val symIn = edges.toDF("i", "j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
    val cap = math.min(smallGraphThreshold, (Int.MaxValue - 1).toLong).toInt
    val probe = symIn.limit(cap + 1).as[(Long, Long)].collect()
    if (probe.length <= cap) {
      // Driver union-find (path halving + union by min label).
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) {
          parent.put(r, parent.get(parent.get(r))) // path halving
          r = parent.get(r)
        }
        r
      }
      def add(x: Long): Unit = if (!parent.containsKey(x)) parent.put(x, x)
      probe.foreach { case (i, j) =>
        add(i); add(j)
        val (ri, rj) = (find(i), find(j))
        // union by MIN label: the root IS the component id
        if (ri < rj) parent.put(rj, ri) else if (rj < ri) parent.put(ri, rj)
      }
      val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.keySet().forEach(v => res += ((v, find(v))))
      res.toSeq.toDF("v", "component")
    } else {
      val sym = symIn.persist()
      // runIterative MATERIALIZES its result (per-round checkpoints)
      // before this unpersist — a lazy result here would silently
      // recompute the whole upstream edge pipeline at the caller's
      // first action.
      val out = runIterative(sym, maxIter)
      sym.unpersist()
      out
    }
  }

  private def runIterative(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges
    // Symmetrized adjacency WITH self-loops: v's next label is then
    // min(component over dst ∈ neighbors(v) ∪ {v}) — ONE join + ONE
    // aggregate per round, instead of the neighbor-min join PLUS a
    // second left join back onto labels to mix in v's own label (the
    // self-loop carries it through the same aggregate). Halving the
    // joins halves the per-round shuffles at scale.
    // explode, not a 4-way union: each union branch would re-evaluate
    // the (potentially expensive) upstream edge pipeline once per
    // branch before the persist materializes — explode emits all four
    // directed rows from ONE pass over it.
    val adj = sym.select(explode(array(
        struct(col("i").as("src"), col("j").as("dst")),
        struct(col("j").as("src"), col("i").as("dst")),
        struct(col("i").as("src"), col("i").as("dst")),
        struct(col("j").as("src"), col("j").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .distinct()
      .persist()
    // localCheckpoint (not persist) between rounds: it truncates the
    // logical plan, so lineage doesn't grow with iterations and the
    // cache manager can't alias a round's plan with an earlier round's
    // structurally-identical one. (In cluster production: checkpoint to
    // reliable storage instead.)
    var labels = adj.select(col("src").as("v"), col("src").as("component"))
      .distinct()
      .localCheckpoint()
    // Convergence signal without a per-round "changed" pass: labels only
    // ever DECREASE, so the fixpoint is reached exactly when
    // sum(component) stops falling — one scalar aggregate over the
    // freshly checkpointed labels (reads the materialized blocks, no
    // recompute), replacing the old filter(chg).count() job AND the
    // extra chg column threaded through the checkpoint.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val next = adj.join(labels, adj("dst") === labels("v"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("component"))
        .select(col("src").as("v"), col("component"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      it += 1
    }
    adj.unpersist()
    // Wrong labels are worse than no labels: an un-converged exit
    // would report one true component as many false ones (a dedup
    // caller then KEEPS duplicates) — fail loudly instead.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — the graph's " +
          "diameter exceeds maxIter; raise it (rounds needed ≈ diameter)")
    labels
  }
}
