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
    */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.toDF("i", "j")
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
    labels
  }
}
