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
    val adj = sym.select(col("i").as("src"), col("j").as("dst"))
      .union(sym.select(col("j").as("src"), col("i").as("dst")))
      .persist()
    // localCheckpoint (not persist) between rounds: it truncates the
    // logical plan, so lineage doesn't grow with iterations and the
    // cache manager can't alias a round's plan with an earlier round's
    // structurally-identical one. (In cluster production: checkpoint to
    // reliable storage instead.)
    var labels = adj.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = adj.join(labels, adj("dst") === labels("v"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
      val next = labels.join(nbrMin, labels("v") === nbrMin("src"), "left")
        .select(
          col("v"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          coalesce(col("nbr_min") < col("component"), lit(false)).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select("v", "component")
      it += 1
    }
    adj.unpersist()
    labels
  }
}
