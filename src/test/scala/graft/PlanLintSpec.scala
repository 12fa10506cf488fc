package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide plan lint: the two 100 TB scale-killer patterns —
  * unbounded cartesian products and wide columns (document text /
  * embedding vectors) riding a shuffle — are banned for EVERY batch
  * registry query, not just the ones with a bespoke plan test. Any
  * exception must be whitelisted here with its justification, so a new
  * query (or a plan regression in an old one) that starts shuffling
  * payloads fails CI instead of surfacing in a manual audit.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed a cartesian/nested-loop product: both sides are
    * explicitly bounded slices or broadcast singletons.
    */
  private val cartesianOk = Set(
    "j9_cross_join",        // bounded 5×5 sides by construction
    "l4_embedding_neardup", // bounded exact twin (vec_id < 300); LSH is the scale path
    "l4_ngram_jaccard_pairs" // bounded oracle slice (doc_id < 500)
  )

  /** Queries allowed a wide column (text/embedding) in a KEYED shuffle.
    * Currently EMPTY — nothing in the registry ships document bodies or
    * vectors through a hash/range exchange; keep it that way.
    *
    * A round-robin rebalance taken DIRECTLY off the source stage (no
    * exchange below it) is a separate, permitted shape: it is the guide
    * §2.5 parallelism-recovery move (`Tables.fanOut`) for single-row-
    * group inputs, moves each byte exactly once, and is conditional on
    * the scan under-planning parallelism — at 100 TB the scan has
    * thousands of splits and no exchange is added at all (FanOutSpec
    * pins the conditionality). The scale-killer this lint exists for is
    * payloads riding KEYED exchanges (joins/aggregations over wide
    * rows), which repeat per key-shuffle and survive at any scale.
    */
  private val wideShuffleOk = Set.empty[String]

  private val wideCols = Set("text", "embedding")

  /** A wide column is banned in any exchange EXCEPT a source-adjacent
    * round-robin rebalance (see wideShuffleOk doc). "Source-adjacent"
    * is checked STRUCTURALLY: the exchange's child subtree may contain
    * only scans and row-local operators (filter/project/generate), not
    * merely "no exchange below" — a round-robin repartition of text
    * above a broadcast join or heavy compute is NOT the fanOut shape
    * this whitelists, even though it too has no exchange beneath it.
    */
  private def bannedWideShuffle(s: ShuffleExchangeExec): Boolean = {
    import org.apache.spark.sql.execution._
    def scanRooted(p: SparkPlan): Boolean = p match {
      case _: FileSourceScanExec => true
      case _: datasources.v2.BatchScanExec => true
      case _: columnar.InMemoryTableScanExec => true // persisted scan stage
      case f: FilterExec => scanRooted(f.child)
      case pr: ProjectExec => scanRooted(pr.child)
      case g: GenerateExec => scanRooted(g.child)
      case w: WholeStageCodegenExec => scanRooted(w.child)
      case i: InputAdapter => scanRooted(i.child)
      case c: ColumnarToRowExec => scanRooted(c.child)
      // A union of scan-rooted branches is still row-local (the
      // planted-copy fixtures union the corpus with a projected slice
      // of itself before the fanOut).
      case u: UnionExec => u.children.forall(scanRooted)
      case _ => false
    }
    val rebalanceOffSource =
      s.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] &&
        scanRooted(s.child)
    s.output.exists(a => wideCols(a.name)) && !rebalanceOffSource
  }

  // Streaming queries run through their own harness (StreamingSpec /
  // StreamingOps) and return a memory-sink table whose plan is a local
  // scan — nothing to lint here.
  private def batchQueries: Seq[Q] =
    Seq(
      queries.RelationalQueries.all, queries.FlagshipQueries.all,
      queries.JoinQueries.all,
      queries.AggregateQueries.all, queries.WindowQueries.all,
      queries.SortSetQueries.all, queries.FunctionQueries.all,
      queries.SourceQueries.all, queries.TextQueries.all,
      queries.SimilarityQueries.all, queries.MultimodalQueries.all,
      queries.PipelineQueries.all).flatten

  test("no unbounded cartesian product and no wide-column shuffle in any batch query plan") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val failures = try {
      batchQueries.flatMap { q =>
        val plan = q.fn(spark, dir).queryExecution.executedPlan
        val cart =
          if (cartesianOk(q.name)) Nil
          else plan.collect { case c: CartesianProductExec => c }
            .map(c => s"${q.name}: CartesianProduct\n$c")
        val wide =
          if (wideShuffleOk(q.name)) Nil
          else plan.collect { case s: ShuffleExchangeExec => s }
            .filter(bannedWideShuffle)
            .map(s => s"${q.name}: wide column in shuffle ${s.output.map(_.name).mkString(",")}")
        cart ++ wide
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(failures.isEmpty, failures.mkString("\n\n"))
  }
}
