package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §2b custom-operator preference
  * (c), the one extension point the repo hadn't exercised): top-k rows
  * per group as a FIRST-CLASS physical operator.
  *
  * Why not `row_number().over(window).filter(rn <= k)`: the window
  * operator SORTS every group in full (O(n log n) per partition, all
  * rows buffered/spilled) just to throw away all but k rows. This
  * operator keeps a k-bounded heap per group: O(n log k) time, O(groups
  * × k) memory per task, no sort spill — the difference between "works"
  * and "fast" when groups are large (e.g. top-3 documents per near-dup
  * cluster over 100 TB).
  *
  * Planning: `ClusteredDistribution(groupExprs)` makes EnsureRequirements
  * insert the one hash shuffle on the group key; the strategy is
  * installed per-session via `spark.experimental.extraStrategies` (or
  * cluster-wide through GraftExtensions.injectPlannerStrategy).
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, child) =>
      TopKPerGroupExec(groupExprs, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Per-task heap state shared by the interpreted and codegen paths.
  * Public: instantiated from generated Java via the plan reference.
  */
final class TopKGroupAccumulator(
    groupProj: UnsafeProjection,
    rowOrdering: Ordering[InternalRow],
    k: Int) {

  // Max-heap under the sort order: the head is the WORST retained row,
  // evicted when a better one arrives.
  private val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]

  def insert(row: UnsafeRow): Unit = {
    val key = groupProj(row)
    val heap = heaps.get(key) match {
      case Some(h) => h
      case None =>
        // O(groups × k) heap state is held in task memory with no
        // spill path — the design trade this operator makes vs the
        // window form. Tripwire instead of an opaque task OOM at
        // high group cardinality: fail fast with the remedy.
        if (heaps.size >= TopKPerGroupExec.MaxGroupsPerTask) {
          throw new IllegalStateException(
            s"TopKPerGroupExec: > ${TopKPerGroupExec.MaxGroupsPerTask} distinct groups " +
              "in one task; this operator holds all per-group heaps in memory. " +
              "Use the window-function form (spills) for high-cardinality group keys.")
        }
        val h = mutable.PriorityQueue.empty[UnsafeRow](
          rowOrdering.asInstanceOf[Ordering[UnsafeRow]])
        heaps.put(key.copy(), h)
        h
    }
    if (heap.size < k) {
      heap.enqueue(row.copy())
    } else if (rowOrdering.lt(row, heap.head)) {
      heap.dequeue()
      heap.enqueue(row.copy())
    }
  }

  /** Retained rows, per-group in sort order. Each row is a distinct
    * copied UnsafeRow (no buffer reuse downstream needs to defend
    * against).
    */
  def result(): Iterator[UnsafeRow] =
    heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // Float/double group keys need -0.0/NaN normalization — Spark's
  // NormalizeFloatingNumbers rule only covers its own operators
  // (Aggregate/Join/Window), not this custom node. Without it, 0.0 and
  // -0.0 hash to different shuffle partitions AND different heap keys,
  // splitting one logical group — where the window form this operator
  // replaces would keep one group of k rows. normalize() is identity
  // for types that don't need it.
  private val normGroupExprs: Seq[Expression] =
    groupExprs.map(org.apache.spark.sql.GraftSqlBridge.normalizeFloats)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(normGroupExprs) :: Nil

  def createAccumulator(): TopKGroupAccumulator =
    new TopKGroupAccumulator(
      UnsafeProjection.create(normGroupExprs, child.output),
      RowOrdering.create(order, child.output),
      k)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val acc = createAccumulator()
      iter.foreach(row => acc.insert(row.asInstanceOf[UnsafeRow]))
      acc.result()
    }, preservesPartitioning = true)

  // ---- Whole-stage codegen (the SortExec blocking-operator shape) ----
  //
  // The operator is a pipeline BREAKER, not a codegen fence: the child's
  // fused loop feeds `doConsume` (one virtual call into the heap
  // accumulator per row — the group projection and comparisons stay the
  // interpreted kernels, which are not the hot path the stage fuses),
  // and once the child loop drains, `doProduce`'s emit loop feeds the
  // PARENT's generated code inline. Without this, every operator above
  // and below fell out of WholeStageCodegen into iterator boxing.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // Blocking: everything is consumed before anything is produced, so
  // upstream limit/stop short-circuits must not cut the accumulate loop.
  override def needStopCheck: Boolean = false
  override def limitNotReachedChecks: Seq[String] = Nil
  override def needCopyResult: Boolean = false // result() rows are distinct copies

  private var accVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val thisPlan = ctx.addReferenceObj("topkPlan", this)
    accVariable = ctx.addMutableState(
      classOf[TopKGroupAccumulator].getName, "topkAcc",
      v => s"$v = $thisPlan.createAccumulator();", forceInline = true)
    val needAcc = ctx.addMutableState(
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.JAVA_BOOLEAN,
      "topkNeedAcc", v => s"$v = true;")
    val outIter = ctx.addMutableState(
      "scala.collection.Iterator", "topkOutIter", forceInline = true)
    // freshName, not a fixed name: two TopKPerGroupExec nodes fused into
    // one stage must not emit duplicate method signatures (SortExec does
    // the same for its add-to-sorter function).
    val addToAccName = ctx.freshName("topkAddToAcc")
    val addToAcc = ctx.addNewFunction(addToAccName,
      s"""
         |private void $addToAccName() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin)
    val row = ctx.freshName("topkRow")
    s"""
       |if ($needAcc) {
       |  $addToAcc();
       |  $needAcc = false;
       |  $outIter = $accVariable.result();
       |}
       |while ($outIter.hasNext()) {
       |  UnsafeRow $row = (UnsafeRow) $outIter.next();
       |  ${consume(ctx, null, row)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$accVariable.insert((UnsafeRow) ${row.value});
     """.stripMargin

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** ~4M groups × (k=5) × ~64B rows ≈ 1.3 GB/task — past this the window
    * form's sort-with-spill is the right plan, not a bigger heap.
    */
  val MaxGroupsPerTask: Int = 4 << 20
}

/** User-facing entry point. */
object TopK {

  /** Top `k` rows per group under `orderCols` (use `.desc`/`.asc`
    * columns; bare columns default ascending).
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    def toExpr(c: Column): Expression =
      org.apache.spark.sql.GraftSqlBridge.expression(c)
    val order = orderCols.map(toExpr).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    val plan = TopKPerGroup(groupCols.map(toExpr), order, k, df.queryExecution.analyzed)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
  }
}
