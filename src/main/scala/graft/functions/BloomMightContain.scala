package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen Bloom-filter membership probe over a string column
  * (SURVEY.md §2b L8/X1 upgrade path: UDF → codegen Expression — the
  * same progression as [[CosineSim]]/[[MinHash32]]/[[SimHash64]]).
  *
  * Why not a Scala UDF over the broadcast sketch (the pre-r16 shape):
  * a UDF is a codegen FENCE — Spark materializes an InternalRow, boxes
  * the argument to a java.lang.String, and calls through the UDF
  * wrapper per row, splitting the train-side filter stage out of
  * whole-stage codegen. (Spark's own BloomFilterMightContain expression
  * behind runtime-filter injection isn't registrable for public use —
  * the reason the UDF existed.) This expression stays INSIDE the fused
  * loop: the generated code calls [[mightContain]] on a plan-shipped
  * reference — one virtual call per row, no boxing: the UTF8String's
  * UTF-8 bytes feed `mightContainBinary` directly, which is exactly
  * what `mightContainString` hashes (it converts String → UTF-8 bytes),
  * so probe semantics are bit-identical to the UDF it replaces.
  *
  * The filter rides the expression as its `writeTo` byte image (stable
  * Java serialization is not part of BloomFilter's contract; the
  * sketch's own wire format is) and is decoded lazily once per
  * executor-side deserialization.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** The per-row probe the generated code calls (also the eval path). */
  def mightContain(s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // Reference the EXPRESSION (a small case class holding the byte
      // image), not the decoded BloomFilter: the codegen references
      // array is java-serialized into the task binary, and the sketch
      // impl's Java-serializability is not a documented contract.
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContain].getName)
      s"${ev.value} = $ref.mightContain($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Idempotently register `bloom_might_contain(col, filter_bytes)`
    * (filter bytes must be a binary literal).
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_might_contain",
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"bloom_might_contain expects 2 arguments (column, filter bytes), got ${args.length}")
          val bytes = args(1) match {
            case Literal(b: Array[Byte], BinaryType) => b
            case other => throw new IllegalArgumentException(
              s"filter bytes must be a binary literal, got $other")
          }
          BloomMightContain(args(0), bytes)
        },
        "built-in")

  /** Column-level handle: probe `col` against the serialized filter. */
  def apply(spark: SparkSession, col: Column, filter: BloomFilter): Column = {
    register(spark)
    val baos = new java.io.ByteArrayOutputStream()
    filter.writeTo(baos)
    call_function("bloom_might_contain", col, lit(baos.toByteArray))
  }
}
