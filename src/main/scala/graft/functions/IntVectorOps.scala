package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two `array<bigint>` columns in one fused,
  * allocation-free pass — the discrete sibling of
  * [[DotProduct]] for the fixed-point flavors
  * (`Similarity.semDedupFixed`), whose pair stage evaluates one dot per
  * cluster-confined candidate pair. The composed formulation
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) allocates a zipped array
  * and runs interpreted per pair — measured ~3× slower end-to-end on the
  * q_semdedup_fixed bench entry; this expression stays inside whole-stage
  * codegen.
  *
  * Null semantics (matching what the composed form feeds its consumers):
  * null array → null; length mismatch or null element → null.
  *
  * Overflow semantics: `Math.multiplyExact`/`addExact`, so an
  * out-of-domain input THROWS exactly like the composed form does under
  * ANSI mode (both are JIT intrinsics — no measurable cost). In-domain
  * inputs (quantized unit-scale vectors at shift ≤ 20: elements ≤ ~2²¹,
  * 64-dim dots ≤ ~2⁴⁸) never approach the boundary, which also makes the
  * internal `Long.MinValue` invalid-sentinel unreachable as a true
  * result.
  *
  * Registered for SQL as `int_dot(a, b)` by
  * [[graft.plans.GraftExtensions]].
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = IntVectorKernel.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == IntVectorKernel.Invalid) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("intDotRes")
      s"""
         |long $r = graft.functions.IntVectorKernel.dot($a, $b);
         |if ($r == ${IntVectorKernel.Invalid}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

/** Row kernel shared by the interpreted and codegen'd paths.
  * `Invalid` (= Long.MinValue) is the null sentinel — unreachable as a
  * genuine result for in-domain inputs (see [[IntDot]]); out-of-domain
  * arithmetic throws before it could be produced.
  */
object IntVectorKernel {
  val Invalid: Long = Long.MinValue

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) return Invalid
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Invalid
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }
}
