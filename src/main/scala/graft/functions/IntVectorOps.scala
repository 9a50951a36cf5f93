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
  * ANSI mode (both are JIT intrinsics — no measurable cost). The kernel
  * signals invalid input (length mismatch, null element) through a boxed
  * null rather than a long sentinel: a sentinel value would shadow its
  * own legitimate dot result (e.g. `[2^31]·[-2^32]` = Long.MinValue
  * exactly, representable without overflow) and break kernel==composed
  * parity on that input. One boxed Long per evaluation — noise next to
  * the array allocation the composed form pays.
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

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntVectorKernel.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("intDotRes")
      s"""
         |java.lang.Long $r = graft.functions.IntVectorKernel.dot($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

/** Row kernel shared by the interpreted and codegen'd paths. Boxed null
  * signals invalid input (length mismatch, null element) — every long is
  * a legitimate dot result, so no in-band sentinel exists (see
  * [[IntDot]]).
  */
object IntVectorKernel {

  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
