package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector-similarity expressions for the embedding operators
  * (`graft.operators.Similarity`).
  *
  * The `functions._` formulation (`aggregate(zip_with(a, b, _*_), ...)`)
  * is correct but allocates an intermediate zipped array per evaluation and
  * walks the vectors once per reduction — cosine needs three of them (dot,
  * ‖a‖, ‖b‖), i.e. three array allocations and five passes per scored
  * PAIR. On the brute-force top-k path that multiplies by |queries|·|docs|
  * evaluations, which is exactly the hot loop ANN exists to shrink. These
  * expressions fuse each scoring into one allocation-free pass over the two
  * arrays with `doGenCode` keeping them inside whole-stage codegen.
  *
  * Null semantics (shared by both, chosen to match what the composed form
  * feeds downstream consumers after their rank/sign filters):
  *  - null input array → null (standard null-intolerant expression);
  *  - length mismatch or null element → null (the composed `zip_with` pads
  *    with nulls, which nulls the reduction);
  *  - zero-norm vector (cosine only) → null (the composed form's explicit
  *    when-guard; a bare division would THROW under ANSI mode);
  *  - NaN element → null, where the composed form yields NaN. This is the
  *    one deliberate divergence: every consumer filters
  *    `isNotNull && !isnan` before ranking, so the two are
  *    indistinguishable downstream, and folding NaN into the null sentinel
  *    keeps the codegen path allocation-free (no boxed Double).
  *
  * Registered for SQL as `cosine_sim(a, b)` / `dot_product(a, b)` by
  * [[graft.plans.GraftExtensions]].
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Kernel entry point: fully-qualified static method returning double,
    * with NaN as the null sentinel.
    */
  protected def kernelCall: String

  protected def kernel(a: ArrayData, b: ArrayData): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecRes")
      s"""
         |double $r = $kernelCall($a, $b);
         |if (java.lang.Double.isNaN($r)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
}

/** Cosine similarity of two `array<double>` columns in one fused pass. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernelCall: String =
    "graft.functions.VectorKernel.cosine"
  override protected def kernel(a: ArrayData, b: ArrayData): Double =
    VectorKernel.cosine(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two `array<double>` columns in one fused pass. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def kernelCall: String =
    "graft.functions.VectorKernel.dot"
  override protected def kernel(a: ArrayData, b: ArrayData): Double =
    VectorKernel.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Row kernels shared by the interpreted and codegen'd paths. NaN is the
  * null sentinel (see [[VectorBinaryExpression]] for the contract); any
  * genuine NaN arithmetic result collapses into it by construction.
  */
object VectorKernel {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else d / denom
  }
}
