package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for hashed word n-gram shingles — the hot
  * kernel of the MinHash dedup path (`graft.operators.Dedup`).
  *
  * This is the one place the engine drops below the public `functions._`
  * API (SURVEY.md §7.3): a composed higher-order-function expression
  * re-evaluates its outer token array per element under interpreted
  * evaluation (measured 150× slower under `Generate`), and a Scala UDF
  * pays SerDe on every row. A first-class expression with `doGenCode`
  * participates in whole-stage codegen directly: the generated code calls
  * the static [[ShingleHashKernel]] once per row, no boxing, no closure.
  *
  * Registered for SQL use as `shingle_hashes(text, n)` by
  * [[graft.plans.GraftExtensions]].
  */
case class ShingleHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    ShingleHashKernel.hash(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.ShingleHashKernel.hash($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHash =
    copy(left = newLeft, right = newRight)
}

/** Positional sibling of [[ShingleHash]]: ALL rolling n-gram hashes in
  * document order, duplicates kept — the kernel of
  * `TextAnalysis.duplicatedPassages`, where every window POSITION counts
  * (an intra-doc repeat is a duplicated passage; `ShingleHash`'s distinct
  * would erase it and `size(...)` must equal tokens − n + 1). Registered
  * for SQL as `shingle_hashes_all(text, n)`.
  */
case class ShingleHashAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_all expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    ShingleHashKernel.hashAll(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.ShingleHashKernel.hashAll($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashAll =
    copy(left = newLeft, right = newRight)
}

/** Row kernel shared by the expression's interpreted and codegen'd paths:
  * tokenize once, 64-bit-hash each token, combine n-gram hashes, distinct.
  */
object ShingleHashKernel {

  def hash(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(hashToArray(if (text == null) null else text.toString, n))

  def hashAll(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      hashAllToArray(if (text == null) null else text.toString, n))

  def hashToArray(text: String, n: Int): Array[Long] =
    hashAllToArray(text, n).distinct

  /** All positional n-gram hashes, document order, duplicates kept. */
  def hashAllToArray(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty[Long]
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty[Long]
    val th = new Array[Long](toks.length)
    var k = 0
    while (k < toks.length) { th(k) = h64(toks(k)); k += 1 }
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = th(i)
      var j = 1
      while (j < n) { h = h * 0x9E3779B97F4A7C15L + th(i + j); j += 1 }
      h ^= (h >>> 32); h *= 0xD6E8FEB86659FD93L; h ^= (h >>> 32)
      out(i) = h
      i += 1
    }
    out
  }

  private def h64(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }
}
