package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash expression: Charikar's sign-random-projection sketch of
  * the token stream, fused into a single codegen'd pass per row (tokenize →
  * 64-bit-hash each token → sign-accumulate 64 counters → sketch).
  *
  * Replaces the former Scala-UDF formulation in `graft.operators.Dedup`
  * (round-3 advice): the UDF paid SerDe for a `Seq[String]` token array per
  * row and built its 64-bit token hash from two correlated 32-bit murmur
  * halves, one of them over `t.reverse` — an extra O(len) string allocation
  * per token. This kernel hashes each token once (polynomial hash + a
  * murmur3-style finalizer for bit diffusion) and never materializes the
  * token array as Spark data.
  *
  * Registered for SQL as `simhash64(text)` by
  * [[graft.plans.GraftExtensions]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(text: Any): Any =
    SimHashKernel.simhash(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SimHashKernel.simhash($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Row kernel shared by the interpreted and codegen'd paths. Tokenizer
  * matches [[ShingleHashKernel]] (lower-case, split on non-letter/digit
  * runs); duplicate tokens keep their weight (term frequency), as in the
  * classic web-dedup formulation.
  */
object SimHashKernel {

  def simhash(text: UTF8String): Long =
    simhashString(if (text == null) null else text.toString)

  def simhashString(text: String): Long = {
    if (text == null) return 0L
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+")
    val acc = new Array[Int](64)
    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      if (t.nonEmpty) {
        val h = hash64(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      k += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Single-pass 64-bit token hash: polynomial accumulate + murmur3
    * fmix64 finalizer (a bare polynomial hash has weakly-mixed high bits,
    * which SimHash reads individually).
    */
  private def hash64(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^= (h >>> 33)
    h
  }
}
