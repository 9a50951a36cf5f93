package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native MinHash-signature expression: one fused pass over the shingle
  * hash array computing all `numHashes` permutation minima.
  *
  * The `functions._` formulation (64 × `array_min(transform(...))`)
  * allocates 64 intermediate arrays PER ROW and traverses the input 64
  * times; this kernel traverses once with 64 running minima in a local
  * array — no garbage, cache-friendly, and `doGenCode` keeps it inside
  * whole-stage codegen. Registered for SQL as
  * `minhash_signature(hashes, numHashes, seed)` by
  * [[graft.plans.GraftExtensions]].
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okFirst = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okSecond = second.dataType == IntegerType
    val okThird = third.dataType == IntegerType || third.dataType == LongType
    if (okFirst && okSecond && okThird) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "minhash_signature expects (array<bigint>, int, int|bigint), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(hashes: Any, n: Any, seed: Any): Any = {
    val seedL = seed match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l.longValue
      case other => other.asInstanceOf[Long]
    }
    MinHashSigKernel.signature(hashes.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], seedL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, n, s) =>
      s"graft.functions.MinHashSigKernel.signature($h, $n, $s)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinHashSigKernel {
  /** 2^61−1-free prime just above 2^32 — the hash domain is masked to 32
    * bits so `a·h + b` never overflows a signed long (ANSI-safe). Matches
    * `Dedup.Prime`.
    */
  val Prime = 4294967311L

  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Deterministic permutation parameters, cached per (numHashes, seed). */
  def perms(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent((numHashes, seed), { case (n, sd) =>
      val rnd = new java.util.Random(sd)
      def next(bound: Long): Long = math.abs(rnd.nextLong()) % bound
      val as = Array.fill(n)(next(Int.MaxValue - 1L) + 1)
      val bs = Array.fill(n)(next(Prime))
      (as, bs)
    })

  def signature(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = perms(numHashes, seed)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i) & 0xffffffffL
      var p = 0
      while (p < numHashes) {
        val v = (as(p) * h + bs(p)) % Prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
