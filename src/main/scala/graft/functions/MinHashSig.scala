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
  * array — no per-row allocation beyond the output, and `doGenCode` keeps
  * it inside whole-stage codegen. `numHashes` and `seed` must be literals
  * (foldable): the permutation parameter arrays resolve once on the
  * driver and ship as codegen references, never computed per row.
  * Registered for SQL as `minhash_signature(hashes, numHashes, seed)` by
  * [[graft.plans.GraftExtensions]].
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okFirst = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okSecond = second.dataType == IntegerType && second.foldable
    val okThird =
      (third.dataType == IntegerType || third.dataType == LongType) && third.foldable
    if (okFirst && okSecond && okThird) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "minhash_signature expects (array<bigint>, LITERAL int numHashes, " +
        "LITERAL int|bigint seed), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val n = second.eval().asInstanceOf[Int]
    val seed = third.eval() match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l.longValue
    }
    MinHashSigKernel.perms(n, seed)
  }

  override protected def nullSafeEval(hashes: Any, n: Any, seed: Any): Any =
    MinHashSigKernel.signature(hashes.asInstanceOf[ArrayData], params._1, params._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", params._1, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", params._2, "long[]")
    defineCodeGen(ctx, ev, (h, _, _) =>
      s"graft.functions.MinHashSigKernel.signature($h, $asRef, $bsRef)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinHashSigKernel {
  /** Prime modulus just above 2^32 for the universal-hash permutation
    * family. Hashes are masked to 32 bits and `a < 2^31`, so `a·h + b`
    * never overflows a signed long (ANSI-safe). The shingle pipeline
    * (`graft.operators.Dedup`) builds all signatures through this kernel,
    * so the modulus lives in exactly one place.
    */
  val Prime = 4294967311L

  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Deterministic permutation parameters, cached per (numHashes, seed).
    * Bounded: callers resolve literals only (enforced by
    * [[MinHashSig.checkInputDataTypes]]), so the cache holds one entry per
    * distinct configuration, not per row.
    */
  def perms(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent((numHashes, seed), { case (n, sd) =>
      val rnd = new java.util.Random(sd)
      def next(bound: Long): Long = math.abs(rnd.nextLong()) % bound
      val as = Array.fill(n)(next(Int.MaxValue - 1L) + 1)
      val bs = Array.fill(n)(next(Prime))
      (as, bs)
    })

  def signature(hashes: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val numHashes = as.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      if (!hashes.isNullAt(i)) { // tolerate array<bigint> with null slots
        val h = hashes.getLong(i) & 0xffffffffL
        var p = 0
        while (p < numHashes) {
          val v = (as(p) * h + bs(p)) % Prime
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
