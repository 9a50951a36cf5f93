package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
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
  // null for inputs with no contributing element (empty array), not only
  // for null inputs — see MinHashSigKernel.signatureMod
  override def nullable: Boolean = true

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
    nullSafeCodeGen(ctx, ev, (h, _, _) =>
      s"""${ev.value} = graft.functions.MinHashSigKernel.signature($h, $asRef, $bsRef);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** [[MinHashSig]] generalized to CALLER-SUPPLIED permutation constants
  * and modulus: `minhash_perms(hashes, as, bs, prime)` computes the
  * per-permutation minima of `(asᵢ·h + bsᵢ) mod prime` in one fused
  * pass. Exists for the md5 verification flavors
  * ([[graft.operators.Dedup.BandBloomMd5]]), whose md5-derived constants
  * and `P = 2³¹−1` are fixed by the oracle convention — the kernel only
  * changes HOW Spark computes the identical mins: the former 64-column
  * min AGGREGATE formulation compiled a giant generated update method
  * whose cold first pass ran interpreted bytecode over every shingle row
  * (the 11s-cold / 2s-warm q_neardup_gate gap in BENCH_r08), where this
  * is one constant-size kernel call per row with no aggregate at all.
  * `as`/`bs`/`prime` must be foldable: they resolve once on the driver
  * and ship as codegen references. Callers guarantee
  * `max(as)·max(h) + max(bs) < 2⁶³` (the md5 face: a < 2³¹, h < 2³²).
  */
case class MinHashPerms(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(first.dataType) &&
        isLongArray(second.dataType) && second.foldable &&
        isLongArray(third.dataType) && third.foldable &&
        fourth.dataType == LongType && fourth.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "minhash_perms expects (array<bigint>, LITERAL array<bigint> as, " +
        "LITERAL array<bigint> bs, LITERAL bigint prime), got " +
        Seq(first, second, third, fourth)
          .map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_perms"
  // null for inputs with no contributing element (empty array), not only
  // for null inputs — see MinHashSigKernel.signatureMod
  override def nullable: Boolean = true

  @transient private lazy val params: (Array[Long], Array[Long], Long) = {
    def arr(e: Expression): Array[Long] =
      e.eval().asInstanceOf[ArrayData].toLongArray()
    val (as, bs) = (arr(second), arr(third))
    require(as.length == bs.length,
      s"minhash_perms: |as|=${as.length} != |bs|=${bs.length}")
    (as, bs, fourth.eval().asInstanceOf[Long])
  }

  override protected def nullSafeEval(hashes: Any, as: Any, bs: Any,
      prime: Any): Any =
    MinHashSigKernel.signatureMod(hashes.asInstanceOf[ArrayData],
      params._1, params._2, params._3)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhpAs", params._1, "long[]")
    val bsRef = ctx.addReferenceObj("mhpBs", params._2, "long[]")
    val p = params._3
    nullSafeCodeGen(ctx, ev, (h, _, _, _) =>
      s"""${ev.value} = graft.functions.MinHashSigKernel.signatureMod($h, $asRef, $bsRef, ${p}L);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): MinHashPerms =
    copy(first = f, second = s, third = t, fourth = q)
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
      // math.abs(Long.MinValue) is NEGATIVE — one such draw (seed-
      // deterministic, so a bad seed is bad forever) would give a
      // negative permutation constant and corrupt that permutation's
      // minima corpus-wide. Map it to 0; every other draw is unchanged,
      // so existing seeds keep their exact signatures.
      def next(bound: Long): Long = {
        val x = rnd.nextLong()
        (if (x == Long.MinValue) 0L else math.abs(x)) % bound
      }
      val as = Array.fill(n)(next(Int.MaxValue - 1L) + 1)
      val bs = Array.fill(n)(next(Prime))
      (as, bs)
    })

  def signature(hashes: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData =
    signatureMod(hashes, as, bs, Prime)

  /** [[signature]] under a caller-supplied modulus (the [[MinHashPerms]]
    * entry point). Hashes are masked to 32 bits — both the classic family
    * here and the md5 flavors draw from 32-bit hash spaces, and the mask
    * is what keeps `a·h + b` inside a signed long for any `a < 2³¹`.
    *
    * An input with NO contributing element (empty array, or all-null
    * slots) has no signature: returns null, matching the
    * `when(size(hs) > 0)` guard internal callers wrap around the kernel —
    * a direct SQL caller of `minhash_perms`/`minhash_signature` gets a
    * null instead of an array of Long.MaxValue sentinels that would
    * silently band every empty doc together.
    */
  def signatureMod(hashes: ArrayData, as: Array[Long], bs: Array[Long],
      prime: Long): ArrayData = {
    val numHashes = as.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val m = hashes.numElements()
    var i = 0
    var any = false
    while (i < m) {
      if (!hashes.isNullAt(i)) { // tolerate array<bigint> with null slots
        any = true
        val h = hashes.getLong(i) & 0xffffffffL
        var p = 0
        while (p < numHashes) {
          val v = (as(p) * h + bs(p)) % prime
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}
