package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
    val toks = Tok.Pattern
      .split(text.toLowerCase(java.util.Locale.ROOT))
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
    // FNV-1a accumulation (poly-31 admits short-token collisions — see
    // ShingleHashKernel.h64), then the murmur finalizer for bit balance
    var h = -3750763034362895579L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 1099511628211L; i += 1 }
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^= (h >>> 33)
    h
  }

  // ---- md5 verification-flavor sketch ([[SimHashMd5]]) -----------------

  private val TokenPattern =
    Tok.Pattern

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** The md5-flavor sketch as struct(sk_hi, sk_lo); null when the text is
    * null or has no tokens. Bit-for-bit the column formulation's result:
    * lowercase via UTF8String (the exact `F.lower` path), the shared
    * `[^\p{L}\p{N}]+` tokenizer, per-token md5 with the first digest half
    * split into two big-endian 32-bit words (`hi` = bytes 0-3 = hex chars
    * 1-8, `lo` = bytes 4-7 = hex chars 9-16), vote +1 where the word's
    * bit is set else −1 per occurrence, sketch bit set iff its vote > 0.
    */
  def simhashMd5(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    if (text == null) return null
    val toks = TokenPattern.split(text.toLowerCase.toString, -1)
    val votes = new Array[Long](64)
    val md = md5Local.get()
    var seen = false
    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      if (t.nonEmpty) {
        seen = true
        md.reset()
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((lo >>> b) & 1L) == 1L) 1L else -1L)
          votes(b + 32) += (if (((hi >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      k += 1
    }
    if (!seen) return null
    var skHi = 0L
    var skLo = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) skLo |= (1L << b)
      if (votes(b + 32) > 0) skHi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](skHi, skLo))
  }
}

/** Native md5-flavor SimHash sketch — the VERIFICATION face's math
  * ([[graft.operators.Dedup.simhashMd5]]: per-token md5-prefix halves,
  * tf-weighted sign votes, two 32-bit sketch halves) fused into one
  * kernel pass per row. The former formulation (explode + tf groupBy +
  * 64 separate sum aggregates) computed the identical sketch through two
  * aggregate shuffles and a 64-buffer generated update method — the same
  * cold/warm cliff class as the md5 band-key aggregate; here the whole
  * sketch is one scan-side call, and tf-weighting falls out of summing
  * ±1 per token OCCURRENCE (Σ_distinct tf·sign ≡ Σ_occurrences sign).
  * Returns struct(sk_hi, sk_lo); NULL for docs with no tokens (absent
  * from sketches, matching the explodeNonEmpty drop — never banding
  * candidates). The DuckDB oracle is unchanged: it replays the md5
  * votes from the token strings and must keep matching bit-for-bit
  * (pinned by the composed==kernel equivalence test and the
  * q_dedup_simhash oracle).
  *
  * Registered for SQL as `simhash_md5(text)` by
  * [[graft.plans.GraftExtensions]].
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StructType
  import org.apache.spark.sql.types.StructField

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("sk_hi", LongType, nullable = false),
    StructField("sk_lo", LongType, nullable = false)))
  override def prettyName: String = "simhash_md5"
  override def nullable: Boolean = true

  override protected def nullSafeEval(text: Any): Any =
    SimHashKernel.simhashMd5(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.SimHashKernel.simhashMd5(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}
