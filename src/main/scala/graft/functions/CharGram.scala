package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** CHARACTER-level window kernels for the exact-substring dedup family
  * (`graft.operators.Dedup.exactSubstrDedupChars` — Lee et al. 2021's
  * ExactSubstr at its native granularity). The token-window flavor
  * ([[GramStrings]]/[[ShingleHashAll]]/[[SpliceTokensStats]]) is coupled
  * to the engine tokenizer: duplicates that disagree on token boundaries
  * — unsegmented CJK-ish text (one giant "token" per run), duplicated
  * spans INSIDE long tokens, punctuation-only variation — are invisible
  * to it (the r17 verdict's missing #3). These kernels key every rolling
  * k-CHARACTER window instead: no tokenizer, no lowercasing, the raw
  * text exactly as Lee et al.'s suffix-array byte spans (the unit here is
  * the Unicode CODE POINT rather than the byte — documented difference;
  * code points are what DuckDB's `len`/`substr` count, which is what lets
  * the oracle face replay the operator verbatim).
  *
  * All three expressions are native Catalyst kernels with `doGenCode` for
  * the same reason as [[ShingleHash]]: a HOF formulation re-evaluates the
  * outer array per element under interpreted lambdas, and the rolling
  * hash is O(n) only when the loop owns the char array.
  */
case class CharGramStrings(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram_strings expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_gram_strings"

  override protected def nullSafeEval(text: Any, k: Any): Any =
    CharGramKernel.gramStrings(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.CharGramKernel.gramStrings($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramStrings =
    copy(left = newLeft, right = newRight)
}

/** Rolling-hash sibling of [[CharGramStrings]] — the 100 TB flavor: every
  * k-char window as one 64-bit key (8 bytes cross the exchange, never the
  * window strings), computed in O(n) total by a Rabin-Karp polynomial
  * roll over the code points with an avalanche finalizer per window (the
  * raw polynomial ring leaks structure; the finalizer is the same
  * xor-multiply mix the token shingle kernel uses). Collision contract is
  * the shingle family's: ~2^-64 accidental, equal-results-modulo-hash
  * pinned against the exact flavor in PipelineSpec.
  */
case class CharGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(text: Any, k: Any): Any =
    CharGramKernel.gramHashes(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.CharGramKernel.gramHashes($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramHashes =
    copy(left = newLeft, right = newRight)
}

/** Char-granularity splice: `splice_chars(text, starts, k)` →
  * `struct<text_dedup string, n_chars bigint, n_removed bigint>`. Marks
  * every code point covered by a k-window starting at one of `starts`
  * (0-based, any order, overlaps union), returns the SURVIVING code
  * points concatenated (no joining separator — the cut is a byte-splice,
  * Lee et al.'s own output shape), the full code-point count, and the
  * covered count, all in one pass. Empty `starts` → the text UNCHANGED
  * (the char flavor has no normalization to apply); all covered → empty
  * string; null text → null row. Hand-assembled input via SQL follows
  * [[SpliceTokens]]'s contract: null start elements ignored,
  * out-of-range clamped.
  */
case class SpliceChars(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"splice_chars expects (string, array<int>, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = SpliceChars.schema
  override def prettyName: String = "splice_chars"

  override protected def nullSafeEval(text: Any, starts: Any, k: Any): Any =
    CharGramKernel.spliceChars(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, st, k) =>
      s"graft.functions.CharGramKernel.spliceChars($t, $st, $k)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SpliceChars =
    copy(first = f, second = s, third = t)
}

object SpliceChars {
  val schema: StructType = StructType(Seq(
    StructField("text_dedup", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))
}

/** Row kernels shared by the interpreted and codegen'd paths. All three
  * operate on the code-point array of the RAW text — no lowercase, no
  * tokenizer (see [[CharGramStrings]]).
  */
object CharGramKernel {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Byte offset of each code point (index n = total length) — one linear
    * walk over the UTF-8 bytes, shared by the windowing and splice
    * kernels so neither pays the UTF-16 round trip
    * (toString → codePoints → re-encode) the original formulation did:
    * window CONTENT is identical for valid UTF-8 (same code points ⇒ same
    * bytes), and slicing is a memcpy instead of a per-window encode —
    * measured ~2× on the q_dedup_substring_char gram stages (r18).
    */
  private def cpOffsets(bytes: Array[Byte]): Array[Int] = {
    // first pass: count code points (clamped: a truncated multi-byte tail
    // must not run offsets past the buffer)
    var n = 0
    var b = 0
    while (b < bytes.length) {
      b = math.min(b + UTF8String.numBytesForFirstByte(bytes(b)), bytes.length)
      n += 1
    }
    val offs = new Array[Int](n + 1)
    var i = 0
    b = 0
    while (i < n) {
      offs(i) = b
      b = math.min(b + UTF8String.numBytesForFirstByte(bytes(b)), bytes.length)
      i += 1
    }
    offs(n) = bytes.length
    offs
  }

  /** [[CharGramStrings]] kernel: all k-code-point window strings in
    * document order, duplicates kept; empty below k.
    */
  def gramStrings(text: UTF8String, k: Int): ArrayData = {
    // k < 1 yields no windows (SQL-registered: hand-assembled input
    // must degrade cleanly, not throw AIOOBE from the window loop)
    if (text == null || k < 1) return Empty
    val bytes = text.getBytes
    val offs = cpOffsets(bytes)
    val n = offs.length - 1
    if (n < k) return Empty
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + k)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Code-point values decoded directly from the UTF-8 bytes at the
    * [[cpOffsets]] positions — the SAME coordinate system the windowing
    * and splice kernels use, so hashed window positions and byte-splice
    * positions can never disagree (they briefly could for malformed
    * UTF-8 when this kernel still counted via toString/UTF-16 while the
    * splice counted via the byte walk — r18 review finding). Valid
    * sequences decode to the exact code point (hash values unchanged);
    * a malformed unit hashes its first byte — deterministic, and window
    * identity still follows byte content.
    */
  private def cpValues(bytes: Array[Byte], offs: Array[Int]): Array[Int] = {
    val n = offs.length - 1
    val cps = new Array[Int](n)
    var i = 0
    while (i < n) {
      val o = offs(i)
      val len = offs(i + 1) - o
      val b0 = bytes(o) & 0xff
      cps(i) = len match {
        case 1 => b0
        case 2 => ((b0 & 0x1f) << 6) | (bytes(o + 1) & 0x3f)
        case 3 => ((b0 & 0x0f) << 12) | ((bytes(o + 1) & 0x3f) << 6) |
          (bytes(o + 2) & 0x3f)
        case 4 => ((b0 & 0x07) << 18) | ((bytes(o + 1) & 0x3f) << 12) |
          ((bytes(o + 2) & 0x3f) << 6) | (bytes(o + 3) & 0x3f)
        case _ => b0 // clamped malformed tail
      }
      i += 1
    }
    cps
  }

  /** [[CharGramHashes]] kernel: O(n) rolling polynomial over code points,
    * avalanche-finalized per window.
    */
  def gramHashes(text: UTF8String, k: Int): ArrayData = {
    if (text == null || k < 1) return Empty // see gramStrings
    val bytes = text.getBytes
    val cps = cpValues(bytes, cpOffsets(bytes))
    val n = cps.length
    if (n < k) return Empty
    val B = 1099511628211L // FNV prime as the polynomial base
    var bk = 1L
    var t = 0
    while (t < k - 1) { bk *= B; t += 1 } // B^(k-1), 2^64 ring
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    out(0) = mix(h)
    var s = 1
    while (s < out.length) {
      h = (h - cps(s - 1) * bk) * B + cps(s + k - 1)
      out(s) = mix(h)
      s += 1
    }
    new GenericArrayData(out)
  }

  private def mix(x: Long): Long = {
    var h = x
    h ^= (h >>> 32); h *= 0xD6E8FEB86659FD93L; h ^= (h >>> 32)
    h
  }

  /** [[SpliceChars]] kernel — a byte splice over the code-point offset
    * table ([[cpOffsets]]): surviving code points' byte ranges are copied
    * verbatim, so the output is identical to the old
    * StringBuilder.appendCodePoint rebuild for valid UTF-8 at none of the
    * decode/re-encode cost.
    */
  def spliceChars(text: UTF8String, starts: ArrayData, k: Int): InternalRow = {
    if (text == null) return null
    val bytes = text.getBytes
    val offs = cpOffsets(bytes)
    val n = offs.length - 1
    val m = if (starts == null) 0 else starts.numElements()
    if (m == 0) {
      // unchanged pass-through (the char flavor has no normalization)
      return new GenericInternalRow(Array[Any](text, n.toLong, 0L))
    }
    val covered = new Array[Boolean](n)
    var si = 0
    while (si < m) {
      if (starts.isNullAt(si)) { si += 1 }
      else {
        val s0 = starts.getInt(si)
        var j = math.max(s0, 0)
        val e = math.min(s0.toLong + k, n.toLong).toInt
        while (j < e) { covered(j) = true; j += 1 }
        si += 1
      }
    }
    var removed = 0L
    var outLen = 0
    var i = 0
    while (i < n) {
      if (covered(i)) removed += 1L
      else outLen += offs(i + 1) - offs(i)
      i += 1
    }
    val out = new Array[Byte](outLen)
    var p = 0
    i = 0
    while (i < n) {
      if (!covered(i)) {
        val len = offs(i + 1) - offs(i)
        System.arraycopy(bytes, offs(i), out, p, len)
        p += len
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out), n.toLong, removed))
  }
}
