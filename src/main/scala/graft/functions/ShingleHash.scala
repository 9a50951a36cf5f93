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

/** md5 sibling of [[ShingleHashAll]] for the VERIFICATION flavors: all
  * positional word n-gram hashes, document order, duplicates kept, where
  * each hash is the 32-bit md5 PREFIX of the n-gram STRING (tokens
  * lowercased via the exact `F.lower` path, joined with single spaces) —
  * byte-identical to `pmod`-free `Hygiene.md5Prefix32(gram)` over the
  * exploded string formulation, which is what lets the hashed DSIR/NB
  * twins keep their full DuckDB oracles while computing the bag in ONE
  * kernel call per row instead of interpreted tokenizer/zip/concat
  * lambdas plus a per-element md5 expression under a Generate.
  * Registered for SQL as `md5_gram_hashes(text, n)`.
  */
case class Md5GramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_gram_hashes expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_gram_hashes"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    ShingleHashKernel.md5GramHashes(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.ShingleHashKernel.md5GramHashes($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5GramHashes =
    copy(left = newLeft, right = newRight)
}

/** String sibling of [[ShingleHashAll]] for the EXACT verification
  * faces: all positional word n-gram STRINGS (tokens lowercased via the
  * `F.lower` path, space-joined), document order, duplicates kept —
  * exactly the values the exact-face oracles join on, produced in ONE
  * kernel call per row instead of an interpreted
  * tokenize→sequence→slice→concat_ws chain under a Generate. Used by
  * `TextAnalysis.duplicatedPassages` (exact flavor) and
  * `Selection.docFeatureRows` (numBuckets = 0). Registered for SQL as
  * `gram_strings(text, n)`.
  */
case class GramStrings(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_strings expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gram_strings"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    ShingleHashKernel.gramStrings(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.ShingleHashKernel.gramStrings($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramStrings =
    copy(left = newLeft, right = newRight)
}

/** Splice kernel of the exact-substring dedup
  * (`graft.operators.Dedup.exactSubstrDedup` — Lee et al. 2021's
  * duplicated-span REMOVAL, token-window approximation):
  * `splice_tokens(text, starts, k)` re-tokenizes `text` exactly the way
  * the window keys were built ([[GramStrings]]/[[ShingleHashAll]]:
  * lowercase, letter/digit runs), marks every token covered by a
  * k-window starting at one of `starts` (0-based positions, any order,
  * overlaps fine — interval union by construction), and returns the
  * SURVIVING tokens space-joined (all covered → empty string; empty
  * `starts` → the full token stream, i.e. the operator's whitespace
  * normalization). One primitive pass per row; a composed
  * filter/transform HOF formulation would re-evaluate the token array
  * per element under interpreted lambdas. Registered for SQL as
  * `splice_tokens(text, starts, k)`.
  */
case class SpliceTokens(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"splice_tokens expects (string, array<int>, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "splice_tokens"

  override protected def nullSafeEval(text: Any, starts: Any, k: Any): Any =
    ShingleHashKernel.spliceTokens(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, st, k) =>
      s"graft.functions.ShingleHashKernel.spliceTokens($t, $st, $k)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SpliceTokens =
    copy(first = f, second = s, third = t)
}

/** Fused stats sibling of [[SpliceTokens]] — the splice tail of the
  * exact-substring operators needs (text_dedup, n_tokens, n_removed) per
  * document, and computing the counts as separate `tokenCount` columns
  * runs the tokenizer THREE times over the corpus-sized final projection
  * (the r17 verdict's "what's wrong" #1). This expression returns all
  * three in ONE tokenizer walk:
  * `splice_tokens_stats(text, starts, k)` →
  * `struct<text_dedup string, n_tokens bigint, n_removed bigint>` where
  * `n_tokens` is the full token count (parity with
  * `TextAnalysis.tokenCount` — same lowercase + [[Tok.Pattern]] split)
  * and `n_removed` the covered-token count, so
  * `n_tokens - n_removed = tokenCount(text_dedup)` by construction.
  * Null/clamp semantics for hand-assembled `starts` match
  * [[SpliceTokens]] exactly (shared kernel core).
  */
case class SpliceTokensStats(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"splice_tokens_stats expects (string, array<int>, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = SpliceTokensStats.schema
  override def prettyName: String = "splice_tokens_stats"

  override protected def nullSafeEval(text: Any, starts: Any, k: Any): Any =
    ShingleHashKernel.spliceTokensStats(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, st, k) =>
      s"graft.functions.ShingleHashKernel.spliceTokensStats($t, $st, $k)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SpliceTokensStats =
    copy(first = f, second = s, third = t)
}

object SpliceTokensStats {
  import org.apache.spark.sql.types.{StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("text_dedup", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))
}

/** Row kernel shared by the expression's interpreted and codegen'd paths:
  * tokenize once, 64-bit-hash each token, combine n-gram hashes, distinct.
  */
object ShingleHashKernel {

  /** [[SpliceTokens]] kernel. The operator never produces hostile
    * arrays (it collects posexplode positions), but `splice_tokens` is
    * SQL-registered, so hand-assembled input is supported: a NULL array
    * element is ignored (it names no span — silently reading it as
    * position 0 would splice the first k tokens, the review-caught
    * hazard) and out-of-range starts are clamped rather than thrown.
    */
  def spliceTokens(text: UTF8String, starts: ArrayData, k: Int): UTF8String = {
    if (text == null) return null
    val toks = TokenPattern.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    val m = if (starts == null) 0 else starts.numElements()
    if (m == 0) return UTF8String.fromString(toks.mkString(" "))
    val (survivors, _) = spliceCore(toks, starts, m, k)
    survivors
  }

  /** [[SpliceTokensStats]] kernel: the splice plus both counts in the
    * same tokenizer walk. Returns null only for null text (matching
    * [[spliceTokens]]'s null-in/null-out).
    */
  def spliceTokensStats(text: UTF8String, starts: ArrayData,
      k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    if (text == null) return null
    val toks = TokenPattern.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    val m = if (starts == null) 0 else starts.numElements()
    val (survivors, removed) =
      if (m == 0) (UTF8String.fromString(toks.mkString(" ")), 0L)
      else spliceCore(toks, starts, m, k)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](survivors, toks.length.toLong, removed))
  }

  /** Shared interval-union + splice core: (surviving tokens space-joined,
    * covered-token count). `m` = starts.numElements(), already known > 0
    * or the callers short-circuit.
    */
  private def spliceCore(toks: Array[String], starts: ArrayData, m: Int,
      k: Int): (UTF8String, Long) = {
    val n = toks.length
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
    val sb = new java.lang.StringBuilder
    var i = 0
    var first = true
    var removed = 0L
    while (i < n) {
      if (!covered(i)) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      } else removed += 1L
      i += 1
    }
    (UTF8String.fromString(sb.toString), removed)
  }

  /** [[GramStrings]] kernel: positional n-gram strings, duplicates
    * kept. Tokenization parity with the column formulations is pinned in
    * SelectionSpec/PipelineSpec.
    */
  def gramStrings(text: UTF8String, n: Int): ArrayData = {
    if (text == null)
      return new GenericArrayData(Array.empty[Any])
    val toks = TokenPattern.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val gram =
        if (n == 1) toks(i)
        else {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          sb.toString
        }
      out(i) = UTF8String.fromString(gram)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val TokenPattern =
    Tok.Pattern

  /** [[Md5GramHashes]] kernel: md5-prefix32 of each positional n-gram
    * string. Tokenization parity is with the COLUMN formulation
    * (`F.lower` = `UTF8String.toLowerCase`, the shared split regex) —
    * pinned against the exploded string path in SelectionSpec.
    */
  def md5GramHashes(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Long])
    val toks = TokenPattern.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val gram =
        if (n == 1) toks(i)
        else {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          sb.toString
        }
      out(i) = graft.plans.Hygiene.md5Prefix32Jvm(gram)
      i += 1
    }
    new GenericArrayData(out)
  }

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

  /** Per-token 64-bit hash — FNV-1a, NOT poly-31: the multiply-by-31
    * chain admits trivial short-token collisions ("an" and "c0" collide:
    * 97·31+110 = 99·31+48), and a token-level collision survives every
    * downstream avalanche — identical n-gram keys, corrupted shingle
    * sets. FNV-1a's xor-then-multiply keeps accidental collisions at the
    * ~2^-64 scale the shingle-set equivalence contract claims.
    */
  private def h64(s: String): Long = {
    var h = -3750763034362895579L // FNV-1a 64: basis 0xcbf29ce484222325
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i); h *= 1099511628211L // prime 0x100000001b3
      i += 1
    }
    h
  }
}
