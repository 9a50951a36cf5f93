package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-normalization expression — the standard pre-dedup cleanup
  * pass every web-scale curation pipeline runs before anything
  * content-addressed (fingerprints, shingles, MinHash signatures all
  * change under trivially-different encodings of the same text; cf. the
  * normalization step in CCNet, Wenzek et al. 2020 §4.1). One kernel call
  * per row, whole-stage codegen, scan-side — no shuffle anywhere.
  *
  * Normalization rules, in order (each replayable in ANSI SQL, so the
  * whole operator is DuckDB-oracle-checkable):
  *
  *  1. Unicode NFC (canonical composition — `e`+U+0301 becomes U+00E9),
  *     via `java.text.Normalizer`; the fast `isNormalized` path makes
  *     already-clean ASCII corpora allocation-free for this step.
  *  2. Line terminators: `\r\n` and bare `\r` become `\n`.
  *  3. `\t` becomes a single space.
  *  4. Remaining C0/C1-range control characters (U+0000–U+0008, U+000B,
  *     U+000C, U+000E–U+001F, U+007F) are removed; `\n` survives — line
  *     structure is load-bearing downstream (Gopher/C4 line rules).
  *  5. Runs of 2+ spaces (U+0020 only) collapse to one space.
  *  6. Leading/trailing spaces and newlines of the whole document are
  *     trimmed.
  *
  * Registered for SQL as `normalize_text(text)` by
  * [[graft.plans.GraftExtensions]].
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(text: Any): Any =
    NormalizeTextKernel.normalize(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.NormalizeTextKernel.normalize($t)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}

/** Row kernel shared by the interpreted and codegen'd paths. Steps 2–6
  * fuse into one char pass over the NFC output; the space-run collapse is
  * a skip-while-previous-was-space state bit, and the final trim strips
  * spaces/newlines off both ends of the builder without re-scanning.
  */
object NormalizeTextKernel {

  def normalize(text: UTF8String): UTF8String =
    if (text == null) null
    else UTF8String.fromString(normalizeString(text.toString))

  def normalizeString(text: String): String = {
    if (text == null) return null
    val nfc =
      if (java.text.Normalizer.isNormalized(text, java.text.Normalizer.Form.NFC)) text
      else java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var prevSpace = false
    while (i < n) {
      var c = nfc.charAt(i)
      if (c == '\r') {
        // \r\n is ONE terminator: consume the \n here so it can't double
        if (i + 1 < n && nfc.charAt(i + 1) == '\n') i += 1
        c = '\n'
      }
      if (c == '\t') c = ' '
      if (c == '\n') { sb.append('\n'); prevSpace = false }
      else if (c == ' ') { if (!prevSpace) sb.append(' '); prevSpace = true }
      else if (c < 0x20 || c == 0x7F) { /* control: drop */ }
      else { sb.append(c); prevSpace = false }
      i += 1
    }
    // trim spaces and newlines off both ends
    var lo = 0
    var hi = sb.length
    while (lo < hi && (sb.charAt(lo) == ' ' || sb.charAt(lo) == '\n')) lo += 1
    while (hi > lo && (sb.charAt(hi - 1) == ' ' || sb.charAt(hi - 1) == '\n')) hi -= 1
    sb.substring(lo, hi)
  }
}
