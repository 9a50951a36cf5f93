package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Fixed-point PQ kernels — the native execution of the oracle-able PQ
  * flavor ([[graft.operators.Similarity.pqTopKFixed]]). The semantics are
  * defined by exact integer arithmetic any engine replays: quantize
  * `floor(vᵢ·2^shift)` (exact — power-of-two scaling only shifts the
  * double's exponent), then integer subspace-L2 argmin / ADC lookups.
  * The composed `functions._` formulation of the same math builds a
  * ~6000-node expression tree (m·ksub struct literals) that falls out of
  * whole-stage codegen and ships megabytes of literals with every task;
  * these kernels are primitive loops over a driver-flattened codebook
  * reference. PipelineSpec pins kernel == composed row-for-row, and the
  * DuckDB oracle replays the identical integers.
  */
object PqFixedKernel {

  /** Driver-flattened quantized codebook: centroid c of subspace j starts
    * at `flat(j·ksub·dsub + c·dsub)`.
    */
  final case class QCodebook(flat: Array[Long], m: Int, ksub: Int, dsub: Int)

  def fromLiteral(raw: ArrayData): QCodebook = {
    require(raw != null, "pq fixed: codebook literal must not be null")
    val m = raw.numElements()
    require(m > 0, "pq fixed: empty codebook")
    val sub0 = raw.getArray(0)
    require(sub0 != null, "pq fixed: codebook contains null sub-arrays")
    val ksub = sub0.numElements()
    require(ksub > 0, "pq fixed: empty subspace codebook")
    val cent0 = sub0.getArray(0)
    require(cent0 != null, "pq fixed: codebook contains null centroids")
    val dsub = cent0.numElements()
    require(dsub > 0, "pq fixed: zero-dimensional centroids")
    val flat = new Array[Long](m * ksub * dsub)
    var j = 0
    while (j < m) {
      val sub = raw.getArray(j)
      require(sub != null && sub.numElements() == ksub,
        "pq fixed: ragged codebook (ksub)")
      var c = 0
      while (c < ksub) {
        val cent = sub.getArray(c)
        require(cent != null && cent.numElements() == dsub,
          "pq fixed: ragged centroid (dsub)")
        var i = 0
        while (i < dsub) {
          flat(j * ksub * dsub + c * dsub + i) = cent.getLong(i)
          i += 1
        }
        c += 1
      }
      j += 1
    }
    QCodebook(flat, m, ksub, dsub)
  }

  /** Integer argmin-L2 codes; ties → lowest code id (strict `<` on a
    * left-to-right scan, the array_min-on-struct rule). Returns null for
    * vectors whose length ≠ m·dsub — the fixed flavor's contract drops
    * malformed vectors rather than erroring (callers filter on size; the
    * null is belt-and-braces against plan reordering).
    */
  def codes(vec: ArrayData, cb: QCodebook, shift: Int): ArrayData = {
    val dim = cb.m * cb.dsub
    if (vec.numElements() != dim) return null
    val scale = (1L << shift).toDouble
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      q(i) = math.floor(vec.getDouble(i) * scale).toLong
      i += 1
    }
    val out = new Array[Int](cb.m)
    var j = 0
    while (j < cb.m) {
      val base = j * cb.ksub * cb.dsub
      val voff = j * cb.dsub
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cb.ksub) {
        var s = 0L
        var d = 0
        val off = base + c * cb.dsub
        while (d < cb.dsub) {
          val t = q(voff + d) - cb.flat(off + d)
          s += t * t
          d += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The query-side ADC table: integer L2 distance from each subvector to
    * EVERY centroid — m arrays of ksub bigints. Null on length mismatch,
    * same contract as [[codes]].
    */
  def lut(vec: ArrayData, cb: QCodebook, shift: Int): ArrayData = {
    val dim = cb.m * cb.dsub
    if (vec.numElements() != dim) return null
    val scale = (1L << shift).toDouble
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      q(i) = math.floor(vec.getDouble(i) * scale).toLong
      i += 1
    }
    val out = new Array[ArrayData](cb.m)
    var j = 0
    while (j < cb.m) {
      val base = j * cb.ksub * cb.dsub
      val voff = j * cb.dsub
      val row = new Array[Long](cb.ksub)
      var c = 0
      while (c < cb.ksub) {
        var s = 0L
        var d = 0
        val off = base + c * cb.dsub
        while (d < cb.dsub) {
          val t = q(voff + d) - cb.flat(off + d)
          s += t * t
          d += 1
        }
        row(c) = s
        c += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Pair ADC distance: Σⱼ lut(j)(codes(j)) in one primitive loop.
    * Null if either side is null or any code indexes out of range.
    */
  def adc(lut: ArrayData, codes: ArrayData): java.lang.Long = {
    if (lut == null || codes == null) return null
    val m = codes.numElements()
    if (lut.numElements() != m) return null
    var s = 0L
    var j = 0
    while (j < m) {
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      if (row == null || c < 0 || c >= row.numElements()) return null
      s += row.getLong(c)
      j += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** Shared shape of the two (vec, LITERAL qcodebooks, LITERAL shift)
  * expressions.
  */
abstract class PqFixedVecExpression extends TernaryExpression {
  def first: Expression
  def second: Expression
  def third: Expression

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okCb = second.foldable && (second.dataType match {
      case ArrayType(ArrayType(ArrayType(LongType, _), _), _) => true
      case _ => false
    })
    val okShift = third.dataType == IntegerType && third.foldable
    if (okVec && okCb && okShift) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double> vec, LITERAL " +
        "array<array<array<bigint>>> codebooks, LITERAL int shift), got " +
        Seq(first, second, third).map(_.dataType.simpleString)
          .mkString("(", ", ", ")"))
  }

  // null also for malformed (wrong-length) vectors, not only null input
  override def nullable: Boolean = true

  @transient protected lazy val cb: PqFixedKernel.QCodebook =
    PqFixedKernel.fromLiteral(second.eval().asInstanceOf[ArrayData])
  @transient protected lazy val shiftVal: Int =
    third.eval().asInstanceOf[Int]

  protected def kernelMethod: String

  override protected def nullSafeEval(vec: Any, cbRaw: Any, s: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqfCb", cb,
      classOf[PqFixedKernel.QCodebook].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.functions.PqFixedKernel.$kernelMethod($v, $cbRef, $shiftVal);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }
}

/** Native `pq_codes_fixed(vec, qcodebooks, shift)`: quantize + integer
  * argmin-L2 encode in one fused pass → array<int> codes.
  */
case class PqCodesFixed(first: Expression, second: Expression,
    third: Expression) extends PqFixedVecExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes_fixed"
  override protected def kernelMethod: String = "codes"
  override protected def nullSafeEval(vec: Any, cbRaw: Any, s: Any): Any =
    PqFixedKernel.codes(vec.asInstanceOf[ArrayData], cb, shiftVal)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqCodesFixed = copy(first = f, second = s, third = t)
}

/** Native `pq_lut_fixed(vec, qcodebooks, shift)`: quantize + the m×ksub
  * integer ADC distance table in one fused pass → array<array<bigint>>.
  */
case class PqLutFixed(first: Expression, second: Expression,
    third: Expression) extends PqFixedVecExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut_fixed"
  override protected def kernelMethod: String = "lut"
  override protected def nullSafeEval(vec: Any, cbRaw: Any, s: Any): Any =
    PqFixedKernel.lut(vec.asInstanceOf[ArrayData], cb, shiftVal)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqLutFixed = copy(first = f, second = s, third = t)
}

/** Native `pq_adc_fixed(lut, codes)`: the per-pair integer ADC sum —
  * m array lookups in one primitive loop, no per-row allocation.
  */
case class PqAdcFixed(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLut = left.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    val okCodes = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (okLut && okCodes) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_fixed expects (array<array<bigint>> lut, array<int> codes), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_fixed"
  // null on ragged/out-of-range inputs, not only null children
  override def nullable: Boolean = true

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqFixedKernel.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"""java.lang.Long ${ev.value}$$box = graft.functions.PqFixedKernel.adc($l, $c);
         |${ev.isNull} = (${ev.value}$$box == null);
         |if (!${ev.isNull}) ${ev.value} = ${ev.value}$$box.longValue();""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcFixed =
    copy(left = newLeft, right = newRight)
}
