package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native PQ encoder: one fused argmin-L2 pass assigning each of the `m`
  * subvectors of the input to its nearest codebook centroid.
  *
  * The `functions._` formulation (per subspace, an array of `ksub`
  * distance/code structs reduced by `array_min`) allocates m·ksub boxed
  * structs PER ROW; this kernel is three primitive loops over a flattened
  * codebook with no per-row allocation beyond the m-byte output, and
  * `doGenCode` keeps it inside whole-stage codegen. The codebook argument
  * must be a LITERAL (foldable): it is flattened once on the driver and
  * ships as a codegen reference, never evaluated per row. Registered for
  * SQL as `pq_codes(vec, codebooks)` by [[graft.plans.GraftExtensions]].
  */
case class PqCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okCb = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    })
    if (okVec && okCb) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_codes expects (array<double> vec, LITERAL " +
        "array<array<array<double>>> codebooks), got " +
        Seq(left, right).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true // ragged vector -> NULL codes
  override def prettyName: String = "pq_codes"

  @transient private lazy val cb: PqCodesKernel.Codebook =
    PqCodesKernel.fromLiteral(right.eval().asInstanceOf[ArrayData])

  override protected def nullSafeEval(vec: Any, cbRaw: Any): Any =
    PqCodesKernel.encode(vec.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb,
      classOf[PqCodesKernel.Codebook].getName)
    // nullSafeCodeGen, not defineCodeGen: the kernel returns null for a
    // ragged vector (a data condition), which defineCodeGen's
    // assume-non-null contract cannot represent
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val r = ctx.freshName("pqCodesRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.PqCodesKernel.encode($v, $cbRef);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}

object PqCodesKernel {

  /** Driver-flattened codebook: centroid i of subspace j starts at
    * `flat(j·ksub·dsub + i·dsub)`.
    */
  final case class Codebook(flat: Array[Double], m: Int, ksub: Int, dsub: Int)

  def fromLiteral(raw: ArrayData): Codebook = {
    require(raw != null, "pq_codes: codebook literal must not be null")
    val m = raw.numElements()
    require(m > 0, "pq_codes: empty codebook")
    val sub0 = raw.getArray(0)
    require(sub0 != null, "pq_codes: codebook contains null sub-arrays")
    val ksub = sub0.numElements()
    require(ksub > 0, "pq_codes: empty subspace codebook")
    val cent0 = sub0.getArray(0)
    require(cent0 != null, "pq_codes: codebook contains null centroids")
    val dsub = cent0.numElements()
    require(dsub > 0, "pq_codes: zero-dimensional centroids")
    // codes are stored as bytes (m BYTES per vector, the point of PQ
    // compression) in UNSIGNED encoding: ksub up to 256 — the classical
    // 8-bit PQ configuration — wraps through the signed byte and readers
    // undo it with pmod 256
    require(ksub <= 256, s"pq_codes: ksub=$ksub exceeds the byte-code limit of 256")
    val flat = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      val sub = raw.getArray(j)
      require(sub != null && sub.numElements() == ksub,
        "pq_codes: ragged codebook (ksub)")
      var c = 0
      while (c < ksub) {
        val cent = sub.getArray(c)
        require(cent != null && cent.numElements() == dsub,
          "pq_codes: ragged centroid (dsub)")
        var i = 0
        while (i < dsub) {
          flat(j * ksub * dsub + c * dsub + i) = cent.getDouble(i)
          i += 1
        }
        c += 1
      }
      j += 1
    }
    Codebook(flat, m, ksub, dsub)
  }

  /** Argmin-L2 code per subspace; ties break toward the lower code id
    * (strict `<` on a left-to-right scan). A vector whose length differs
    * from m·dsub returns NULL — a DATA condition (one ragged embedding
    * row must not kill a 100 TB job; the module's malformedVectors audit
    * reports such rows), matching pq_codes_fixed and nearest_centroids.
    * The former `require` here was the one float-ANN site where a ragged
    * row was fatal.
    */
  def encode(vec: ArrayData, cb: Codebook): ArrayData = {
    val dim = cb.m * cb.dsub
    if (vec.numElements() != dim) return null
    val out = new Array[Byte](cb.m)
    var j = 0
    while (j < cb.m) {
      val base = j * cb.ksub * cb.dsub
      val voff = j * cb.dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.ksub) {
        var s = 0.0
        var i = 0
        val off = base + c * cb.dsub
        while (i < cb.dsub) {
          val t = vec.getDouble(voff + i) - cb.flat(off + i)
          s += t * t
          i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = (best & 0xFF).toByte // unsigned encoding, see fromLiteral
      j += 1
    }
    new GenericArrayData(out)
  }
}
