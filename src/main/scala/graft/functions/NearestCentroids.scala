package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Native top-m nearest-centroid scorer — the scale-safe replacement for
  * the composed "array of k distance/cid struct literals" formulation
  * (`Similarity.l2ScoredComposed`).
  *
  * The composed form expands every centroid into its own literal
  * expression subtree, so generated code GROWS WITH k·dim: janino's 64 KB
  * method limit is hit in the low hundreds of centroids (logged
  * `Code grows beyond 64 KB` → interpreted fallback) and the plan itself
  * stops compiling long before the ~50k clusters SemDeDup's paper scale
  * calls for. Here the centroid payload is NOT part of the expression
  * tree at all: the SQL face's literal argument is evaluated ONCE at
  * function-build time into a flattened [[QuantizerKernel.CentroidSet]]
  * (precomputed ‖c‖² / ‖c‖) carried as a plain constructor field, so
  *  - the plan node renders as a constant-size summary (`k=…, dim=…`) —
  *    EXPLAIN output does not grow with k;
  *  - generated code is one kernel call via a codegen reference —
  *    constant size whatever k is, no janino ceiling;
  *  - the payload ships inside the serialized plan closure, which Spark
  *    broadcasts once per stage — executors fetch it once, not per task.
  *
  * `nearest_centroids(vec, cents, m)` (cents/m must be foldable; checked
  * at build) returns the `min(m, k)` nearest centroids as
  * `array<struct<d, cid, csim>>` sorted ascending by `(d, cid)`, where
  *  - `d` is the L2 surrogate `‖c‖² − 2·v·c` (the ‖v‖² term is constant
  *    per row so it cannot change the ordering) — the SAME metric, in the
  *    same floating-point evaluation order, as the composed form, so the
  *    two paths tessellate identically;
  *  - ties break on lowest `cid` (cids are distinct, so the order is
  *    total and deterministic);
  *  - `csim` is the cosine of `vec` to that centroid (the SemDeDup keep
  *    policy's score), null when either norm is zero — matching
  *    [[CosineSim]]'s zero-norm sentinel.
  *
  * Null semantics: null input vector → null; length ≠ centroid dim, null
  * element, or non-finite element (NaN or ±Inf — an Inf element times a
  * 0.0 centroid element would otherwise smuggle NaN into the surrogate
  * distances, where every comparison is false and the top-m order
  * diverges from the composed baseline's deterministic NaN-last sort) →
  * null result (the composed form instead yields per-struct null `d`
  * fields with undefined sort placement — no consumer feeds it malformed
  * vectors, and an explicit whole-result null is the saner contract).
  * Callers that need malformed rows OBSERVABLE rather than silently
  * null-assigned should audit with `Similarity.malformedVectors` first.
  */
case class NearestCentroids(child: Expression,
    cs: QuantizerKernel.CentroidSet, m: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects an array<double> vector, got " +
        t.simpleString)
  }

  override def dataType: DataType = NearestCentroids.resultType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"

  // the payload must never render into plan strings: EXPLAIN at paper
  // scale would otherwise print megabytes of doubles
  override def toString: String =
    s"nearest_centroids($child, k=${cs.k}, dim=${cs.dim}, m=$m)"

  override protected def nullSafeEval(vec: Any): Any =
    QuantizerKernel.topM(vec.asInstanceOf[ArrayData], cs, m)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centSet", cs,
      classOf[QuantizerKernel.CentroidSet].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("topm")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.QuantizerKernel.topM($v, $csRef, $m);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroids = copy(child = newChild)
}

object NearestCentroids {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false),
    StructField("csim", DoubleType, nullable = true))),
    containsNull = false)

  /** Build from the SQL face's argument list: `cents` must be a foldable
    * `array<struct<int, array<double>>>` and `m` a foldable int — both
    * fold ONCE here, at function-resolution time, never per row.
    */
  def fromArgs(vec: Expression, cents: Expression, m: Expression): NearestCentroids = {
    val okCents = cents.foldable && (cents.dataType match {
      case ArrayType(StructType(Array(c, v)), _) =>
        c.dataType == IntegerType &&
          (v.dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    })
    require(okCents,
      "nearest_centroids: centroids must be a LITERAL " +
        s"array<struct<int, array<double>>>, got ${cents.dataType.simpleString}" +
        (if (cents.foldable) "" else " (non-foldable)"))
    require(m.foldable && m.dataType == IntegerType,
      s"nearest_centroids: m must be a LITERAL int, got ${m.dataType.simpleString}")
    val mVal = m.eval()
    // a foldable NULL int (CAST(NULL AS INT)) would unbox to 0 and return
    // empty arrays for every row — error with the same strictness as the
    // centroid-argument checks instead
    require(mVal != null, "nearest_centroids: m must not be null")
    NearestCentroids(vec,
      QuantizerKernel.fromLiteral(cents.eval().asInstanceOf[ArrayData]),
      mVal.asInstanceOf[Int])
  }
}

/** Row kernel shared by the interpreted and codegen'd paths of
  * [[NearestCentroids]].
  */
object QuantizerKernel {

  /** Driver-flattened centroid set: centroid i spans
    * `flat(i·dim) until ((i+1)·dim)`; `norms2`/`norms` are its
    * precomputed ‖c‖² (summed in ascending-dimension order, matching the
    * composed form's driver-side `cv.map(x*x).sum`) and ‖c‖.
    *
    * Equality is CONTENT-based (a case class over Arrays would compare by
    * reference): two `nearest_centroids` calls built from the same
    * centroid literal must compare equal so Catalyst's canonicalized plan
    * matching and common-subexpression elimination keep working — the
    * property the old all-literal form got for free. norms2/norms are
    * derived from (flat, dim), so (flat, cids, k, dim) is the identity.
    */
  final case class CentroidSet(flat: Array[Double], cids: Array[Int],
      k: Int, dim: Int, norms2: Array[Double], norms: Array[Double]) {
    override def equals(other: Any): Boolean = other match {
      case that: CentroidSet =>
        k == that.k && dim == that.dim &&
          java.util.Arrays.equals(flat, that.flat) &&
          java.util.Arrays.equals(cids, that.cids)
      case _ => false
    }
    override def hashCode: Int =
      java.util.Objects.hash(Integer.valueOf(k), Integer.valueOf(dim),
        Integer.valueOf(java.util.Arrays.hashCode(flat)),
        Integer.valueOf(java.util.Arrays.hashCode(cids)))
  }

  def fromLiteral(raw: ArrayData): CentroidSet = {
    require(raw != null, "nearest_centroids: centroid literal must not be null")
    val k = raw.numElements()
    require(k > 0, "nearest_centroids: empty centroid set")
    val first = raw.getStruct(0, 2)
    require(first != null && !first.isNullAt(1),
      "nearest_centroids: null centroid entry")
    val dim = first.getArray(1).numElements()
    require(dim > 0, "nearest_centroids: zero-dimensional centroids")
    val flat = new Array[Double](k * dim)
    val cids = new Array[Int](k)
    val norms2 = new Array[Double](k)
    val norms = new Array[Double](k)
    var i = 0
    while (i < k) {
      val s = raw.getStruct(i, 2)
      require(s != null && !s.isNullAt(0) && !s.isNullAt(1),
        "nearest_centroids: null centroid entry")
      cids(i) = s.getInt(0)
      val v = s.getArray(1)
      require(v.numElements() == dim,
        s"nearest_centroids: centroid ${cids(i)} has dim " +
          s"${v.numElements()}, expected $dim")
      var n2 = 0.0
      var j = 0
      while (j < dim) {
        require(!v.isNullAt(j), "nearest_centroids: null centroid element")
        val x = v.getDouble(j)
        require(java.lang.Double.isFinite(x),
          "nearest_centroids: non-finite centroid element")
        flat(i * dim + j) = x
        n2 += x * x
        j += 1
      }
      norms2(i) = n2
      norms(i) = math.sqrt(n2)
      i += 1
    }
    require(cids.distinct.length == k,
      "nearest_centroids: duplicate centroid ids")
    CentroidSet(flat, cids, k, dim, norms2, norms)
  }

  /** The `min(m, k)` nearest centroids of `vec` by `(d, cid)` ascending,
    * or null for a malformed vector (wrong length / null / non-finite
    * element).
    * O(k·(dim + m)) per row, allocation bounded by the m-row output.
    */
  def topM(vec: ArrayData, cs: CentroidSet, m: Int): ArrayData = {
    val dim = cs.dim
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var nv2 = 0.0
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      val x = vec.getDouble(j)
      if (!java.lang.Double.isFinite(x)) return null
      v(j) = x
      nv2 += x * x
      j += 1
    }
    val nv = math.sqrt(nv2)
    val take = math.min(math.max(m, 0), cs.k)
    if (take == 0) return new GenericArrayData(Array.empty[Any])
    // insertion-sorted (d, centroid index, dot) top-m buffers; m is tiny
    // (1 or nProbe), so the O(m) shift on the rare improving candidate is
    // cheaper than any heap bookkeeping
    val dArr = new Array[Double](take)
    val idxArr = new Array[Int](take)
    val dotArr = new Array[Double](take)
    var filled = 0
    var i = 0
    while (i < cs.k) {
      var dp = 0.0
      val base = i * dim
      j = 0
      while (j < dim) { dp += v(j) * cs.flat(base + j); j += 1 }
      val d = cs.norms2(i) - 2.0 * dp
      val cid = cs.cids(i)
      if (filled < take || d < dArr(filled - 1) ||
          (d == dArr(filled - 1) && cid < cs.cids(idxArr(filled - 1)))) {
        var p = if (filled < take) filled else take - 1
        while (p > 0 && (dArr(p - 1) > d ||
            (dArr(p - 1) == d && cs.cids(idxArr(p - 1)) > cid))) {
          dArr(p) = dArr(p - 1); idxArr(p) = idxArr(p - 1)
          dotArr(p) = dotArr(p - 1)
          p -= 1
        }
        dArr(p) = d; idxArr(p) = i; dotArr(p) = dp
        if (filled < take) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      // matches VectorKernel.cosine: d / (sqrt(‖a‖²)·sqrt(‖b‖²)), null on
      // zero denominator
      val denom = nv * cs.norms(idxArr(i))
      val csim: Any = if (denom == 0.0) null else dotArr(i) / denom
      out(i) = new GenericInternalRow(
        Array[Any](dArr(i), cs.cids(idxArr(i)), csim))
      i += 1
    }
    new GenericArrayData(out)
  }
}
