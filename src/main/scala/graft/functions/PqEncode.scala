package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Allocation-free product-quantization encode and coarse-cell assign.
  *
  * The r18 literal formulation — per subspace an `array(...)` of ksub
  * `struct(-score, cid)` rows reduced by `array_min`, each score a
  * `dot(slice(e, …), typedLit(c))` — is value-correct and codegen'd,
  * but its PER-ROW allocation is brutal: m·ksub slice copies (a fresh
  * 8-double array each), m·ksub structs, m object arrays of ksub
  * elements, plus boxing through the struct comparator.  At the sf10
  * cold pass that was most of 4,543 s of gc inside the three IVF'd
  * codes builds (2,254 s wall on the 8 GB bench heap) — the encode
  * arithmetic itself is cheap; the garbage was the cost.  (r19, the
  * VERDICT's profiling-pass item.)
  *
  * These expressions run the IDENTICAL arithmetic in one tight loop
  * over a flattened codebook with ZERO per-row allocation beyond the
  * m-int result array:
  *
  *  - same IEEE evaluation order: ascending-i sequential dot (the
  *    [[DotProduct]] fold), then `/nrm`, then `− ½‖c‖²` with the half
  *    term pre-computed by the exact driver-side expression the
  *    literal plan embedded (`0.5 * c.map(x*x).sum`);
  *  - same tie-break: strict `<` on the negated score while scanning
  *    cid ascending keeps the FIRST (lowest-cid) winner — `array_min`
  *    over `struct(negscore, cid)` picks exactly that;
  *  - same NaN behavior: a NaN score never displaces a finite best
  *    (strict `<` is false), and an all-NaN row yields cid 0, matching
  *    struct ordering's NaN-is-greatest.
  *
  * Bit-identity of the produced codes against the r18 literal
  * formulation is spec-pinned (PqEncodeSpec) — the materialized codes
  * artifacts and their cold-bit-identity contracts are unchanged by
  * construction.
  */
final class PqEncoder(books: Array[Array[Array[Double]]], divByNrm: Boolean)
    extends Serializable {
  private val m = books.length
  private val ksub = books(0).length
  private val sub = books(0)(0).length
  // flat [j][cid][i] layout: one cache-linear walk per (row, subspace)
  private val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * sub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(books(j)(c), 0, a, (j * ksub + c) * sub, sub)
        c += 1
      }
      j += 1
    }
    a
  }
  // the literal plan's constant term, computed by the same expression
  private val half: Array[Double] = {
    val a = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) { a(j * ksub + c) = 0.5 * books(j)(c).map(x => x * x).sum; c += 1 }
      j += 1
    }
    a
  }

  def encode(e: ArrayData, nrm: Double): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val eoff = j * sub
      var bestNeg = Double.PositiveInfinity
      var best = 0
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) { d += e.getDouble(eoff + i) * flat(off + i); i += 1 }
        val score = (if (divByNrm) d / nrm else d) - half(j * ksub + c)
        val neg = -score
        if (neg < bestNeg) { bestNeg = neg; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}

/** `codes[j] = argmin_c ‖e_sub/nrm − c‖` over a trained PQ codebook,
  * as array<int> — the allocation-free twin of the literal
  * struct/array_min formulation (see [[PqEncoder]]).
  */
case class PqEncodeCodes(left: Expression, right: Expression, encoder: PqEncoder)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<double>, double), got $other")
    }

  override def nullSafeEval(e: Any, nrm: Any): Any =
    encoder.encode(e.asInstanceOf[ArrayData], nrm.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("pqEncoder", encoder, classOf[PqEncoder].getName)
    defineCodeGen(ctx, ev, (e, nrm) => s"$enc.encode($e, $nrm)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeCodes =
    copy(left = l, right = r)
  override def prettyName: String = "pq_encode"
}

/** Nearest coarse centroid by dot product (tie → lowest cid) — the
  * allocation-free twin of the literal `array_min(array(struct(-dot,
  * cid)…))` cell assignment.  Runs inside every Lloyd iteration of the
  * distributed k-means and inside every IVF'd encode, so the per-row
  * C-struct garbage of the literal form was paid once per (row,
  * iteration) across the training family too.
  */
final class CellAssigner(cents: Array[Array[Double]]) extends Serializable {
  private val c0 = cents.length
  private val dim = cents(0).length
  private val flat: Array[Double] = {
    val a = new Array[Double](c0 * dim)
    var c = 0
    while (c < c0) { System.arraycopy(cents(c), 0, a, c * dim, dim); c += 1 }
    a
  }

  def assign(e: ArrayData): Int = {
    val n = math.min(e.numElements(), dim)
    var bestNeg = Double.PositiveInfinity
    var best = 0
    var c = 0
    while (c < c0) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < n) { d += e.getDouble(i) * flat(off + i); i += 1 }
      val neg = -d
      if (neg < bestNeg) { bestNeg = neg; best = c }
      c += 1
    }
    best
  }
}

case class NearestCellId(child: Expression, assigner: CellAssigner)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cell requires array<double>, got $other")
    }

  override def nullSafeEval(e: Any): Any =
    assigner.assign(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("cellAssigner", assigner, classOf[CellAssigner].getName)
    defineCodeGen(ctx, ev, e => s"$a.assign($e)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellId =
    copy(child = c)
  override def prettyName: String = "nearest_cell"
}
