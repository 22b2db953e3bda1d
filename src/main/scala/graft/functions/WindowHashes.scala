package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Stride-1 rolling hashes of every `w`-token window in a token array:
  * out[i] = Σ_{j<w} th(tok[i+j])·Q^(w−1−j) mod 2⁶⁴, where th is the
  * [[RollingHash64]] byte polynomial of one token and Q a distinct odd
  * multiplier (token-internal and across-token mixing must not share a
  * base, or boundary shifts could cancel).  Computed incrementally —
  * drop the leading term, scale by Q, add the trailing token hash — so
  * a document costs O(n) token hashes + O(n) window updates, not the
  * O(n·w) a slice-per-position HOF (`transform` × `slice` × hash)
  * pays; at w = 20 that is a 20× scan-CPU difference on the
  * dedup_substr hot path.  Window identity is the exact token SEQUENCE
  * (order-sensitive, unlike shingle sets).  Arrays shorter than `w`
  * yield an empty result.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"window size must be positive, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"window_hashes requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowHashes.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
  override def prettyName: String = "window_hashes"
}

object WindowHashes {
  /** Across-token polynomial base — odd (invertible growth mod 2⁶⁴) and
    * ≠ [[RollingHash64.P]].
    */
  final val Q = 0x9E3779B97F4A7C15L

  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) 0L else RollingHash64.compute(arr.getUTF8String(i))
      i += 1
    }
    var qw = 1L // Q^(w−1), the leading term's weight
    i = 0
    while (i < w - 1) { qw *= Q; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * Q + th(i); i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      h = (h - th(i - w) * qw) * Q + th(i)
      out(i - w + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def windowHashes(c: Column, w: Int): Column =
    ColumnShim.column(WindowHashes(ColumnShim.expression(c), w))
}
