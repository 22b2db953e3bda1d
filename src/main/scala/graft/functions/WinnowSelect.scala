package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS algorithm) over a per-position hash array:
  * slide a window of `w` consecutive hashes and select each window's
  * MINIMUM, rightmost position on ties; the fingerprint set is the
  * distinct selected (pos, hash) pairs in position order.  The
  * guarantee that makes it the standard local-fingerprint scheme:
  * any shared run of w + k − 1 tokens (k = the gram size hashed
  * upstream) is witnessed by at least one shared fingerprint, while
  * expected density is 2/(w+1) — an 8× reduction at w = 15 versus
  * keeping every k-gram hash.
  *
  * Hash comparison is SIGNED 64-bit (the natural Spark/DuckDB order,
  * so the oracle replays bit-exactly).  O(n) per document via the
  * monotone-deque sliding minimum; `>=` eviction makes equal older
  * candidates yield to newer ones, which IS the rightmost-tie rule.
  * A document's fingerprints are a pure per-row function of its own
  * hash array — the whole selection runs map-side inside codegen,
  * zero shuffle at any corpus size (the scale shape that makes
  * winnowing viable at 100 TB where a per-(doc, pos) window function
  * would shuffle every gram of the corpus).
  *
  * Input: array<long> (e.g. [[WindowHashes]] output).  Output:
  * array<struct<pos:int, fp:long>>; arrays shorter than `w` yield an
  * empty result (no complete window).
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"selection window must be positive, got $w")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_select requires array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSelect.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
  override def prettyName: String = "winnow_select"
}

object WinnowSelect {
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // monotone deque of positions with strictly increasing hashes;
    // `>=` eviction leaves the rightmost of equal minima at the front
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastSel = -1
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= h) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val sel = deque(head)
        if (sel != lastSel) {
          out += InternalRow(sel, arr.getLong(sel))
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def winnowSelect(c: Column, w: Int): Column =
    ColumnShim.column(WinnowSelect(ColumnShim.expression(c), w))
}
