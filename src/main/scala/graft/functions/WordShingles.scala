package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array as a native expression: one
  * pass, one `UTF8String.concatWs` per shingle.  Replaces the
  * `transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))`
  * higher-order formulation, which allocates a sliced array per shingle
  * and interprets every lambda — the single hottest cost in the
  * shingle-based dedup family.  Output strings are identical.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val res = new Array[Any](out)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < out) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      res(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def wordShingles(c: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(c), n))
}
