package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent character pairs of a string as a native expression: one
  * pass over the UTF-8 bytes with codepoint-boundary tracking.
  * Replaces the `transform(sequence(1, length-1), i -> substring(text,
  * i, 2))` higher-order formulation, which interprets the lambda per
  * position AND rescans the string per substring call (O(n²) per doc).
  * Output strings are identical (character semantics, like SQL
  * substr); strings shorter than two characters yield an empty array.
  */
case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"char_pairs requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CharPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
  override def prettyName: String = "char_pairs"
}

object CharPairs {

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var i = 0
    while (i < n) { i += UTF8String.numBytesForFirstByte(bytes(i)); cnt += 1 }
    if (cnt < 2) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](cnt + 1)
    i = 0
    var c = 0
    while (i < n) { starts(c) = i; i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1 }
    starts(cnt) = n
    val res = new Array[Any](cnt - 1)
    var j = 0
    while (j < cnt - 1) {
      res(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + 2) - starts(j))
      j += 1
    }
    new GenericArrayData(res)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def charPairs(c: Column): Column =
    ColumnShim.column(CharPairs(ColumnShim.expression(c)))
}
