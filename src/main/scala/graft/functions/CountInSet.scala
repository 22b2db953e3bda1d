package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Number of elements of an `array<string>` column that occur in a
  * static vocabulary (with multiplicity).  Equivalent to
  * `size(filter(arr, x => x.isin(words)))` but one hash probe per
  * element instead of an interpreted lambda with a linear isin scan —
  * the hot path of stopword-ratio quality scoring.
  */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_in_set requires array<string>, got $other")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  // interpreted eval is already a tight loop; fall back for codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInSet", this, classOf[CountInSet].getName)
    defineCodeGen(ctx, ev, c => s"(Integer) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
  override def prettyName: String = "count_in_set"
}

object CountInSet {
  import org.apache.spark.sql.graftshim.ColumnShim
  def countInSet(c: Column, words: Seq[String]): Column =
    ColumnShim.column(CountInSet(ColumnShim.expression(c), words))
}
