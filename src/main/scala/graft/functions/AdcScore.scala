package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PQ asymmetric-distance (ADC) score: Σ_j tabs[j][codes[j]] over a
  * vector's sub-quantizer codes and a query's per-subspace lookup
  * tables.  One native eval per row instead of m nested `element_at`
  * trees — the difference matters because this expression is the
  * hot-path child of the top-k aggregate, whose update path evaluates
  * children in interpreted mode (TypedImperativeAggregate has no
  * codegen'd update), so per-eval cost multiplies by |Q|·|corpus|.
  */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_score requires (array<int>, array<array<double>>), got $other")
    }

  override def nullSafeEval(codes: Any, tabs: Any): Any =
    AdcScore.compute(codes.asInstanceOf[ArrayData], tabs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.AdcScore.compute($c, $t)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "adc_score"
}

object AdcScore {
  def compute(codes: ArrayData, tabs: ArrayData): Double = {
    val m = codes.numElements()
    // loud arity/bounds validation: the function is SQL-registered, and
    // UnsafeArrayData skips index asserts in production JVMs — an
    // unchecked bad code would read garbage memory, not throw
    if (m != tabs.numElements()) {
      throw new IllegalArgumentException(
        s"adc_score: $m codes vs ${tabs.numElements()} lookup tables")
    }
    var acc = 0.0
    var j = 0
    while (j < m) {
      val tab = tabs.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= tab.numElements()) {
        throw new IllegalArgumentException(
          s"adc_score: code $c out of range [0, ${tab.numElements()}) in subspace $j")
      }
      acc += tab.getDouble(c)
      j += 1
    }
    acc
  }

  def adcScore(codes: Column, tabs: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(AdcScore(ColumnShim.expression(codes), ColumnShim.expression(tabs)))
  }
}
