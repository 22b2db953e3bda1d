package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass unigram concentration stats over a token array:
  * n_tokens, n_distinct, and Σ cnt² over the per-type counts — the
  * EXACT-INTEGER core of the Simpson/Herfindahl concentration index
  * (Σp² = Σcnt²/n²) and its inverse, the "effective vocabulary
  * size" n²/Σcnt².  Repeated-phrase spam concentrates mass in few
  * types (Σp² → 1); healthy prose spreads it (Σp² → 1/n_distinct).
  * Like [[RepetitionStats]] this is a per-document statistic, so
  * the 100 TB shape is a scan-local hash pass — never a corpus-wide
  * (doc, term) groupBy shuffle re-deriving per-doc counts.
  *
  * Keeping the SUM exact (longs) and leaving the single division to
  * the caller makes the downstream double IEEE-identical in any
  * engine that can sum integers — the oracle-exactness seam.
  */
case class TokenDiversity(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenDiversity.schema
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_diversity requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenDiversity.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenDiversity.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenDiversity =
    copy(child = newChild)
  override def prettyName: String = "token_diversity"
}

object TokenDiversity {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  private val Empty = UTF8String.fromString("")

  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) Empty else arr.getUTF8String(i)
      counts.merge(t, 1L, (a, b) => a + b)
      i += 1
    }
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); sumSq += c * c }
    new GenericInternalRow(Array[Any](n.toLong, counts.size.toLong, sumSq))
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def tokenDiversity(c: Column): Column =
    ColumnShim.column(TokenDiversity(ColumnShim.expression(c)))
}
