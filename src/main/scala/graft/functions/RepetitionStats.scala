package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics over a token array — the per-row
  * kernel of the Gopher-style repetition quality filters (duplicate
  * token mass, most-frequent-2-gram mass, duplicated-2-gram mass).
  * A per-document statistic needs no cross-document data, so the
  * correct 100 TB shape is THIS: a scan-local expression, never a
  * corpus-wide `groupBy(doc_id, gram)` shuffle re-deriving per-doc
  * counts from exploded rows.
  *
  * Output: struct<n_tokens, n_distinct, total_2grams, top_2gram,
  * dup_2grams> (all long, exact), from one hash pass over the tokens
  * (adjacent 2-grams keyed by space-join — tokens are
  * whitespace-split, so the join is unambiguous and matches the SQL
  * `tok[i] || ' ' || tok[i+1]` replay).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.schema
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  // the kernel is an irreducible hash loop; codegen embeds the call
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("total_2grams", LongType, nullable = false),
    StructField("top_2gram", LongType, nullable = false),
    StructField("dup_2grams", LongType, nullable = false)))

  private val Empty = UTF8String.fromString("")
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) Empty else arr.getUTF8String(i)
      i += 1
    }
    val distinct = new java.util.HashSet[UTF8String](math.max(8, n * 2))
    i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val grams = new java.util.HashMap[UTF8String, Long](math.max(8, n * 2))
    i = 0
    while (i < n - 1) {
      val g = UTF8String.concat(toks(i), Space, toks(i + 1))
      grams.put(g, grams.getOrDefault(g, 0L) + 1L)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = grams.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any](
      n.toLong, distinct.size.toLong, math.max(n - 1, 0).toLong, top, dup))
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def repetitionStats(c: Column): Column =
    ColumnShim.column(RepetitionStats(ColumnShim.expression(c)))
}
