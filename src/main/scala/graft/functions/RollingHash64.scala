package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial rolling hash of a string's UTF-8 bytes:
  * h = Σ bᵢ·P^(n−1−i) mod 2⁶⁴ with P = 1000000007.  The content
  * fingerprint used for cheap document identity / shift-tolerant
  * chunk hashing (the per-window incremental form reuses the same
  * polynomial).  Native expression: one pass over the bytes.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RollingHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(newChild)
  override def prettyName: String = "rolling_hash64"
}

object RollingHash64 {
  final val P = 1000000007L

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * P + (bytes(i) & 0xffL); i += 1 }
    h
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def rollingHash64(c: Column): Column =
    ColumnShim.column(RollingHash64(ColumnShim.expression(c)))
}
