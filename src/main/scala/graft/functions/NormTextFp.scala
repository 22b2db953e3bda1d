package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The exact-dup canonical form (`TextFunctions.normText`) as ONE
  * native pass — bit-identical to the r01–r19 builtin formulation
  *
  *   `trim(regexp_replace(regexp_replace(lower(text),
  *        "[^a-z0-9 ]+", " "), " +", " "))`
  *
  * which pays two full regex scans plus a lower/trim copy per call
  * (four string allocations per document).  This feeds md5 in the
  * fingerprint path of the whole exact-dedup family — dedup_exact
  * alone spent 1.1k task-seconds at sf10 warm with the regex chain in
  * its scan stage — so the constant factor is the query (guide §1.2
  * step 2: per-task work, after the plan shape is right).
  *
  * Equivalence argument (pinned adversarially in NormTextFpSpec, plus
  * a ScalaCheck property over arbitrary unicode strings): classify
  * each UTF-16 char of `lower(text)` as KEEP ([a-z0-9]) or OTHER
  * (space, junk — including each half of a surrogate pair).  The
  * builtin chain maps every OTHER run (junk runs → one space, space
  * runs collapse, mixed runs merge transitively) to exactly one
  * separating space, dropped at the ends by trim (Spark's trim strips
  * 0x20 only, and pass 1/2 output contains no other whitespace).  The
  * single pass below emits precisely that: a pending-separator flag
  * set by OTHER chars, flushed to one ' ' before the next KEEP char
  * once output has started.  Lowercasing is the same
  * `UTF8String.toLowerCase` the `Lower` expression calls.
  */
case class NormTextFp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"norm_text_fp requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NormTextFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormTextFp.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormTextFp =
    copy(newChild)
  override def prettyName: String = "norm_text_fp"
}

object NormTextFp {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toLowerCase.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSep = false
    var started = false
    var i = 0
    while (i < n) {
      val ch = str.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) {
        if (pendingSep && started) sb.append(' ')
        sb.append(ch)
        started = true
        pendingSep = false
      } else {
        pendingSep = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def normTextFp(c: Column): Column =
    ColumnShim.column(NormTextFp(ColumnShim.expression(c)))
}
