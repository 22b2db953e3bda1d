package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string's UTF-8 bytes — the
  * compression-ratio quality signal (a la the MassiveText/RefinedWeb
  * curation recipes): natural prose compresses to a mid-range
  * fraction, boilerplate/templated spam compresses far below it, and
  * random-character noise barely compresses at all, so both tails of
  * deflate_len/raw_len are curation targets that token-level
  * statistics ([[RepetitionStats]]) partially miss — deflate's LZ77
  * window catches long-range and sub-token redundancy too.
  *
  * Pinned codec parameters (level 6, raw stream / nowrap, default
  * strategy) make the length a pure function of the bytes for a given
  * zlib build; the JRE bundles its own zlib, so results are stable
  * across runs and machines on the same JRE line.  NOT SQL-replayable
  * (no deflate in the oracle engine) → rows-only driver checks, with
  * the spec pinning an independent JVM replay bit-for-bit.
  *
  * Native expression (one pass, no UDF): a fresh Deflater per row —
  * ~µs-scale setup against ~100 µs+ of compression for typical docs;
  * pooling would trade that for thread-affinity state in codegen.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_len requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(newChild)
  override def prettyName: String = "deflate_len"
}

object DeflateLen {
  /** Level 6 (zlib default): the standard speed/ratio knee; raw
    * deflate (nowrap) drops the 6-byte zlib envelope so tiny inputs
    * aren't dominated by framing.
    */
  final val Level = 6

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def deflateLen(c: Column): Column =
    ColumnShim.column(DeflateLen(ColumnShim.expression(c)))
}
