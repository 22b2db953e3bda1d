package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the first transform of every text
  * curation pipeline, run before ANY hashing/shingling/dedup so that
  * byte-level artifacts of the crawl (combining-mark encodings, stray
  * control characters, ragged whitespace) can't split what is
  * semantically one document into several hash identities:
  *
  *   1. Unicode NFC (composed forms: `e` + U+0301 → `é`) — the
  *      standard canonical-equivalence collapse (UAX #15);
  *   2. C0 controls and DEL (U+0000–U+001F, U+007F — tabs and
  *      newlines included) become spaces;
  *   3. space runs collapse to one space; leading/trailing spaces
  *      drop.
  *
  * Steps 2–3 run in ONE pass over the NFC output (no intermediate
  * strings).  The exact composition is chosen to be replayable in
  * ANSI-ish SQL (`trim(regexp_replace(regexp_replace(nfc_normalize(t),
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))`), so the driver
  * oracle pins cross-engine byte equality via md5.  Unicode spaces
  * beyond ASCII (U+00A0 …) are deliberately left alone — they are
  * content in some languages; a harsher policy belongs upstream.
  *
  * Native codegen expression: stays inside whole-stage codegen, no
  * UDF boundary, null-safe.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"normalize_text requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(newChild)
  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  def compute(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val raw = nfc.charAt(i)
      val ch = if (raw < 0x20 || raw == 0x7f) ' ' else raw
      if (ch == ' ') {
        if (started) pendingSpace = true // leading spaces never start output
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing pendingSpace dropped
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def normalizeText(c: Column): Column =
    ColumnShim.column(NormalizeText(ColumnShim.expression(c)))
}
