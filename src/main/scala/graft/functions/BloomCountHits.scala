package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Number of elements of an `array<string>` column that MIGHT be in a
  * pre-built Bloom filter (with multiplicity) — the probe half of the
  * broadcast-sketch membership idiom ([[CountInSet]]'s shape with a
  * bloom probe instead of an exact hash set, for reference sets too
  * large to ship verbatim).  One-sided by construction: a true member
  * always counts (no false negatives); a non-member counts with the
  * filter's fpp.  Probes use the element's UTF-8 bytes
  * (`mightContainBinary`), matching a filter built with `putBinary`
  * over the same encoding.
  *
  * The serialized filter rides the expression as a plain byte array
  * (one copy per plan, shipped once per executor with the codegen
  * references, never per row) and deserializes lazily on first probe.
  */
case class BloomCountHits(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_count_hits requires array<string>, got $other")
    }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
        bf.mightContainBinary(arr.getUTF8String(i).getBytes)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCountHits", this, classOf[BloomCountHits].getName)
    defineCodeGen(ctx, ev, c => s"(Integer) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomCountHits =
    copy(child = newChild)
  override def prettyName: String = "bloom_count_hits"
}

object BloomCountHits {
  import org.apache.spark.sql.graftshim.ColumnShim

  def bloomCountHits(c: Column, bf: BloomFilter): Column = {
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    ColumnShim.column(BloomCountHits(ColumnShim.expression(c), baos.toByteArray))
  }
}
