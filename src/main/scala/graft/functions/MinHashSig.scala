package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set in one pass over the input.
  *
  * Uses the standard two-hash construction (Kirsch–Mitzenmacher: the
  * family h_i = h1 + i·h2 preserves MinHash accuracy — "Less Hashing,
  * Same Performance", 2006): each element is hashed twice with murmur3
  * and the i-th permutation minimum is folded from h1 + i·h2.  A native
  * Catalyst expression because the higher-order-function formulation
  * (transform × sequence × array_min) interprets 128 lambda closures
  * per element — two orders of magnitude more per-row overhead than
  * this tight loop over `ArrayData`.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s: UTF8String = arr.getUTF8String(i)
        // unsigned 32-bit lanes with mod-2^32 wraparound: without the
        // mask the i·h2 term grows monotonically and one extreme-h2
        // element dominates every position, correlating the signature
        val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x12345678).toLong & 0xffffffffL
        val h2 = (Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x87654321).toLong & 0xffffffffL) | 1L
        var k = 0
        var h = h1
        while (k < numHashes) {
          if (h < mins(k)) mins(k) = h
          h = (h + h2) & 0xffffffffL
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def minhashSig(c: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(c), numHashes))
}
