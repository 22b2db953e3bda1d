package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All LSH band keys of a MinHash signature in one pass: band b's key
  * is xxhash64 over signature positions [b·r, b·r+r) chained with the
  * band index — bit-identical to the
  * `xxhash64(slice(sig, b·r+1, r), b)` formulation (same XXH64
  * primitives, seed 42, int-typed band), but without the per-band
  * lambda interpretation and slice allocation of the higher-order
  * form.
  */
case class MinHashBandKeys(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_band_keys requires array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBandKeys.compute($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_keys"
}

object MinHashBandKeys {

  def compute(arr: ArrayData, bands: Int): ArrayData = {
    val n = arr.numElements()
    // a non-divisible signature would silently drop trailing positions;
    // bands > length would make every key the constant hashInt(b, 42)
    // and collapse the LSH join to all-pairs
    require(n % bands == 0 && n >= bands,
      s"signature length $n must be a positive multiple of bands=$bands")
    val rows = n / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      // xxhash64(array<long>, int) = fold hashLong over elements from
      // seed 42, then hashInt of the trailing int column
      var acc = 42L
      var k = 0
      while (k < rows) { acc = XXH64.hashLong(arr.getLong(b * rows + k), acc); k += 1 }
      acc = XXH64.hashInt(b, acc)
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def minhashBandKeys(c: Column, bands: Int): Column =
    ColumnShim.column(MinHashBandKeys(ColumnShim.expression(c), bands))
}
