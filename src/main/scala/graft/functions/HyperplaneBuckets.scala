package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** All random-hyperplane LSH bucket keys of a vector in ONE native
  * pass: `tables × bits` sign-bit dot products against a seeded
  * gaussian plane matrix held as a reference object.
  *
  * Replaces the unrolled-literal formulation (each plane's 64 doubles
  * embedded in the plan, `tables·bits` separate dot_product calls):
  * identical buckets — the RNG stream is consumed in the same (table,
  * bit) order and each dot product folds strictly left-to-right like
  * [[DotProduct]], so every sign matches bit-for-bit (spec-pinned) —
  * but the plan shrinks from ~8·bits·64 literal nodes to one call,
  * and the per-row cost drops to a single cache-friendly loop over
  * the plane matrix.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tbl", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets requires array<double>, got $other")
    }

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBuckets.planesFor(tables, bits, seed)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], tables, bits, planes)

  // the kernel is an irreducible loop over the plane matrix; codegen
  // calls back through the reference object
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBuckets", this, classOf[HyperplaneBuckets].getName)
    defineCodeGen(ctx, ev, c => s"(${classOf[ArrayData].getName}) $ref.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {

  /** The plane matrix: `tables·bits` rows of 64 gaussians, the RNG
    * stream consumed in (table, bit) order — byte-identical to the
    * literal construction it replaces.
    */
  def planesFor(tables: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables * bits)(Array.fill(64)(rnd.nextGaussian()))
  }

  def compute(e: ArrayData, tables: Int, bits: Int, planes: Array[Array[Double]]): ArrayData = {
    val out = new Array[Any](tables)
    val ne = e.numElements()
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        val n = math.min(p.length, ne)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += p(i) * e.getDouble(i); i += 1 }
        if (acc > 0) bucket += 1L << (bits - 1 - b)
        b += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, bucket))
      t += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def hyperplaneBuckets(e: Column, tables: Int, bits: Int, seed: Long): Column =
    ColumnShim.column(HyperplaneBuckets(ColumnShim.expression(e), tables, bits, seed))
}
