package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns using Spark's
  * array higher-order functions (`zip_with` + `aggregate`), evaluated as
  * a strict left-to-right fold.  The fold order is part of the contract:
  * identical IEEE-754 op order makes results bit-reproducible across
  * engines that evaluate the same expression shape (the DuckDB oracle
  * mirrors it with `list_sum(list_transform(...))`).
  */
object VectorFunctions {

  /** Element-wise cast to double (exact for float inputs). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product of two equal-length double arrays
    * (native codegen'd [[DotProduct]]; identical fold order to the HOF
    * formulation `aggregate(zip_with(a,b,_*_), 0.0, _+_)`).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; expression shape dot/(sqrt(aa)*sqrt(bb)) is kept
    * verbatim in the oracle SQL for bit-parity.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
