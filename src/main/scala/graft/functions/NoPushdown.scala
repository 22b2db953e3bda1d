package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports itself NON-DETERMINISTIC so the
  * optimizer may not push, reorder, or duplicate the enclosing
  * predicate — the JVM-expression counterpart of the guide's
  * `udf.asNondeterministic()` remedy for duplicated/expensive
  * predicate evaluation (§4.4 of the optimization playbook).
  *
  * Why it exists (r20 measurement, corpus_clean at sf10): a filter on
  * a COMPUTED signal column (`quality >= 0.5`,
  * `dup_2gram_frac < 0.5`) is pushed by `PushPredicateThroughNonJoin`
  * below the [[graft.sources.Scan.widen]] round-robin exchange,
  * substituting the full signal expression into a Filter that runs at
  * the parquet scan's effective width — ONE task on a one-row-group
  * export (24.6 s and 37.7 s single-task stages, task ≈ wall, while
  * 31 cores idled), with the signal then RE-computed above the
  * exchange for the output projection.  Wrapping the predicate in
  * `NoPushdown` keeps the filter exactly where it was written — above
  * the signal projection, above the widening exchange — so the signal
  * is computed ONCE, at cluster width.
  *
  * The non-determinism claim is a statement to the OPTIMIZER, not
  * about values: evaluation is a pure pass-through of the child, so
  * retries/replays/speculative tasks see identical results and the
  * wrapped query's output is bit-identical to the unwrapped form (the
  * oracle gate re-proves this).  The cost is only the optimizations
  * pushdown could have bought — nothing for these call sites, where
  * the filter's input is derived per-row compute that parquet can
  * never prune on.  Use ONLY on predicates over expensive derived
  * columns; a pushable predicate over stored columns must stay bare so
  * it reaches `PushedFilters`.
  */
case class NoPushdown(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the optimizer consults deterministic (false here) before moving or
  // collapsing the enclosing predicate; initialization is a no-op
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): NoPushdown =
    copy(newChild)
  override def prettyName: String = "no_pushdown"
}

object NoPushdown {
  import org.apache.spark.sql.graftshim.ColumnShim
  def noPushdown(c: Column): Column = ColumnShim.column(NoPushdown(ColumnShim.expression(c)))
}
