package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NormalizeText

/** Optimizer rule: collapse nested [[NormalizeText]] applications —
  * `normalize_text(normalize_text(x))` ≡ `normalize_text(x)`.
  *
  * The transform is IDEMPOTENT by construction (NFC is idempotent, the
  * first pass leaves no control chars, no space runs and no edge
  * spaces for a second pass to touch — spec-pinned by property test),
  * and the nested shape arises naturally when pipeline stages compose:
  * an ingest layer normalizes defensively, then a dedup/fingerprint
  * stage normalizes ITS input defensively, and the library should
  * charge one corpus pass for that, not two.  Each collapsed call
  * saves a full NFC + rebuild over every row's text — at 100 TB of
  * documents that is a material scan-stage saving for a rewrite that
  * costs nothing to check.
  *
  * This is the `injectOptimizerRule` rung of the extension ladder
  * (function injection is [[graft.GraftExtensions]]'s registry; a
  * custom SparkStrategy remains deliberately unused — nothing in the
  * surface exceeds composition).  The rule runs in the operator-
  * optimization batch, AFTER any nesting is assembled by inlining and
  * alias resolution, so cross-stage compositions collapse too — a
  * same-column double-normalize split across a `.withColumn` chain or
  * a view boundary still folds to one call (spec-pinned through SQL
  * views).
  */
object CollapseIdempotentNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeText(inner @ NormalizeText(_)) => inner
    }
}
