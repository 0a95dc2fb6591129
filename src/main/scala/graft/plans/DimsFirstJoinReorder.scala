package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Size-aware dim-first join reordering (the q06 ×1000 lesson made an
  * ENGINE property instead of an authoring convention): Spark executes
  * inner-join chains as written (CBO join reorder needs catalog rowCount
  * stats that plain parquet scans don't carry), so a user who declares
  * `fact.join(fact2).join(dim)...` runs the fact-fact exchange BEFORE any
  * dim selectivity applies — r11 measured that cliff at 5× (99 s vs
  * 19.5 s at ×1000) on the q06 shape. This rule floats each much-smaller
  * relation below the big join, onto the side its join condition
  * references, by the local rotation
  *
  *   (A ⋈ B) ⋈ dim   →   A ⋈ (B ⋈ dim)     when dim's condition only
  *                                           references B (symmetric for A)
  *
  * applied bottom-up to a fixed point, which turns a fact-first chain
  * `((li ⋈ ord) ⋈ cust) ⋈ nat ⋈ reg` into the dims-first
  * `li ⋈ (((ord ⋈ cust) ⋈ nat) ⋈ reg)` — each wide fact row shuffles
  * ONCE, against the fully-reduced dim subtree.
  *
  * Why a local rotation and not a global greedy reorder: without NDV/
  * rowCount stats a size-ordered greedy rebuild can create expanding
  * intermediate joins (e.g. pairing two dims on a 25-key nation column
  * multiplies them); the rotation only ever moves a relation DOWN onto the
  * side it is already keyed to, so every rewritten plan joins exactly the
  * pairs the author's plan joined, in a cheaper order. Inner joins
  * commute/associate, so the row set is unchanged at every scale; output
  * column order is restored by a Project when the rotation would permute
  * it.
  *
  * Scope guards (all must hold):
  *  - both joins Inner with conditions, both hints `JoinHint.NONE` — a
  *    hand-hinted plan (q05/q06's `broadcast(...)`) is the author's call
  *    and is never touched;
  *  - deterministic conditions; no streaming side (state/watermark
  *    semantics depend on the declared shape);
  *  - `dim` at most 1/[[SizeRatio]] of the side it leaves (plan-stats
  *    sizeInBytes — the same estimate the broadcast planner uses), so the
  *    rotation only fires where the asymmetry is real. RELATIVE size, not
  *    the broadcast threshold: the ×1000 q06 replica's customer (~300 MB)
  *    is far above broadcast yet is exactly the relation that must join
  *    before the 600 M-row lineitem exchange;
  *  - the dim's condition contains at least one `EqualTo` conjunct (the
  *    shuffle/broadcast-plannable FK shape) and references exactly one
  *    side of the inner join.
  *
  * Gated on `spark.graft.joinReorder.dimsFirst` (GraftSession sets true).
  * Fixed-point safe: each rotation strictly deepens the moved relation and
  * re-matching on the rotated output is blocked by the size guards.
  */
case class DimsFirstJoinReorder() extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.joinReorder.dimsFirst"
  /** Rotate only when the moved relation is ≤ 1/8 of the side it leaves. */
  private val SizeRatio = 8L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(confKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(PrunedJoin(a, b, cond1), dim, Inner, Some(cond2), JoinHint.NONE)
          if cond1.deterministic && cond2.deterministic &&
            !j.isStreaming && hasEquiConjunct(cond2) =>
        val refs = cond2.references
        val touchesA = refs.intersect(a.outputSet).nonEmpty
        val touchesB = refs.intersect(b.outputSet).nonEmpty
        // Only rotate onto a receiving side that would itself SHUFFLE: if
        // that side is broadcast-sized, the inner join is a build-side
        // BHJ with no exchange for the rotation to pre-empt — and nesting
        // the dim under it replaces a broadcastable LEAF with a join
        // whose product-estimate the static planner can't size, LOSING
        // the broadcast (r12 ×1000: the bushy cust⋈nat cluster cost q182
        // an extra 150M-record orders shuffle, 30 s vs q06's 20 s).
        if (touchesB && !touchesA && muchSmaller(dim, a) && !broadcastable(b)) {
          project(j.output,
            Join(a, Join(b, dim, Inner, Some(cond2), JoinHint.NONE),
              Inner, Some(cond1), JoinHint.NONE))
        } else if (touchesA && !touchesB && muchSmaller(dim, b) &&
            !broadcastable(a)) {
          project(j.output,
            Join(Join(a, dim, Inner, Some(cond2), JoinHint.NONE), b,
              Inner, Some(cond1), JoinHint.NONE))
        } else j
    }
  }

  /** Would the planner broadcast this side (size estimate at or under the
    * session's autoBroadcastJoinThreshold)? */
  private def broadcastable(p: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t > 0 && p.stats.sizeInBytes <= t
  }

  /** `small` must be at most 1/SizeRatio of `big` by plan-stats size. */
  private def muchSmaller(small: LogicalPlan, big: LogicalPlan): Boolean = {
    val s = small.stats.sizeInBytes
    val b = big.stats.sizeInBytes
    s >= 0 && b >= 0 && s * SizeRatio <= b
  }

  private def hasEquiConjunct(cond: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).exists {
      case EqualTo(_: Attribute, _: Attribute) => true
      case _ => false
    }
  }

  /** Restore the original output order; skip the wrapper when the rotation
    * already yields it (ColumnPruning re-prunes either way). */
  private def project(out: Seq[Attribute], p: LogicalPlan): LogicalPlan =
    if (p.output == out) p else Project(out.map(_.asInstanceOf[NamedExpression]), p)

  /** The inner join, seen through attribute-only Projects — both the ones
    * ColumnPruning inserts between nested joins and this rule's own
    * output-order wrappers can STACK within one optimizer iteration
    * (CollapseProject only merges them on the next pass), so strip all of
    * them, not just one. */
  private object PrunedJoin {
    @scala.annotation.tailrec
    private def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) =>
        strip(child)
      case other => other
    }
    def unapply(p: LogicalPlan): Option[(LogicalPlan, LogicalPlan, Expression)] =
      strip(p) match {
        case Join(a, b, Inner, Some(c), JoinHint.NONE) => Some((a, b, c))
        case _ => None
      }
  }
}
