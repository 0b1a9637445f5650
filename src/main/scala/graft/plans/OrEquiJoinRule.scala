package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `left LEFT JOIN right ON p1 OR p2 OR ... pn` (all pk
  * equi-predicates) => union of hash-joinable branches.
  *
  * This is the plan-level form of [[graft.operators.OrEquiJoin]] (SURVEY.md
  * §4): with the rule enabled, ANY query — SQL text, naive DataFrame code,
  * the Sparkify parity path — gets the rewrite without calling the
  * operator. Catalyst cannot key a hash join on a disjunction and falls
  * back to BroadcastNestedLoopJoin, O(|L| x |R|); the rewrite produces:
  *
  *   branch k (k=1..n): left INNER JOIN right_k ON pk AND NOT(p1..p(k-1))
  *                      — each matched pair lands in exactly one branch
  *   branch n+1:        left ANTI p1 ANTI p2 ... ANTI pn, null-extended
  *                      — the left-outer null complement
  *
  * Multiset-equivalent to the OR join unconditionally (no distinct
  * required downstream). Every `right` re-use is refreshed via
  * `MultiInstanceRelation.newInstance` + `transformUpWithNewOutput`, the
  * same mechanism the analyzer uses to deduplicate self-joins, so no
  * duplicate expression ids appear in one branch tree. The union's first
  * branch reuses the original child attribute ids, so downstream
  * references resolve unchanged; Union merges nullability with the
  * null-literal branch, restoring the left-outer nullability contract.
  *
  * Guarded by `spark.graft.rewriteOrJoin` (default false: the engine's
  * own operators already use the explicit rewrite; the rule is the
  * opt-in safety net for user-authored plans).
  */
object OrEquiJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rewriteOrJoin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, LeftOuter, Some(cond), _)
          if splitsIntoEquiDisjuncts(cond, left, right) =>
        rewrite(left, right, splitDisjunctivePredicates(cond))
    }
  }

  private def splitsIntoEquiDisjuncts(cond: Expression,
                                      left: LogicalPlan, right: LogicalPlan): Boolean = {
    val parts = splitDisjunctivePredicates(cond)
    parts.length >= 2 && parts.forall {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case _ => false
    } && cond.deterministic
  }

  /** Fresh copy of a subplan: new expression ids throughout, plus the
    * old-output -> new-output attribute map for condition remapping. */
  private def freshen(p: LogicalPlan): (LogicalPlan, AttributeMap[Attribute]) = {
    val fresh = p.transformUpWithNewOutput {
      case m: MultiInstanceRelation =>
        val f = m.newInstance().asInstanceOf[LogicalPlan]
        (f, m.asInstanceOf[LogicalPlan].output.zip(f.output))
    }
    (fresh, AttributeMap(p.output.zip(fresh.output)))
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      preds: Seq[Expression]): LogicalPlan = {
    def notYet(ps: Seq[Expression]): Option[Expression] =
      if (ps.isEmpty) None
      else Some(Not(Coalesce(Seq(ps.reduce(Or), Literal(false)))))

    // branch 1 keeps the ORIGINAL right (its ids become the union output)
    val branches = preds.zipWithIndex.map { case (p, k) =>
      if (k == 0) {
        Join(left, right, Inner, Some(p), JoinHint.NONE): LogicalPlan
      } else {
        val (freshRight, m) = freshen(right)
        def remap(e: Expression): Expression =
          e.transform { case a: Attribute => m.getOrElse(a, a) }
        val cond = And(remap(p), remap(notYet(preds.take(k)).get))
        Join(left, freshRight, Inner, Some(cond), JoinHint.NONE)
      }
    }

    // null-complement branch: anti-join chain, one fresh right per pred
    val unmatched = preds.foldLeft(left) { (acc, p) =>
      val (freshRight, m) = freshen(right)
      val cond = p.transform { case a: Attribute => m.getOrElse(a, a) }
      Join(acc, freshRight, LeftAnti, Some(cond), JoinHint.NONE)
    }
    val nullExtended = Project(
      left.output ++ right.output.map(a =>
        Alias(Literal(null, a.dataType), a.name)()),
      unmatched)

    Union(branches :+ nullExtended)
  }
}
