package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.{Cross, ExistenceJoin}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** Optimizer rule: hash-joinable `NOT IN (subquery)` over NULLABLE keys —
  * the last join family stock Spark still plans as a nested loop.
  *
  * `WHERE (a, b) NOT IN (SELECT x, y FROM r)` keeps a row iff
  * `(a=x AND b=y)` is FALSE for EVERY subquery row (three-valued logic:
  * a TRUE match excludes the row, and so does a NULL verdict — a null on
  * either side acts as a wildcard that prevents the definite mismatch
  * NOT IN requires). Stock RewritePredicateSubquery encodes this as
  * `Join(LeftAnti, cond OR ISNULL(cond))` — not an equi-join, so:
  * single-column NOT IN gets the special null-aware BroadcastHashJoin
  * ONLY when the subquery is broadcastable (a 100 TB subquery is not),
  * and MULTI-column NOT IN gets BroadcastNestedLoopJoin always,
  * O(|L|·|S|) compares with a broadcast of the whole subquery. This rule
  * replaces both with flags + hash existence joins:
  *
  *  - a 1-row GLOBAL AGGREGATE over the subquery computes the
  *    cardinality flags the 3VL semantics branch on: row count, and
  *    per-column/joint null counts (`cnt = 0` ⇒ every left row passes;
  *    a fully-null subquery row ⇒ no both-non-null left row passes;
  *    any `y NULL` row ⇒ no `a IS NULL` left row passes; ...). The
  *    single row cross-joins onto the left — the t12-class broadcast
  *    pattern, 1 row, never data-sized;
  *  - per LEFT null-class, matching reduces to hash EXISTENCE JOINS on
  *    the columns where BOTH sides are non-null: for (a,b) non-null,
  *    `∃(x=a ∧ y=b)`, `∃(x=a ∧ y IS NULL)`, `∃(y=b ∧ x IS NULL)`; for
  *    a-null rows, `∃(y=b)`; for b-null rows, `∃(x=a)`. Joins are built
  *    ONLY for classes that can occur (a non-nullable `a` skips the
  *    `∃(y=b)` join entirely), each probe side a fresh subquery copy
  *    pruned to its key columns;
  *  - one CASE verdict over the flags and existence attributes filters
  *    the left — the left side is scanned ONCE (no union of branches),
  *    every join is equi-keyed, and the subquery side shuffles by key
  *    instead of broadcasting wholesale.
  *
  * When every key is non-nullable on both sides, NOT IN degenerates to
  * NOT EXISTS and the rewrite emits ONE plain hash anti join instead of
  * the flags+existence plan (stock still nests even there — its
  * per-column `v=o OR ISNULL(v=o)` arms are built after the last
  * NullPropagation pass, so the BNLJ survives non-nullable schemas).
  *
  * Scope: uncorrelated, deterministic, 1- or 2-column NOT IN.
  * Stand-downs (stock handles them better or the rewrite does not
  * apply):
  *  - 3+ columns: the per-class decomposition needs an existence join
  *    per (left-null-set, right-null-set) pair — 3^n joins — and real
  *    NOT IN queries are 1–2 columns; documented stand-down, pinned by
  *    NullAwareAntiJoinRuleSpec ("3-column NOT IN stands down");
  *  - correlated subqueries (outer refs / pulled-up join conditions)
  *    and DomainJoin-carrying plans: stock's decorrelation machinery
  *    owns them (same reasoning as OrEquiJoinRule's EXISTS guard);
  *  - nondeterministic subplans or values: the rewrite re-evaluates the
  *    subquery in several roles (single-evaluation guard, same as
  *    OrEquiJoinRule's).
  *
  * Fires on the Filter BEFORE RewritePredicateSubquery builds the anti
  * join (that batch runs after every injected rule — the same Catalyst
  * sequencing the EXISTS rewrites in [[OrEquiJoinRule]] rely on).
  * Multiset-equivalence vs the stock plan is law-pinned in
  * NullAwareAntiJoinRuleSpec (randomized nullable fixtures, rule-on ≡
  * rule-off) and oracle-gated by `q99_not_in_null_aware`.
  *
  * Guarded by `spark.graft.rewriteNotIn`; armed in
  * [[graft.GraftSession.configure]] (the OrEquiJoinRule rationale: the
  * rule is the safety net for user-authored plans at scale).
  */
object NullAwareAntiJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rewriteNotIn"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformDown {
      case f @ NotInFilter(values, sub, rest) =>
        val rewritten = rewriteNotIn(f.child, values, sub)
        rest match {
          case Some(r) => Filter(r, rewritten)
          case None    => rewritten
        }
    }
  }

  /** A rewritable `NOT IN` conjunct of a filter condition: the left
    * value expressions, the subquery plan, and the remaining conjuncts. */
  private object NotInFilter {
    def unapply(f: Filter)
        : Option[(Seq[Expression], LogicalPlan, Option[Expression])] = {
      val conjuncts = splitConjunctivePredicates(f.condition)
      conjuncts.iterator.zipWithIndex.collectFirst {
        case (Not(InSubquery(values, lq: ListQuery)), i)
            if ok(values, lq, f.child) =>
          (values, lq.plan, i)
      }.map { case (vs, p, i) =>
        (vs, p, conjuncts.patch(i, Nil, 1).reduceOption(And))
      }
    }
  }

  private def ok(values: Seq[Expression], lq: ListQuery,
                 child: LogicalPlan): Boolean =
    values.length <= 2 &&
      lq.plan.resolved && lq.outerAttrs.isEmpty && lq.joinCond.isEmpty &&
      lq.plan.output.length == values.length &&
      values.forall(v => v.resolved && v.deterministic) &&
      AttributeSet(values.flatMap(_.references)).subsetOf(child.outputSet) &&
      lq.plan.outputSet.intersect(child.outputSet).isEmpty &&
      OrEquiJoinRule.deterministicPlan(child) &&
      OrEquiJoinRule.deterministicPlan(lq.plan) &&
      !lq.plan.exists(p => p.isInstanceOf[DomainJoin] ||
        p.expressions.exists(_.exists(_.isInstanceOf[OuterReference])))

  /** A fresh copy of the subquery, optionally filtered on a null-pattern
    * over its outputs, pruned to the key columns `keep`. */
  private def subCopy(sub: LogicalPlan, keep: Seq[Int],
                      filter: Seq[Attribute] => Option[Expression])
      : (LogicalPlan, Seq[Attribute]) = {
    val (f, m) = OrEquiJoinRule.freshen(sub)
    val outs = sub.output.map(a => m.getOrElse(a, a))
    val base = filter(outs) match {
      case Some(c) => Filter(c, f)
      case None    => f
    }
    val kept = keep.map(outs)
    (Project(kept, base), kept)
  }

  private def rewriteNotIn(child: LogicalPlan, values: Seq[Expression],
                           sub: LogicalPlan): LogicalPlan = {
    val n = values.length

    // All keys non-nullable on BOTH sides: NOT IN degenerates to NOT
    // EXISTS — one plain hash anti join on the conjunction of
    // equalities. (Stock STILL nests here for multi-column: Rewrite-
    // PredicateSubquery builds per-column `v=o OR ISNULL(v=o)` arms and
    // no NullPropagation pass runs after it to strip them, so the BNLJ
    // survives even when no null can ever occur — verified in
    // NullAwareAntiJoinRuleSpec.)
    if ((values ++ sub.output).forall(!_.nullable)) {
      val (probe, kept) = subCopy(sub, values.indices, _ => None)
      val cond = values.zip(kept)
        .map { case (v, o) => EqualTo(v, o): Expression }.reduce(And)
      return Join(child, probe,
        org.apache.spark.sql.catalyst.plans.LeftAnti, Some(cond),
        JoinHint.NONE)
    }

    // ---- the 1-row cardinality flags (one pass over the subquery) ----
    val (aggSrc, am) = OrEquiJoinRule.freshen(sub)
    val aggOuts = sub.output.map(a => am.getOrElse(a, a))
    def cntIf(cond: Expression, name: String): Alias =
      Alias(Count(If(cond, Literal(1), Literal.create(null, IntegerType)))
        .toAggregateExpression(), name)()
    val cnt = Alias(Count(Literal(1)).toAggregateExpression(), "__naaj_cnt")()
    val nullCnts: Seq[Alias] =
      aggOuts.zipWithIndex.map { case (o, i) =>
        cntIf(IsNull(o), s"__naaj_null$i")
      } ++ (if (n == 2)
        Seq(cntIf(And(IsNull(aggOuts(0)), IsNull(aggOuts(1))), "__naaj_both"))
      else Nil)
    val flags = Aggregate(Nil, cnt +: nullCnts, aggSrc)
    // 1-row cross: the t12-class broadcast pattern (PlanAudit-allowlisted
    // per consumer); never data-sized
    val wf = Join(child, flags, Cross, None, JoinHint.NONE)

    val cntA = cnt.toAttribute
    val nullA = nullCnts.map(_.toAttribute)
    def isZero(a: Attribute): Expression = EqualTo(a, Literal(0L))

    // ---- existence joins, only for left null-classes that can occur ----
    var acc: LogicalPlan = wf
    var k = 0
    def existsJoin(keep: Seq[Int],
                   filter: Seq[Attribute] => Option[Expression],
                   condOf: Seq[Attribute] => Expression): Expression = {
      val (pruned, kept) = subCopy(sub, keep, filter)
      // existence only cares about key PRESENCE: pre-aggregate the probe
      // to its distinct keys, bounding the build side by the key domain.
      // Load-bearing when a subquery column is a CONSTANT (q99's
      // 'BUILDING'): FoldablePropagation rewrites the join condition to
      // reference only the left, hash keying is lost, and the planner
      // falls back to a nested loop — measured 836 s at sf2 against the
      // raw 20k-row probe, trivial against its 1-row distinct.
      val probe = Aggregate(kept, kept, pruned)
      val ex = AttributeReference(s"__naaj_e$k", BooleanType,
        nullable = false)()
      k += 1
      acc = Join(acc, probe, ExistenceJoin(ex), Some(condOf(kept)),
        JoinHint.NONE)
      ex
    }

    val pass: Expression =
      if (n == 1) {
        // a IS NULL with a non-empty subquery is never definitely
        // mismatched -> only non-null a can pass, and only when no x
        // equals it and no x is NULL
        val eX = existsJoin(Seq(0), _ => None,
          ks => EqualTo(values(0), ks(0)))
        Or(isZero(cntA),
          And(IsNotNull(values(0)), And(isZero(nullA(0)), Not(eX))))
      } else {
        val Seq(v0, v1) = values
        val subNullable0 = sub.output(0).nullable
        val subNullable1 = sub.output(1).nullable
        // (a,b) both non-null: excluded by an exact pair, a half-null
        // wildcard row on either column, or a fully-null row
        val eXY = existsJoin(Seq(0, 1), _ => None,
          ks => And(EqualTo(v0, ks(0)), EqualTo(v1, ks(1))))
        val eXyNull: Expression =
          if (subNullable1)
            existsJoin(Seq(0), os => Some(IsNull(os(1))),
              ks => EqualTo(v0, ks(0)))
          else Literal(false)
        val eYxNull: Expression =
          if (subNullable0)
            existsJoin(Seq(1), os => Some(IsNull(os(0))),
              ks => EqualTo(v1, ks(0)))
          else Literal(false)
        val bothNullZero: Expression = isZero(nullA(2))
        val passNN = And(bothNullZero,
          Not(Or(eXY, Or(eXyNull, eYxNull))))
        // a NULL, b non-null: column a matches every row as a wildcard,
        // so exclusion reduces to column b: any y = b or any y NULL
        val passNullB: Expression =
          if (v0.nullable) {
            val eY = existsJoin(Seq(1), _ => None,
              ks => EqualTo(v1, ks(0)))
            And(isZero(nullA(1)), Not(eY))
          } else Literal(false)
        // a non-null, b NULL: the mirror — exclusion reduces to column a
        val passBNull: Expression =
          if (v1.nullable) {
            val eX = existsJoin(Seq(0), _ => None,
              ks => EqualTo(v0, ks(0)))
            And(isZero(nullA(0)), Not(eX))
          } else Literal(false)
        val verdict = CaseWhen(Seq(
          (And(IsNotNull(v0), IsNotNull(v1)), passNN),
          (And(IsNull(v0), IsNotNull(v1)), passNullB),
          (And(IsNotNull(v0), IsNull(v1)), passBNull)),
          Some(Literal(false)))
        Or(isZero(cntA), verdict)
      }

    Project(child.output, Filter(pass, acc))
  }
}
