package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, LongType}

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
  * ==Aggregate-over-OR-join (the q81 plan, automatic)==
  *
  * The OR-join's OUTPUT is the quadratic object: a low-cardinality first
  * predicate emits |left|·|right|/|distinct keys| pairs, so at 10x the
  * data the join produces 100x the rows and no join algorithm beats its
  * own output size (q08: 43.9x at sf1). When the consumer is a
  * per-left-group aggregate of right columns —
  *
  *   Aggregate(g ⊆ left, count/sum/min/max(right cols),
  *             Join(left, right, LeftOuter, p1 OR .. OR pn))
  *
  * — the branch decomposition makes the expansion avoidable, and this
  * rule now reaches that plan AUTOMATICALLY (SQL text or naive
  * DataFrame code), not only via `OrEquiJoin.leftOrJoinAgg`:
  *
  *  - branch 0 carries no residual ("first satisfied predicate" by
  *    construction), so the right side pre-aggregates to one partial
  *    row per distinct join key BEFORE touching `left` — the exploding
  *    branch becomes a |left|-row join against a |keys|-row rollup;
  *  - branches 1..n-1 keep their joins (residuals reference left
  *    columns) but aggregate immediately, each |its own selectivity|-
  *    sized;
  *  - branch outputs partition the joined multiset, so group partials
  *    merge by SUM for count/sum and LEAST/GREATEST for min/max — no
  *    inclusion–exclusion;
  *  - branch 0's left join saw every left row, so its group set is
  *    complete; later partials attach by null-safe-equality left joins
  *    (a null group key is a group like any other, as groupBy treats
  *    it). Unmatched groups report count 0 / null min-max-sum — exactly
  *    the left-outer + aggregate semantics.
  *
  * Every stage is |left|- or |right|-sized PROVIDED the user wrote the
  * exploding (low-selectivity) predicate FIRST — branch 0 is the only
  * residual-free branch, so it is the only one whose right side can
  * pre-aggregate; a later exploding predicate keeps its pair-sized
  * branch join (the [[graft.operators.OrEquiJoin.leftOrJoinAgg]]
  * contract, same ordering guidance). An order-free form exists for
  * count/sum-only consumers (inclusion–exclusion over predicate
  * subsets, every term pre-aggregable) but breaks min/max and grows
  * 2^n terms; not implemented — choosing branch 0 by measured
  * selectivity would need plan-time data stats, which the §4
  * no-plan-time-jobs law forbids.
  *
  * The rewrite keeps the original output attribute ids (group attrs
  * pass through branch 0's untouched `left`; aggregate aliases are
  * re-issued under their original exprIds), so parent operators
  * resolve unchanged.
  * Equivalence is law-pinned in OrEquiJoinRuleSpec (randomized fixture
  * vs the nested-loop plan) and oracle-gated by `q82_or_join_auto`.
  *
  * Guarded by `spark.graft.rewriteOrJoin` (default false: the engine's
  * own operators already use the explicit rewrite; the rule is the
  * opt-in safety net for user-authored plans). Matching is top-down so
  * the Aggregate case wins over the bare-join case on the same subtree.
  */
object OrEquiJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rewriteOrJoin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    // transformDown: Aggregate(Join(OR)) must match BEFORE the bare Join
    // case consumes the child (transformUp would rewrite the join first
    // and the aggregate pattern would never be seen).
    plan.transformDown {
      case AggOverOrJoin(rewritten) => rewritten
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

  private def notYet(ps: Seq[Expression]): Option[Expression] =
    if (ps.isEmpty) None
    else Some(Not(Coalesce(Seq(ps.reduce(Or), Literal(false)))))

  // ---------------------------------------------------------------------
  // Aggregate-over-OR-join: eager aggregation through the branches.
  // ---------------------------------------------------------------------

  /** Extractor: builds the full eager-aggregation plan when every
    * applicability condition holds, None otherwise (the bare-join case
    * then fires on the child during the same top-down pass). */
  private object AggOverOrJoin {
    def unapply(plan: LogicalPlan): Option[LogicalPlan] = plan match {
      case a @ Aggregate(_, _, Join(l, r, LeftOuter, Some(cond), _), _)
          if splitsIntoEquiDisjuncts(cond, l, r) =>
        rewriteAgg(a, l, r, splitDisjunctivePredicates(cond))
      // ColumnPruning inserts an attribute-only Project between the
      // Aggregate and the Join; see through it (our rewrite references
      // only attributes the Aggregate itself references, all of which
      // survive any pruning Project by definition).
      case a @ Aggregate(_, _, Project(ps, Join(l, r, LeftOuter, Some(cond), _)), _)
          if ps.forall(_.isInstanceOf[Attribute]) &&
            splitsIntoEquiDisjuncts(cond, l, r) =>
        rewriteAgg(a, l, r, splitDisjunctivePredicates(cond))
      case _ => None
    }
  }

  /** One supported aggregate output: the original alias, the function
    * kind, and its (right-side) argument. */
  private sealed trait AggKind
  private case object CountK extends AggKind
  private case object SumK extends AggKind
  private case object MinK extends AggKind
  private case object MaxK extends AggKind
  private case object AvgK extends AggKind

  private case class AggOut(alias: Alias, kind: AggKind, arg: Expression)

  /** Primitive partials one output decomposes into: avg carries TWO
    * (sum, count) — the same (sum, count) device the MV rule serves
    * avg from; everything else carries one. */
  private sealed trait Prim
  private case object PCount extends Prim
  private case object PSum extends Prim
  private case object PMin extends Prim
  private case object PMax extends Prim

  private def primsOf(k: AggKind): Seq[Prim] = k match {
    case CountK => Seq(PCount)
    case SumK   => Seq(PSum)
    case MinK   => Seq(PMin)
    case MaxK   => Seq(PMax)
    case AvgK   => Seq(PSum, PCount)
  }

  private def rewriteAgg(a: Aggregate, left: LogicalPlan, right: LogicalPlan,
                         preds: Seq[Expression]): Option[LogicalPlan] = {
    // Group keys: plain left attributes only (covers SQL GROUP BY col and
    // DataFrame groupBy(col)); nonEmpty so no branch degenerates to a
    // 1-row cross-merged global aggregate.
    val groupAttrs = a.groupingExpressions.map {
      case at: Attribute if left.outputSet.contains(at) => at
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None

    val groupSet = AttributeSet(groupAttrs)

    // Classify each output: a group attribute (possibly aliased), or a
    // supported aggregate whose argument evaluates on `right` alone.
    // count(*)/count(1) is NOT decomposable this way (unmatched left rows
    // count 1 there, not 0) — the nonEmpty-references guard excludes it.
    val outs: Seq[Either[NamedExpression, AggOut]] = a.aggregateExpressions.map {
      case at: Attribute if groupSet.contains(at) => scala.Left(at)
      case al @ Alias(at: Attribute, _) if groupSet.contains(at) => scala.Left(al)
      // constant outputs (CollapseProject folds literal columns from a
      // parent select INTO the aggregate list): reference nothing, so
      // they pass through the final projection unchanged — rejecting
      // them silently demoted q82's plan to the pair-materializing
      // rewrite (34s vs 1.2s at sf1)
      case al @ Alias(e, _)
          if e.deterministic && e.references.isEmpty &&
            !e.exists(_.isInstanceOf[AggregateExpression]) =>
        scala.Left(al)
      case al @ Alias(AggregateExpression(fn, _, false, None, _), _) =>
        val kindArg = fn match {
          case Count(Seq(e)) => Some((CountK, e))
          case Sum(e, _)     => Some((SumK, e))
          case Min(e)        => Some((MinK, e))
          case Max(e)        => Some((MaxK, e))
          // decimal avg result types thread precision rules through the
          // sum-of-sums merge; keep the rewrite to the exactly-typed
          // non-decimal case and fall back to the join rewrite otherwise
          case Average(e, _) if !e.dataType.isInstanceOf[DecimalType] =>
            Some((AvgK, e))
          case _             => None
        }
        kindArg match {
          case Some((k, e))
              if e.deterministic && e.references.nonEmpty &&
                e.references.subsetOf(right.outputSet) =>
            scala.Right(AggOut(al, k, e))
          case _ => return None
        }
      case _ => return None
    }
    val aggs = outs.collect { case scala.Right(x) => x }
    if (aggs.isEmpty) return None

    // Normalize each disjunct to (leftKeyExpr, rightKeyExpr).
    val pairs = preds.map {
      case EqualTo(x, y) if x.references.subsetOf(left.outputSet) => (x, y)
      case EqualTo(x, y) => (y, x)
      case _ => return None
    }

    def fresh(p: Prim, e: Expression): AggregateFunction = p match {
      case PCount => Count(e)
      case PSum   => Sum(e)
      case PMin   => Min(e)
      case PMax   => Max(e)
    }
    // Merge partials of an already-partial column: counts re-merge by
    // SUM, sums by SUM, min/max by themselves.
    def merge(p: Prim, part: Expression): AggregateFunction = p match {
      case PCount | PSum => Sum(part)
      case PMin          => Min(part)
      case PMax          => Max(part)
    }
    def agg(fn: AggregateFunction): Expression = fn.toAggregateExpression()
    // Sum-of-Sum widens decimal precision (p+10 -> p+20); cast the
    // re-merged partial back to the single-level partial type so every
    // branch contributes the same type to the cross-branch merge.
    def sameType(e: Expression, dt: org.apache.spark.sql.types.DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt, Some(conf.sessionLocalTimeZone))

    // Flattened primitive partials: avg expands to (sum, count), the
    // rest to one slot; `offsets(i)` is output i's first slot.
    val flatPrims: Seq[(Prim, Expression)] =
      aggs.flatMap(ao => primsOf(ao.kind).map(p => (p, ao.arg)))
    val offsets: Seq[Int] =
      aggs.scanLeft(0)((acc, ao) => acc + primsOf(ao.kind).size)
    // Per-branch partial type: what ONE level of the primitive yields.
    val partialTypes = flatPrims.map { case (p, e) => fresh(p, e).dataType }

    // ---- branch 0: residual-free, so `right` pre-aggregates to one
    // partial row per distinct first-predicate key BEFORE joining left.
    val (l0, r0) = pairs.head
    val keyAlias = Alias(r0, "__orj_k0")()
    val preAliases = flatPrims.zipWithIndex.map { case ((p, e), i) =>
      Alias(agg(fresh(p, e)), s"__orj_p0_$i")()
    }
    val pre = Aggregate(Seq(r0), keyAlias +: preAliases, right)
    // Rows of `right` with a null key form a null pre-agg group that the
    // EqualTo join condition never matches — same as the OR join, where
    // a null key satisfies no predicate.
    val join0 = Join(left, pre, LeftOuter,
      Some(EqualTo(l0, keyAlias.toAttribute)), JoinHint.NONE)
    val b0Aliases = flatPrims.zipWithIndex.map { case ((p, _), i) =>
      Alias(sameType(agg(merge(p, preAliases(i).toAttribute)),
        partialTypes(i)), s"__orj_b0_$i")()
    }
    val b0 = Aggregate(groupAttrs, (groupAttrs: Seq[NamedExpression]) ++ b0Aliases, join0)

    // ---- branches 1..n-1: residuals reference left columns, so these
    // stay real joins — sized by their own predicate's selectivity — but
    // aggregate IMMEDIATELY, before any merge. Both sides are freshened:
    // the merge joins below would otherwise self-join duplicate ids.
    val parts = preds.indices.drop(1).map { k =>
      val (fl, lm) = freshen(left)
      val (fr, rm) = freshen(right)
      def remap(e: Expression): Expression = e.transform {
        case at: Attribute => rm.getOrElse(at, lm.getOrElse(at, at))
      }
      val cond = And(remap(preds(k)), remap(notYet(preds.take(k)).get))
      val jk = Join(fl, fr, Inner, Some(cond), JoinHint.NONE)
      val gk = groupAttrs.map(lm(_))
      val partAliases = flatPrims.zipWithIndex.map { case ((p, e), i) =>
        Alias(agg(fresh(p, remap(e))), s"__orj_b${k}_$i")()
      }
      (Aggregate(gk, (gk: Seq[NamedExpression]) ++ partAliases, jk), gk, partAliases)
    }

    // ---- merge: b0's group set is complete (its left join saw every
    // left row); later partials attach with null-safe left joins.
    val merged = parts.foldLeft(b0: LogicalPlan) { case (acc, (bk, gk, _)) =>
      val cond = groupAttrs.zip(gk)
        .map { case (g, gg) => EqualNullSafe(g, gg): Expression }
        .reduce(And)
      Join(acc, bk, LeftOuter, Some(cond), JoinHint.NONE)
    }

    // ---- final projection: original output names AND exprIds, so parent
    // operators resolve unchanged.
    val finalOuts: Seq[NamedExpression] = outs.map {
      case scala.Left(ne) => ne
      case scala.Right(ao) =>
        val i = aggs.indexOf(ao)
        // Branch partials sit on the RIGHT of the LeftOuter merge joins,
        // so they are nullable HERE even when the branch aggregate output
        // is not (count is non-nullable below the join). Claiming the
        // pre-join nullability would let NullPropagation fold away the
        // Coalesce/IsNull guards and corrupt unmatched groups.
        def slot(j: Int): Seq[Expression] =
          b0Aliases(j).toAttribute.withNullability(true) +:
            parts.map(_._3(j).toAttribute.withNullability(true))
        val partials = slot(offsets(i))
        // count is never null: missing partials are 0.
        def countTotal(ps: Seq[Expression]): Expression =
          ps.map(p => Coalesce(Seq(p, Literal(0L))): Expression)
            .reduce(Add(_, _))
        // SQL sum: null iff every branch partial is null.
        def sumTotal(ps: Seq[Expression], dt: org.apache.spark.sql.types.DataType): Expression = {
          val zero = Literal.default(ps.head.dataType)
          val total = ps
            .map(p => Coalesce(Seq(p, zero)): Expression).reduce(Add(_, _))
          If(IsNull(Coalesce(ps)), Literal.create(null, dt),
            sameType(total, dt))
        }
        val mergedExpr: Expression = ao.kind match {
          case CountK => countTotal(partials)
          case SumK   => sumTotal(partials, ao.alias.dataType)
          case MinK   => Least(partials)
          case MaxK   => Greatest(partials)
          case AvgK   =>
            // avg = merged sum / merged count, the MV rule's (sum, count)
            // device; non-decimal only, so the result type is double and
            // the division is Average.evaluateExpression's own shape.
            val sums = partials
            val cnts = slot(offsets(i) + 1)
            val cnt = countTotal(cnts)
            val sum = sumTotal(sums, sums.head.dataType)
            If(EqualTo(cnt, Literal(0L)),
              Literal.create(null, ao.alias.dataType),
              Divide(Cast(sum, ao.alias.dataType),
                Cast(cnt, ao.alias.dataType), EvalMode.LEGACY))
        }
        val cast = ao.kind match {
          case CountK => sameType(mergedExpr, LongType)
          case _      => sameType(mergedExpr, ao.alias.dataType)
        }
        Alias(cast, ao.alias.name)(exprId = ao.alias.exprId)
    }
    Some(Project(finalOuts, merged))
  }
}
