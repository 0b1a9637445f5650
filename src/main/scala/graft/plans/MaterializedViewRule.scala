package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DataType
import org.apache.hadoop.fs.Path
import graft.operators.MaterializedView
import graft.operators.MaterializedView.{MvAgg, MvDef}

/** Optimizer rule: route a grouped aggregate over a registered view's
  * base scan to the persisted view table.
  *
  *   Aggregate(G, [G..., f1(c1), f2(c2)...], Scan(basePath))
  *     =>  Project(outputs re-aliased to the ORIGINAL expr ids,
  *                 Scan(mvPath))
  *
  * when a registered [[MaterializedView.MvDef]] has the same base path,
  * the same grouping column set, and every aggregate expression matches
  * one of the view's declared [[MvAgg]] shapes (count_star / count /
  * sum / min / max over a bare column, with at most one cast — the
  * self-maintainable family). The rewrite preserves the query's own
  * output names and expression ids, so parents resolve unchanged; the
  * view relation is `newInstance()`d per rewrite so two routed
  * aggregates in one plan never share attribute ids.
  *
  * Soundness gates, all of which fall back to the un-rewritten plan:
  *  - routing is opt-in (`spark.graft.rewriteMaterializedViews`);
  *  - the base's CURRENT file fingerprint must equal the one snapshotted
  *    at create/refresh (a mutated base silently stops routing — results
  *    are never a function of freshness bookkeeping);
  *  - aggregate expressions must be non-distinct, unfiltered, and typed
  *    identically to the stored view column (a distinct or filtered
  *    aggregate is NOT derivable from stored partials);
  *  - between the aggregate and the scan: Projects that pass attributes
  *    or alias deterministic expressions (column pruning and the
  *    optimizer's pulled-out grouping expressions), plus Filters whose
  *    predicates touch ONLY bare grouping columns — those select whole
  *    groups, so they re-apply to the view's rows verbatim
  *    (`WHERE event_type = 'click' ... GROUP BY event_type` routes; a
  *    predicate over any aggregated column, or over a derived grouping
  *    dimension's input, stands down).
  *
  * At 100 TB this is the difference between scanning the base and
  * scanning a |groups|-row table; the staleness probe is one base file
  * listing (O(1) manifest read when the base is snapshot-versioned).
  */
object MaterializedViewRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rewriteMaterializedViews"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    if (MaterializedView.registered.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        rewrite(agg).getOrElse(agg)
    }
  }

  /** Why-didn't-it-route, per aggregate × registered view — the
    * operability face of the soundness gates. Runs the SAME checks the
    * rewrite runs, in order, and names the first one that fails, so a
    * user staring at a direct-scan plan gets "stale since last
    * refresh/absorb" instead of silence. Works off the ANALYZED plan
    * (diagnosis must not depend on which optimizer rules already
    * fired). */
  def diagnose(df: org.apache.spark.sql.Dataset[_]): Seq[String] = {
    val spark = df.sparkSession
    val views = MaterializedView.registered.values.toSeq.sortBy(_.name)
    val flagOn = spark.conf.get(ConfKey, "false").toBoolean
    val aggs = df.queryExecution.analyzed.collect { case a: Aggregate => a }
    val header =
      (if (!flagOn) Seq(s"routing disabled: set $ConfKey=true") else Nil) ++
        (if (views.isEmpty) Seq("no materialized views registered") else Nil) ++
        (if (aggs.isEmpty) Seq("no aggregate in the plan") else Nil)
    val rows = for (agg <- aggs; d <- views) yield {
      val verdict = coreOf(agg.child) match {
        case None =>
          "no servable scan/join under the aggregate (non-Project/Filter operator in between)"
        case Some(core) =>
          if (!coreMatches(spark, d, core))
            s"input shape differs (view is over ${d.basePath}" +
              d.join.map(j => s" ⋈ ${j.rightPath}").getOrElse("") + ")"
          else if (!core.filters.forall(groupOnlyPredicate(_, d, core.env)))
            "a pre-aggregation filter touches a non-grouping column"
          else if (!groupingMatches(agg, d, core.left, core.env))
            "grouping differs from the view's declared dimensions"
          else if (!aggregatesMatch(agg, d, core.left, core.env))
            "an aggregate expression is not served by the view's stored columns"
          else if (!MaterializedView.isFresh(spark, d.name))
            "view is STALE: an input changed since the last create/refresh/absorb"
          else "routable"
      }
      s"view '${d.name}': $verdict"
    }
    header ++ rows
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val spark = SparkSession.active
    for {
      core <- coreOf(agg.child)
      mv <- MaterializedView.registered.values.find(d =>
        coreMatches(spark, d, core) &&
          core.filters.forall(groupOnlyPredicate(_, d, core.env)) &&
          groupingMatches(agg, d, core.left, core.env) &&
          aggregatesMatch(agg, d, core.left, core.env) &&
          MaterializedView.isFresh(spark, d.name))
      routed <- route(agg, mv, core.left, core.env, core.filters)
    } yield routed
  }

  /** The servable sub-plan under the aggregate: a base scan, or an
    * INNER equi-join of two base scans (the star-rollup shape a
    * join-backed view stores), with the alias environment and the
    * collected pre-aggregation filters from every layer. `conds` holds
    * the join's equi-pairs as (left-scan column, right-scan column). */
  private case class Core(left: LogicalRelation,
                          right: Option[LogicalRelation],
                          env: Map[ExprId, Expression],
                          filters: Seq[Expression],
                          conds: Seq[(String, String)])

  private def coreOf(plan: LogicalPlan): Option[Core] =
    unwrapOps(plan).flatMap { case (stop, env, filters) =>
      stop match {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          Some(Core(lr, None, env, filters, Nil))
        case j: Join if j.joinType == Inner && j.condition.isDefined =>
          for {
            (ls, lenv, lf) <- unwrapOps(j.left)
            lscan <- asScan(ls)
            (rs, renv, rf) <- unwrapOps(j.right)
            rscan <- asScan(rs)
            fullEnv = env ++ lenv ++ renv
            conds <- equiConds(resolveThrough(j.condition.get, fullEnv),
              lscan, rscan)
          } yield Core(lscan, Some(rscan), fullEnv,
            (filters ++ lf ++ rf).map(resolveThrough(_, fullEnv)), conds)
        case _ => None
      }
    }

  private def asScan(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some(lr)
      case _ => None
    }

  /** Conjunction of attribute equalities across the two scans, oriented
    * (left column, right column); anything else disqualifies. */
  private def equiConds(cond: Expression, l: LogicalRelation,
                        r: LogicalRelation): Option[Seq[(String, String)]] = {
    val pairs = splitConjunctivePredicates(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (l.outputSet.contains(a) && r.outputSet.contains(b))
          Some((a.name, b.name))
        else if (l.outputSet.contains(b) && r.outputSet.contains(a))
          Some((b.name, a.name))
        else None
      case _ => None
    }
    if (pairs.nonEmpty && pairs.forall(_.isDefined)) Some(pairs.flatten)
    else None
  }

  /** Does the core's input shape equal the view's declared inputs?
    * Join-backed views accept either join orientation (fact ⋈ dim or
    * dim ⋈ fact — the key pairs swap with it). */
  private def coreMatches(spark: SparkSession, d: MvDef,
                          core: Core): Boolean =
    d.join match {
      case None =>
        core.right.isEmpty && samePath(spark, d.basePath, core.left)
      case Some(jn) => core.right.exists { rscan =>
        val declared = jn.leftKeys.zip(jn.rightKeys).toSet
        val fwd = samePath(spark, d.basePath, core.left) &&
          samePath(spark, jn.rightPath, rscan) &&
          core.conds.toSet == declared
        val rev = samePath(spark, d.basePath, rscan) &&
          samePath(spark, jn.rightPath, core.left) &&
          core.conds.map(_.swap).toSet == declared
        fwd || rev
      }
    }

  /** A pre-aggregation filter is servable from the view iff it touches
    * ONLY bare grouping columns (after alias substitution): such a
    * predicate selects whole groups, so filtering the view's rows is
    * exactly filtering the base's groups. A predicate over any other
    * column — or over a derived grouping dimension's INPUT (hour
    * buckets cannot answer a raw-ts range) — stands down. */
  private def groupOnlyPredicate(cond: Expression, d: MvDef,
                                 env: Map[ExprId, Expression]): Boolean = {
    val resolved = resolveThrough(cond, env)
    resolved.deterministic && resolved.references.toSeq.forall {
      case a: AttributeReference => d.groupCols.contains(a.name)
      case _ => false
    }
  }

  /** Substitute projected aliases back into `e` so matching sees the
    * expression over the SCAN's attributes — the optimizer's
    * PullOutGroupingExpressions hoists non-attribute groupings into a
    * Project below the Aggregate as `_groupingexpression` columns, and
    * column-pruning Projects can alias too. */
  private def resolveThrough(e: Expression,
                             env: Map[ExprId, Expression]): Expression =
    e.transformUp {
      case a: AttributeReference if env.contains(a.exprId) => env(a.exprId)
    }

  /** The def's resolved group-expression template with its attribute
    * references re-bound BY NAME onto the query's own scan, so
    * semantic comparison sees one attribute id space. */
  private def remappedTemplate(template: Expression,
                               scan: LogicalRelation): Option[Expression] = {
    val byName = scan.output.map(a => a.name -> a).toMap
    var ok = true
    val r = template.transform {
      case a: AttributeReference =>
        byName.get(a.name) match {
          case Some(x) => x
          case None => ok = false; a
        }
    }
    if (ok) Some(r) else None
  }

  /** The stored column name of the group TEMPLATE `e` matches, if any. */
  private def templateFor(e: Expression, d: MvDef,
                          scan: LogicalRelation): Option[String] =
    d.groupTemplates.collectFirst {
      case (name, t) if remappedTemplate(t, scan).exists(_.semanticEquals(e)) =>
        name
    }

  /** Walk down through Projects that only pass attributes or alias
    * DETERMINISTIC expressions (column pruning and the optimizer's
    * pulled-out grouping expressions) and Filters (collected, judged
    * against the matched view later by [[groupOnlyPredicate]]),
    * accumulating the alias environment — every aliased expression
    * fully substituted toward the layer below. Stops at the first
    * other node, which [[coreOf]] then requires to be a scan or an
    * inner equi-join of scans. */
  private def unwrapOps(plan: LogicalPlan)
      : Option[(LogicalPlan, Map[ExprId, Expression], Seq[Expression])] =
    plan match {
      case Project(projList, child) if projList.forall {
            case _: AttributeReference => true
            case a: Alias => a.child.deterministic
            case _ => false
          } =>
        unwrapOps(child).map { case (stop, childEnv, filters) =>
          val here = projList.collect {
            case a: Alias => a.exprId -> resolveThrough(a.child, childEnv)
          }.toMap
          (stop, childEnv ++ here, filters)
        }
      case Filter(cond, child) =>
        unwrapOps(child).map { case (stop, childEnv, filters) =>
          (stop, childEnv, resolveThrough(cond, childEnv) +: filters)
        }
      case other => Some((other, Map.empty, Nil))
    }

  private def samePath(spark: SparkSession, basePath: String,
                       scan: LogicalRelation): Boolean = {
    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: Path): Path = {
      val fs = p.getFileSystem(hconf)
      p.makeQualified(fs.getUri, fs.getWorkingDirectory)
    }
    val want = qualified(new Path(basePath))
    val got = scan.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.map(qualified)
    got == Seq(want)
  }

  /** Every query grouping is either a bare declared column or matches a
    * declared group-expression template, and together they cover the
    * view's full grouping set exactly once — a query grouping COARSER
    * or FINER than the stored one is not servable. */
  private def groupingMatches(agg: Aggregate, d: MvDef,
                              scan: LogicalRelation,
                              env: Map[ExprId, Expression]): Boolean = {
    val matched = agg.groupingExpressions.map(resolveThrough(_, env)).map {
      case a: AttributeReference if d.groupCols.contains(a.name) => Some(a.name)
      case e => templateFor(e, d, scan)
    }
    val want = d.groupCols ++ d.groupExprs.map(_.name)
    matched.forall(_.isDefined) &&
      matched.flatten.toSet == want.toSet &&
      matched.size == matched.flatten.toSet.size
  }

  /** (func, inputCol, castTo) of a supported aggregate call, or None. */
  private def shapeOf(fn: AggregateFunction): Option[(String, String, Option[DataType])] = {
    def strip(e: Expression): Option[(String, Option[DataType])] = e match {
      case a: AttributeReference => Some((a.name, None))
      case c: Cast =>
        c.child match {
          case a: AttributeReference => Some((a.name, Some(c.dataType)))
          case _ => None
        }
      case _ => None
    }
    fn match {
      case s: Sum => strip(s.child).map { case (c, t) => ("sum", c, t) }
      case m: Min => strip(m.child).map { case (c, t) => ("min", c, t) }
      case m: Max => strip(m.child).map { case (c, t) => ("max", c, t) }
      case c: Count => c.children match {
        case Seq(Literal(1, _)) => Some(("count_star", "", None))
        case Seq(e) => strip(e).map { case (col, t) => ("count", col, t) }
        case _ => None
      }
      case _ => None
    }
  }

  private def declaredShape(a: MvAgg): (String, String, Option[DataType]) =
    (a.func, a.inputCol, a.castTo.map(DataType.fromDDL))

  /** The view's outCol serving this aggregate expression, if any. */
  private def servedBy(e: AggregateExpression, d: MvDef): Option[String] =
    e match {
      case AggregateExpression(fn, _, false, None, _) =>
        shapeOf(fn).flatMap { got =>
          d.aggs.find(a => declaredShape(a) == got).map(_.outCol)
        }
      case _ => None
    }

  private def aggregatesMatch(agg: Aggregate, d: MvDef,
                              scan: LogicalRelation,
                              env: Map[ExprId, Expression]): Boolean =
    agg.aggregateExpressions.forall {
      case a: AttributeReference if !env.contains(a.exprId) =>
        d.groupCols.contains(a.name)
      case Alias(ae: AggregateExpression, _) =>
        servedBy(mapAggChildren(ae, env), d).isDefined
      case al: Alias =>
        templateFor(resolveThrough(al.child, env), d, scan).isDefined
      case a: AttributeReference => // a pulled-out grouping expression
        templateFor(resolveThrough(a, env), d, scan).isDefined
      case _ => false
    }

  /** Resolve projected aliases inside an aggregate call's ARGUMENTS
    * (not the call itself). */
  private def mapAggChildren(ae: AggregateExpression,
                             env: Map[ExprId, Expression]): AggregateExpression =
    if (env.isEmpty) ae
    else ae.copy(aggregateFunction = ae.aggregateFunction
      .mapChildren(resolveThrough(_, env)).asInstanceOf[AggregateFunction])

  private def route(agg: Aggregate, d: MvDef, scan: LogicalRelation,
                    env: Map[ExprId, Expression],
                    filters: Seq[Expression]): Option[LogicalPlan] = {
    val inst = d.relation.newInstance()
    val byName = inst.output.map(a => a.name -> a).toMap
    // group-only predicates select whole groups, so they re-apply to
    // the view's rows verbatim — references re-bound by name
    val filtered: Option[LogicalPlan] =
      if (filters.isEmpty) Some(inst)
      else {
        var ok = true
        val rebound = filters.map(_.transform {
          case a: AttributeReference =>
            byName.get(a.name) match {
              case Some(mv) if mv.dataType == a.dataType => mv
              case _ => ok = false; a
            }
        })
        if (!ok) None
        else Some(Filter(rebound.reduce(And), inst))
      }
    val projected = agg.aggregateExpressions.map {
      case a: AttributeReference if !env.contains(a.exprId) =>
        byName.get(a.name).filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        servedBy(mapAggChildren(ae, env), d).flatMap(byName.get)
          .filter(_.dataType == al.dataType)
          .map(mv => Alias(mv, name)(exprId = al.exprId))
      case al: Alias =>
        templateFor(resolveThrough(al.child, env), d, scan)
          .flatMap(byName.get)
          .filter(_.dataType == al.dataType)
          .map(mv => Alias(mv, al.name)(exprId = al.exprId))
      case a: AttributeReference => // pulled-out grouping expression
        templateFor(resolveThrough(a, env), d, scan)
          .flatMap(byName.get)
          .filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case _ => None
    }
    if (projected.exists(_.isEmpty)) None // a type mismatch: stand down
    else filtered.map(child => Project(projected.flatten, child))
  }
}
