package graft.federation

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.federation.plans.FederatedPlan

/** Two-phase aggregation across federation boundaries — a scale feature
  * the reference does NOT have (its `FederationOptimizerRule` federates
  * whole single-provider subtrees only; an aggregate over a multi-provider
  * UNION runs entirely locally, shipping every remote row).
  *
  * Rewrite (the classic distributed combine, applied at the *logical*
  * layer so each partial lands inside a federable fragment):
  * {{{
  *   Agg[G, f(x)](Union(c1 .. cn))
  *     ==>  AggFinal[G, f'(p)](Union(AggPartial[G, f(x)](c1) .. ))
  * }}}
  * with COUNT → SUM of partial counts, SUM → SUM, MIN → MIN, MAX → MAX,
  * and AVG → SUM+COUNT partials recombined as `sum(ps) / sum(pc)`.
  * [[FederationRule]] (which runs right after this rule in the same batch)
  * then federates each per-provider partial into its remote engine, so
  * each provider ships one row per group instead of its whole table — at
  * 100 TB per provider this turns the wire cost from O(rows) into
  * O(groups × providers).
  *
  * Fires only when the union CANNOT federate wholesale (children span ≥2
  * providers, or mix remote and local) and at least one child is remote —
  * a single-provider union+agg is better shipped as one SQL, and
  * pure-local unions already get Spark's physical partial aggregation.
  * Local children also receive a logical partial: correctness requires
  * every union branch to feed combinable partials, and for a local branch
  * the rewrite coincides with the map-side combine Spark would do anyway.
  *
  * v2 surface: group keys may be plain columns OR arbitrary deterministic
  * scalar expressions over the union output (`GROUP BY upper(st)`). In
  * SQL-originated plans Catalyst's `PullOutGroupingExpressions` has
  * already extracted complex keys into a `_groupingexpression` column
  * pushed into the union children (so the plain-column path fires and the
  * key expression ships remotely inside the fragment); the direct
  * expression-key path (`__gk_` aliases) covers hand-built plans;
  * aggregate calls limited to non-DISTINCT, unfiltered
  * COUNT/SUM/MIN/MAX/AVG. AVG is restricted to non-decimal numeric input:
  * its partials are exact (integral SUM is a long; fractional SUM uses the
  * same double accumulator plain AVG uses), but a decimal AVG's
  * precision/rounding path (`DecimalType.bounded(p+4, s+4)` with
  * analyzer-inserted precision widening) is not reproducible with a
  * hand-built post-analysis Divide, so decimal AVG falls back to shipping
  * rows. DISTINCT aggregates are not combinable from partials. Aggregate
  * calls may sit inside arbitrary scalar expressions
  * (`CAST(SUM(x) AS DOUBLE)`, `SUM(a) / COUNT(*)`) as long as every
  * non-aggregate output subtree resolves to a group expression. Anything
  * else leaves the plan untouched.
  *
  * Idempotence: partial aliases carry the `__gp_` prefix; a union whose
  * children already aggregate such columns is not rewritten again, so the
  * fixpoint batch converges.
  */
object PartialAggRule extends Rule[LogicalPlan] {

  private val Marker = "__gp_"
  private val GroupMarker = "__gk_"
  private val DistinctMarker = "__gd_"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, u: Union, hint)
          if eligible(groupExprs, aggExprs, u) =>
        rewrite(agg, groupExprs, aggExprs, u, hint)
      case agg @ Aggregate(groupExprs, aggExprs, u: Union, hint)
          if eligibleDistinct(groupExprs, aggExprs, u) =>
        rewriteDistinct(agg, groupExprs, aggExprs, u, hint)
      // A chain of alias-only Projects between the aggregate and the
      // union hides the shape — most commonly Catalyst's column-pruning
      // Project stacked on the restore Project that
      // [[JoinUnionDistributeRule]] leaves over a distributed inner join
      // (dim columns aliased back to their pre-distribution exprIds).
      // Catalyst's own CollapseProject lives in earlier batches and never
      // runs mid-fixpoint here, so inline the projections into the
      // aggregate ourselves and re-check. Output exprIds are preserved:
      // substituted non-attribute outputs keep their name and id via a
      // same-id Alias.
      case agg @ Aggregate(groupExprs, aggExprs, p: Project, hint)
          if stripProjects(p).isInstanceOf[Union] => {
        var g2 = groupExprs
        var a2: Seq[NamedExpression] = aggExprs
        var cur: LogicalPlan = p
        var ok = true
        while (ok && cur.isInstanceOf[Project]) {
          val Project(list, inner) = cur: @unchecked
          if (!inlinable(list)) ok = false
          else {
            val sub: Map[ExprId, Expression] = list.map {
              case al: Alias => al.exprId -> al.child
              case ar: AttributeReference => ar.exprId -> (ar: Expression)
            }.toMap
            def substitute(e: Expression): Expression = e.transform {
              case ar: AttributeReference if sub.contains(ar.exprId) =>
                sub(ar.exprId)
            }
            g2 = g2.map(substitute)
            a2 = a2.map { ne =>
              substitute(ne) match {
                case n: NamedExpression if n.exprId == ne.exprId => n
                case other => Alias(other, ne.name)(exprId = ne.exprId,
                  qualifier = ne.qualifier)
              }
            }
            cur = inner
          }
        }
        cur match {
          case u: Union if ok && eligible(g2, a2, u) =>
            rewrite(Aggregate(g2, a2, u, hint), g2, a2, u, hint)
          case u: Union if ok && eligibleDistinct(g2, a2, u) =>
            rewriteDistinct(Aggregate(g2, a2, u, hint), g2, a2, u, hint)
          case _ => agg
        }
      }
    }

  /** Strip a chain of inlinable Projects (see [[inlinable]]). */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(list, c) if inlinable(list) => stripProjects(c)
    case other => other
  }

  /** Projection lists safe to inline: deterministic aliases / plain
    * attributes only (no aggregates or windows hiding inside). */
  private def inlinable(list: Seq[NamedExpression]): Boolean =
    list.forall {
      case al: Alias => al.deterministic &&
        !al.exists(e => e.isInstanceOf[AggregateExpression] ||
          e.isInstanceOf[WindowExpression])
      case _: AttributeReference => true
      case _ => false
    }

  // ------------------------------------------------------------ guards

  /** Structural + profitability checks shared by both rewrites. */
  private def sharedEligible(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union): Boolean = {
    if (u.byName || u.allowMissingCol || u.children.size < 2) return false
    // positional remap through the union collapses duplicate exprIds: a
    // first child projecting the same attribute twice would substitute the
    // wrong column into non-first children's partials
    if (u.output.map(_.exprId).distinct.size != u.output.size) return false
    // already rewritten (fixpoint convergence) — a partial that
    // FederationRule has since cut into a fragment counts too, so this
    // must look through FederatedPlan (whose inner root, for an
    // aggregate-topped fragment, IS the partial Aggregate)
    def partialMarked(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.aggregateExpressions.exists(ne =>
        ne.name.startsWith(Marker) || ne.name.startsWith(DistinctMarker))
      case f: FederatedPlan => partialMarked(f.inner)
      case _ => false
    }
    if (u.children.exists(partialMarked)) return false
    // GROUP-ONLY idempotence: a pure-dedup aggregate (no aggregate calls)
    // rewrites into per-arm dedups that carry NO __gp_/__gd_ marker — for
    // plain-attribute keys the partial is a bare `Aggregate [k],[k]`, and
    // once FederationRule absorbs it into the fragment the ORIGINAL shape
    // reappears verbatim, so the marker check above can never stop the
    // re-split and the fixpoint batch ping-pongs to Catalyst's iteration
    // cap (observed on every Dataset.count() over a federated GROUP BY:
    // 100 wasted optimizer iterations per query). Structural check
    // instead: if every arm already ends in a group-only aggregate on
    // exactly this aggregate's keys (remapped through the union — the
    // same positional remap the rewrite uses), the dedup has already been
    // pushed and this aggregate only re-dedups across arms.
    if (aggCallsOf(aggExprs).isEmpty) {
      def dedupedOnKeys(p: LogicalPlan,
          keys: Seq[Expression]): Boolean = p match {
        case a: Aggregate =>
          a.aggregateExpressions.length == a.groupingExpressions.length &&
            a.groupingExpressions.length == keys.length &&
            keys.forall(k =>
              a.groupingExpressions.exists(_.semanticEquals(k)))
        case f: FederatedPlan => dedupedOnKeys(f.inner, keys)
        case _ => false
      }
      val allDeduped = u.children.forall { child =>
        val remap: Map[ExprId, Attribute] =
          u.output.map(_.exprId).zip(child.output).toMap
        val childKeys = groupExprs.map(_.transform {
          case a: AttributeReference => remap.getOrElse(a.exprId, a)
        })
        dedupedOnKeys(child, childKeys)
      }
      if (allDeduped) return false
    }
    // shape: group keys are deterministic scalar expressions over the
    // union output (plain columns are the common special case). A
    // reference-free key (GROUP BY constant) is degenerate and excluded —
    // it could also collide with literals inside rebuilt combiners.
    if (!groupExprs.forall { g =>
      g.deterministic && g.references.nonEmpty &&
        !g.exists(_.isInstanceOf[AggregateExpression]) &&
        g.references.forall(a => u.output.exists(_.exprId == a.exprId))
    }) return false
    // shape: after substituting group-expression matches and nulling out
    // aggregate calls, an output may reference nothing else
    if (!aggExprs.forall { ne =>
      val body = ne match { case Alias(e, _) => e; case other => other }
      val residual = body.transformDown {
        case _: AggregateExpression => Literal(null)
        case sub if groupExprs.exists(_.semanticEquals(sub)) => Literal(null)
      }.references
      residual.isEmpty
    }) return false
    // profitability: the union can't federate wholesale, but at least one
    // child fragment can. effectiveScan (not scanResultOf): a child whose
    // semi-join build is an already-federated subquery fragment is still
    // Distinct after FederationRule's unwrap-and-regroup, and the partial
    // this rule inserts above it federates with it.
    val childResults = u.children.map(FederationRule.effectiveScan)
    val wholesale = ScanResult.merge(childResults)
    val someRemote = childResults.exists {
      case ScanResult.Distinct(p) => p != NopFederationProvider
      case _ => false
    }
    wholesale.isAmbiguous && someRemote
  }

  private def aggCallsOf(aggExprs: Seq[NamedExpression]): Seq[AggregateExpression] =
    aggExprs.flatMap { ne =>
      val body = ne match { case Alias(e, _) => e; case other => other }
      body.collect { case ae: AggregateExpression => ae }
    }

  private def eligible(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union): Boolean =
    aggCallsOf(aggExprs).forall(combinable) &&
      sharedEligible(groupExprs, aggExprs, u)

  /** DISTINCT branch: every DISTINCT call is unfiltered, a standard
    * function, and shares ONE argument list — so a single per-child dedup
    * on (group keys, args) feeds them all. The final aggregate reruns the
    * original DISTINCT calls over the deduped union (re-deduping across
    * children), so any function is exact; each provider ships
    * O(groups × distinct values) instead of O(rows). Non-distinct MIN/MAX
    * riders are admitted when their argument lies inside the dedup key
    * set (min/max are duplicate-insensitive — and Catalyst's
    * `EliminateDistinct` strips DISTINCT off them before this rule runs,
    * so `MIN(DISTINCT x)` arrives exactly this way). */
  private def eligibleDistinct(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union): Boolean = {
    val calls = aggCallsOf(aggExprs)
    val (distinct, plain) = calls.partition(_.isDistinct)
    if (distinct.isEmpty) return false
    val sharedArgs = distinct.head.aggregateFunction.children
    distinct.forall { ae =>
      ae.filter.isEmpty &&
        ae.aggregateFunction.children.forall(_.deterministic) &&
        (ae.aggregateFunction match {
          case _: Count | _: Sum | _: Min | _: Max | _: Average => true
          case _ => false
        }) && {
        val c = ae.aggregateFunction.children
        sharedArgs.size == c.size &&
          sharedArgs.zip(c).forall { case (x, y) => x.semanticEquals(y) }
      }
    } && plain.forall { ae =>
      ae.filter.isEmpty && (ae.aggregateFunction match {
        case _: Min | _: Max => ae.aggregateFunction.children.forall(c =>
          (groupExprs ++ sharedArgs).exists(_.semanticEquals(c)))
        case _ => false
      })
    } && sharedEligible(groupExprs, aggExprs, u)
  }

  private def combinable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Count | _: Min | _: Max => true
      case s: Sum => s.evalContext.evalMode != EvalMode.TRY // TRY-mode
      // partials can mask per-branch overflow differently than unsplit
      case a: Average => a.evalMode != EvalMode.TRY &&
        (a.child.dataType match {
          case ByteType | ShortType | IntegerType | LongType |
               FloatType | DoubleType => true
          case _ => false // decimal/interval AVG: precision path not ours
        })
      case _ => false
    })

  /** Partial aggregate functions one call decomposes into (1 for
    * COUNT/SUM/MIN/MAX; SUM + COUNT for AVG). */
  private def partialFuncs(f: AggregateFunction): Seq[AggregateFunction] =
    f match {
      case a: Average => Seq(Sum(a.child), Count(Seq(a.child)))
      case other => Seq(other)
    }

  // ----------------------------------------------------------- rewrite

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union,
      hint: Option[AggregateHint]): LogicalPlan = {
    // every aggregate CALL across the output, in traversal order (collect
    // and transform share sibling order for non-nested matches, so
    // positional pairing is stable)
    val aggCalls: Seq[AggregateExpression] = aggExprs.flatMap { ne =>
      val body = ne match { case Alias(e, _) => e; case other => other }
      body.collect { case ae: AggregateExpression => ae }
    }
    val callPartials: Seq[Seq[AggregateFunction]] =
      aggCalls.map(c => partialFuncs(c.aggregateFunction))
    // flat offset of call i's first partial column (past the group cols)
    val offsets: Seq[Int] = callPartials.scanLeft(0)(_ + _.size)

    // per-child partial: group by the child's own columns (positional
    // remap through the union), emit group cols + one __gp_ alias per
    // partial function. Child 0's attrs ARE the union's output exprIds, so
    // for plain-column keys the rewritten union keeps the original ids at
    // the group positions; expression keys get a fresh __gk_ alias.
    val partials = u.children.map { child =>
      val remap: Map[ExprId, Attribute] =
        u.output.map(_.exprId).zip(child.output).toMap
      def rm(e: Expression): Expression = e.transform {
        case a: AttributeReference => remap.getOrElse(a.exprId, a)
      }
      val pGroupExprs = groupExprs.map(rm)
      val pGroupCols: Seq[NamedExpression] = pGroupExprs.zipWithIndex.map {
        case (a: Attribute, _) => a
        case (e, j) => Alias(e, s"$GroupMarker$j")()
      }
      val pAggs = aggCalls.zip(callPartials).zipWithIndex.flatMap {
        case ((f, pfs), i) => pfs.zipWithIndex.map { case (pf, k) =>
          val rpf = pf.withNewChildren(pf.children.map(rm))
            .asInstanceOf[AggregateFunction]
          Alias(f.copy(aggregateFunction = rpf,
            resultId = NamedExpression.newExprId),
            s"$Marker${offsets(i) + k}")()
        }
      }
      Aggregate(pGroupExprs, pGroupCols ++ pAggs, child)
    }
    val u2 = Union(partials, byName = false, allowMissingCol = false)

    // final combine: same output names/exprIds as the original Aggregate.
    // Group-expression subtrees are first replaced by the partial group
    // column; then each aggregate call is replaced (in the same traversal
    // order the partials were numbered in) by its combiner over the
    // partial column(s), cast back to the call's original type where
    // combining re-widens (summing already-widened decimal sums gives
    // p+10 → p+20).
    val nGroups = groupExprs.size
    val finalGroupRefs: Seq[Attribute] = u2.output.take(nGroups)
    def substGroups(e: Expression): Expression = e.transformDown {
      case sub if !sub.isInstanceOf[AggregateExpression] &&
          groupExprs.exists(_.semanticEquals(sub)) =>
        finalGroupRefs(groupExprs.indexWhere(_.semanticEquals(sub)))
    }
    def combiner(ae: AggregateExpression, ps: Seq[Attribute]): Expression = {
      val combined: Expression = ae.aggregateFunction match {
        // partial counts are non-null and every final group holds
        // >=1 partial row, so the SUM can never be null — keep the
        // original COUNT column's non-nullable schema
        case _: Count =>
          KnownNotNull(ae.copy(aggregateFunction = Sum(ps.head),
            resultId = NamedExpression.newExprId))
        case s: Sum => ae.copy(aggregateFunction = s.copy(child = ps.head),
          resultId = NamedExpression.newExprId)
        case m: Min => ae.copy(aggregateFunction = m.copy(child = ps.head),
          resultId = NamedExpression.newExprId)
        case m: Max => ae.copy(aggregateFunction = m.copy(child = ps.head),
          resultId = NamedExpression.newExprId)
        // AVG = total sum / total count. Non-decimal numeric only (see
        // combinable): result type is DoubleType, the division is a plain
        // IEEE double divide, and sum-of-partial-sums matches plain AVG's
        // accumulator (long is exact; double uses the same accumulator
        // type). Total count is 0 only when the sum is NULL, and
        // NULL / 0 is NULL in non-ANSI Spark — AVG-of-nothing semantics.
        case _: Average =>
          val sumC = ae.copy(aggregateFunction = Sum(ps.head),
            resultId = NamedExpression.newExprId)
          val cntC = ae.copy(aggregateFunction = Sum(ps(1)),
            resultId = NamedExpression.newExprId)
          Divide(Cast(sumC, DoubleType), Cast(KnownNotNull(cntC), DoubleType))
        case other => throw new IllegalStateException(
          s"non-combinable ${other.prettyName} past the guard")
      }
      if (combined.dataType == ae.dataType) combined
      else Cast(combined, ae.dataType)
    }
    var aggIdx = -1
    val finalAggs: Seq[NamedExpression] = aggExprs.map { ne =>
      val (body, rebuild) = bodyAndRebuild(ne)
      // transformUp for the combine: a top-down transform would descend
      // into the replacement and re-match the combiner's own aggregate
      // calls (AVG's combiner holds two). Sibling order equals collect's
      // order (aggregates can't nest), so positional pairing holds.
      val combinedBody = substGroups(body).transformUp {
        case ae: AggregateExpression =>
          aggIdx += 1
          val ps = u2.output.slice(nGroups + offsets(aggIdx),
            nGroups + offsets(aggIdx + 1))
          combiner(ae, ps)
      }
      rebuild(combinedBody)
    }
    Aggregate(finalGroupRefs, finalAggs, u2, hint)
  }

  private def bodyAndRebuild(
      ne: NamedExpression): (Expression, Expression => NamedExpression) =
    ne match {
      case al @ Alias(e, name) => (e, out => Alias(out, name)(
        exprId = al.exprId, qualifier = al.qualifier,
        explicitMetadata = Some(al.metadata)))
      case a: Attribute => (a, {
        case same: Attribute if same.exprId == a.exprId => a
        case out => Alias(out, a.name)(exprId = a.exprId,
          qualifier = a.qualifier)
      })
    }

  /** DISTINCT rewrite: per-child dedup partial on (group keys, shared
    * argument list), final = the ORIGINAL distinct aggregates over the
    * unioned dedup (the final DISTINCT re-dedups across children):
    * {{{
    *   Agg[G, f(DISTINCT E)](Union(c1 .. cn))
    *     ==>  Agg[G, f(DISTINCT d)](Union(Dedup[G, E as d](c1) .. ))
    * }}} */
  private def rewriteDistinct(agg: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union,
      hint: Option[AggregateHint]): LogicalPlan = {
    val distinctExprs: Seq[Expression] =
      aggCallsOf(aggExprs).find(_.isDistinct).get.aggregateFunction.children

    val partials = u.children.map { child =>
      val remap: Map[ExprId, Attribute] =
        u.output.map(_.exprId).zip(child.output).toMap
      def rm(e: Expression): Expression = e.transform {
        case a: AttributeReference => remap.getOrElse(a.exprId, a)
      }
      val pGroupExprs = groupExprs.map(rm)
      val pGroupCols: Seq[NamedExpression] = pGroupExprs.zipWithIndex.map {
        case (a: Attribute, _) => a
        case (e, j) => Alias(e, s"$GroupMarker$j")()
      }
      val pDistinct = distinctExprs.zipWithIndex.map { case (e, i) =>
        Alias(rm(e), s"$DistinctMarker$i")()
      }
      Aggregate(pGroupExprs ++ pDistinct.map(_.child),
        pGroupCols ++ pDistinct, child)
    }
    val u2 = Union(partials, byName = false, allowMissingCol = false)

    val nGroups = groupExprs.size
    val finalGroupRefs: Seq[Attribute] = u2.output.take(nGroups)
    val distinctAttrs: Seq[Attribute] = u2.output.drop(nGroups)
    def substGroups(e: Expression): Expression = e.transformDown {
      case sub if !sub.isInstanceOf[AggregateExpression] &&
          groupExprs.exists(_.semanticEquals(sub)) =>
        finalGroupRefs(groupExprs.indexWhere(_.semanticEquals(sub)))
    }
    val finalAggs: Seq[NamedExpression] = aggExprs.map { ne =>
      val (body, rebuild) = bodyAndRebuild(ne)
      val combinedBody = substGroups(body).transformUp {
        case ae: AggregateExpression =>
          // distinct calls rebind to the dedup columns wholesale; plain
          // MIN/MAX riders map each child to its dedup column (group-key
          // children were already rebound by substGroups above)
          val newChildren =
            if (ae.isDistinct) distinctAttrs
            else ae.aggregateFunction.children.map { c =>
              val di = distinctExprs.indexWhere(_.semanticEquals(c))
              if (di >= 0) distinctAttrs(di) else c
            }
          val f2 = ae.aggregateFunction
            .withNewChildren(newChildren)
            .asInstanceOf[AggregateFunction]
          ae.copy(aggregateFunction = f2,
            resultId = NamedExpression.newExprId)
      }
      rebuild(combinedBody)
    }
    Aggregate(finalGroupRefs, finalAggs, u2, hint)
  }
}
