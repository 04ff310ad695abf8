package graft.federation

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

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
  * with COUNT → SUM of partial counts, SUM → SUM, MIN → MIN, MAX → MAX.
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
  * Conservative v1 surface: group keys must be plain columns; aggregate
  * calls limited to non-DISTINCT, unfiltered COUNT/SUM/MIN/MAX (AVG
  * decomposes to SUM+COUNT and can join this list later; DISTINCT
  * aggregates are not combinable from partials). Aggregate calls may sit
  * inside arbitrary scalar expressions (`CAST(SUM(x) AS DOUBLE)`,
  * `SUM(a) / COUNT(*)`) as long as every non-aggregate column reference
  * in the output is a group key. Anything else leaves the plan untouched.
  *
  * Idempotence: partial aliases carry the `__gp_` prefix; a union whose
  * children already aggregate such columns is not rewritten again, so the
  * fixpoint batch converges.
  */
object PartialAggRule extends Rule[LogicalPlan] {

  private val Marker = "__gp_"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, u: Union, _)
          if eligible(groupExprs, aggExprs, u) =>
        rewrite(agg, groupExprs, aggExprs, u)
    }

  // ------------------------------------------------------------ guards

  private def eligible(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union): Boolean = {
    if (u.byName || u.allowMissingCol || u.children.size < 2) return false
    // already rewritten (fixpoint convergence)
    if (u.children.exists {
      case a: Aggregate => a.aggregateExpressions.exists(
        _.name.startsWith(Marker))
      case _ => false
    }) return false
    // shape: group keys are plain columns of the union output
    if (!groupExprs.forall {
      case a: AttributeReference => u.output.exists(_.exprId == a.exprId)
      case _ => false
    }) return false
    // shape: outputs are group keys, or scalar expressions over
    // combinable aggregate calls and group keys only
    val isGroupKey: ExprId => Boolean = id =>
      groupExprs.exists { case g: AttributeReference => g.exprId == id }
    if (!aggExprs.forall {
      case a: AttributeReference => isGroupKey(a.exprId)
      case Alias(a: AttributeReference, _) => isGroupKey(a.exprId)
      case Alias(e, _) =>
        val aggs = e.collect { case ae: AggregateExpression => ae }
        // attrs outside aggregate calls must be group keys
        val outside = e.transform {
          case _: AggregateExpression => Literal(null)
        }.references
        aggs.nonEmpty && aggs.forall(combinable) &&
          outside.forall(a => isGroupKey(a.exprId))
      case _ => false
    }) return false
    // profitability: the union can't federate wholesale, but at least one
    // child fragment can
    val childResults = u.children.map(FederationRule.scanResultOf)
    val wholesale = ScanResult.merge(childResults)
    val someRemote = childResults.exists {
      case ScanResult.Distinct(p) => p != NopFederationProvider
      case _ => false
    }
    wholesale.isAmbiguous && someRemote
  }

  private def combinable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Count | _: Min | _: Max => true
      case s: Sum => s.evalContext.evalMode != EvalMode.TRY // TRY-mode
      // partials can mask per-branch overflow differently than unsplit
      case _ => false
    })

  // ----------------------------------------------------------- rewrite

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], u: Union): LogicalPlan = {
    val groupAttrs = groupExprs.map(_.asInstanceOf[AttributeReference])
    // every aggregate CALL across the output, in traversal order (collect
    // and transform share pre-order, so positional pairing is stable)
    val aggCalls: Seq[AggregateExpression] = aggExprs.flatMap {
      case _: AttributeReference => Nil
      case Alias(_: AttributeReference, _) => Nil
      case Alias(e, _) => e.collect { case ae: AggregateExpression => ae }
    }

    // per-child partial: group by the child's own columns (positional
    // remap through the union), emit group cols + one __gp_ alias per
    // aggregate call. Child 0's attrs ARE the union's output exprIds, so
    // the rewritten union keeps the original ids at the group positions.
    val partials = u.children.map { child =>
      val remap: Map[ExprId, Attribute] =
        u.output.map(_.exprId).zip(child.output).toMap
      def rm(e: Expression): Expression = e.transform {
        case a: AttributeReference => remap.getOrElse(a.exprId, a)
      }
      val pGroups = groupAttrs.map(rm(_).asInstanceOf[Attribute])
      val pAggs = aggCalls.zipWithIndex.map { case (f, i) =>
        val pf = f.aggregateFunction
          .withNewChildren(f.aggregateFunction.children.map(rm))
          .asInstanceOf[AggregateFunction]
        Alias(f.copy(aggregateFunction = pf), s"$Marker$i")()
      }
      Aggregate(pGroups, (pGroups: Seq[NamedExpression]) ++ pAggs, child)
    }
    val u2 = Union(partials, byName = false, allowMissingCol = false)

    // final combine: same output names/exprIds as the original Aggregate.
    // Each aggregate call is replaced (in the same traversal order the
    // partials were numbered in) by its combiner over the partial column,
    // cast back to the call's original type where combining re-widens
    // (summing already-widened decimal sums gives p+10 → p+20).
    val nGroups = groupAttrs.size
    var aggIdx = -1
    val finalAggs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference => a // group key (exprId preserved by u2)
      case al @ Alias(a: AttributeReference, _) => al
      case al @ Alias(e, name) =>
        // transformUp: a top-down transform would descend into the
        // replacement and re-match the combined AggregateExpression.
        // Sibling order equals collect's pre-order (aggregates can't
        // nest), so positional pairing with the partials holds.
        val combinedBody = e.transformUp {
          case ae: AggregateExpression =>
            aggIdx += 1
            val p = u2.output(nGroups + aggIdx)
            val combined: Expression = ae.aggregateFunction match {
              // partial counts are non-null and every final group holds
              // >=1 partial row, so the SUM can never be null — keep the
              // original COUNT column's non-nullable schema
              case _: Count =>
                KnownNotNull(ae.copy(aggregateFunction = Sum(p)))
              case s: Sum => ae.copy(aggregateFunction = s.copy(child = p))
              case m: Min => ae.copy(aggregateFunction = m.copy(child = p))
              case m: Max => ae.copy(aggregateFunction = m.copy(child = p))
              case other => throw new IllegalStateException(
                s"non-combinable ${other.prettyName} past the guard")
            }
            if (combined.dataType == ae.dataType) combined
            else Cast(combined, ae.dataType)
        }
        Alias(combinedBody, name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = Some(al.metadata))
    }
    Aggregate(groupAttrs, finalAggs, u2)
  }
}
