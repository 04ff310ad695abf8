package graft.federation

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Top-k pushdown through federation boundaries — a scale feature beyond
  * the reference (like [[PartialAggRule]], which it mirrors structurally:
  * the reference federates whole single-provider subtrees only, so an
  * `ORDER BY ... LIMIT k` over a multi-provider UNION ships every remote
  * row and sorts locally).
  *
  * Rewrite:
  * {{{
  *   Limit[k](Sort[o](Union(c1 .. cn)))
  *     ==>  Limit[k](Sort[o](Union(Limit[k](Sort[o'](c1)) .. )))
  * }}}
  * The global top-k of a concatenation is contained in the union of the
  * per-child top-ks (any row in the global answer has < k rows ordered
  * before it overall, hence < k within its own child), so each child may
  * be truncated to its own k best rows before the local merge.
  * [[FederationRule]] (next in the batch) then federates each per-provider
  * `Sort+Limit` into its remote engine as `ORDER BY ... LIMIT k` — each
  * provider ships k rows instead of its whole table: O(k × providers) on
  * the wire instead of O(rows).
  *
  * Tie semantics match Spark's own `ORDER BY ... LIMIT`: when ties span
  * the cut, which tied rows survive is unspecified there too — the
  * rewrite returns *a* correct top-k under the given order. Queries
  * needing reproducible output use a total order, exactly as without the
  * rewrite.
  *
  * Fires only when the union cannot federate wholesale but at least one
  * child can (same profitability test as [[PartialAggRule]]); sort keys
  * must be deterministic expressions over the union output.
  *
  * OFFSET shapes (r7): `ORDER BY … LIMIT k OFFSET o` arrives as
  * `GlobalLimit(k, Offset(o, LocalLimit(k+o, Sort(...))))` — Spark's
  * LimitPushDown already folded k+o into the LocalLimit. Any row of the
  * global answer has < k+o rows ordered before it overall, hence < k+o
  * within its own child — so each child truncates to its top-(k+o) and
  * the OFFSET itself stays in the local merge (per-child offsets would
  * drop rows wrongly).
  */
object TopKPushdownRule extends Rule[LogicalPlan] {

  /** Past this, shipping k rows per provider stops being obviously better
    * than streaming the scan; stay conservative. */
  private val MaxPushedK = 100000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case gl @ GlobalLimit(IntegerLiteral(k),
        ll @ LocalLimit(_, srt @ Sort(order, true, u: Union, _)))
        if eligible(k, order, u) =>
      gl.copy(child = ll.copy(child =
        srt.copy(child = u.copy(children = truncated(u, order, k)))))
    case gl @ GlobalLimit(IntegerLiteral(_),
        off @ Offset(IntegerLiteral(o),
          ll @ LocalLimit(IntegerLiteral(n),
            srt @ Sort(order, true, u: Union, _))))
        if o > 0 && eligible(n, order, u) =>
      gl.copy(child = off.copy(child = ll.copy(child =
        srt.copy(child = u.copy(children = truncated(u, order, n))))))
  }

  /** Each union child capped to its own best `n` under the union-level
    * order remapped positionally into the child's attributes. */
  private def truncated(u: Union, order: Seq[SortOrder],
      n: Int): Seq[LogicalPlan] =
    u.children.map { child =>
      val remap: Map[ExprId, Attribute] =
        u.output.map(_.exprId).zip(child.output).toMap
      val order2 = order.map { so =>
        so.transform {
          case a: AttributeReference => remap.getOrElse(a.exprId, a)
        }.asInstanceOf[SortOrder]
      }
      Limit(Literal(n), Sort(order2, global = true, child))
    }

  private def eligible(k: Int, order: Seq[SortOrder], u: Union): Boolean = {
    if (u.byName || u.allowMissingCol || u.children.size < 2) return false
    if (k <= 0 || k > MaxPushedK) return false
    // positional remap through the union collapses duplicate exprIds
    if (u.output.map(_.exprId).distinct.size != u.output.size) return false
    // sort keys: deterministic expressions over the union output
    if (!order.forall { so =>
      so.child.deterministic &&
        so.child.references.forall(a => u.output.exists(_.exprId == a.exprId))
    }) return false
    // idempotence: children already truncated (fixpoint convergence)
    if (u.children.exists {
      case _: GlobalLimit | _: LocalLimit => true
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
}
