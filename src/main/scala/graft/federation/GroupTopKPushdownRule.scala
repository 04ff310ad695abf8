package graft.federation

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.federation.sql.SqlFederationProvider

/** Per-GROUP top-k pushdown through federation boundaries — the windowed
  * sibling of [[TopKPushdownRule]] (beyond the reference for the same
  * reason: it federates whole single-provider subtrees only, so a
  * `row_number() OVER (PARTITION BY g ORDER BY s) <= k` over a
  * multi-provider UNION ships every remote row and windows locally).
  *
  * Rewrite:
  * {{{
  *   Filter(rn <= k, Window(rn, Union(c1 .. cn)))
  *     ==>  Filter(rn <= k, Window(rn, Union(
  *            Project(c1.out, Filter(rn1 <= k, Window(rn1, c1))) .. )))
  * }}}
  * Containment, per group: a row of the global per-group top-k has < k
  * rows of ITS group ordered before it across the whole union, hence < k
  * within its own child — so each child may be truncated to its own
  * per-group top-k before the local merge. [[FederationRule]] (next in
  * the batch) then federates each per-provider wrap as
  * `SELECT … FROM (SELECT …, ROW_NUMBER() OVER (PARTITION BY g ORDER BY s)
  * AS __gtk_rn FROM frag) WHERE __gtk_rn <= k` — the wire carries
  * O(k × groups × providers) rows instead of O(rows).
  *
  * Rank functions: RANK / DENSE_RANK are monotone under subsets (a row's
  * child rank never exceeds its union rank), so containment is exact and
  * the recomputed outer rank is deterministic. ROW_NUMBER under a
  * non-total order is nondeterministic in Spark itself; the rewrite
  * returns *a* correct answer, the same contract as [[TopKPushdownRule]].
  *
  * Fires only when the union cannot federate wholesale, at least one
  * child fragment can, and EVERY remote child's dialect supports window
  * functions (a windowless dialect — Derby — would leave its wrap
  * computing locally for no wire gain; such plans keep today's shape).
  */
object GroupTopKPushdownRule extends Rule[LogicalPlan] {

  /** Same conservatism as [[TopKPushdownRule.MaxPushedK]]: per group. */
  private val MaxPushedK = 100000

  /** Marker alias for the per-child rank column: idempotence guard and a
    * greppable plan breadcrumb (cf. PartialAggRule's `__gp_`). */
  val RankAlias = "__gtk_rn"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w @ Window(Seq(a @ Alias(we: WindowExpression, _)),
        _, _, u: Union, _))
        if boundOf(cond, a.toAttribute).exists(k => eligible(k, we, u)) =>
      val k = boundOf(cond, a.toAttribute).get
      f.copy(child = w.copy(child = u.copy(children = truncated(u, we, k))))
    // Spark's InferWindowGroupLimit may have inserted a WindowGroupLimit
    // between the Window and the union; keep it (it still prunes the
    // local merge) and truncate the union beneath it
    case f @ Filter(cond, w @ Window(Seq(a @ Alias(we: WindowExpression, _)),
        _, _, wgl @ WindowGroupLimit(_, _, _, _, u: Union), _))
        if boundOf(cond, a.toAttribute).exists(k => eligible(k, we, u)) =>
      val k = boundOf(cond, a.toAttribute).get
      f.copy(child = w.copy(child =
        wgl.copy(child = u.copy(children = truncated(u, we, k)))))
  }

  /** The per-group cap implied by the filter's conjunct on the rank
    * attribute: `rn <= k`, `rn < k`, `rn = k` (the row with rank k still
    * needs its k-1 predecessors present for the rank to be k). */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = {
    val ks = splitConjuncts(cond).collect {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
          if a.exprId == rn.exprId => k
      case LessThan(a: AttributeReference, IntegerLiteral(k))
          if a.exprId == rn.exprId => k - 1
      case EqualTo(a: AttributeReference, IntegerLiteral(k))
          if a.exprId == rn.exprId => k
      case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
          if a.exprId == rn.exprId => k
      case GreaterThan(IntegerLiteral(k), a: AttributeReference)
          if a.exprId == rn.exprId => k - 1
    }
    if (ks.isEmpty) None else Some(ks.min)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def rankLike(fn: Expression): Boolean = fn match {
    case _: RowNumber | _: Rank | _: DenseRank => true
    case _ => false
  }

  /** Each union child wrapped with its own rank-and-truncate, the window
    * spec remapped positionally into the child's attributes; a Project
    * restores the child's exact output (the union must not widen). */
  private def truncated(u: Union, we: WindowExpression,
      k: Int): Seq[LogicalPlan] =
    u.children.map { child =>
      val remap: Map[ExprId, Attribute] =
        u.output.map(_.exprId).zip(child.output).toMap
      val weC = we.transform {
        case ar: AttributeReference => remap.getOrElse(ar.exprId, ar)
      }.asInstanceOf[WindowExpression]
      val spec = weC.windowSpec
      val rn = Alias(weC, RankAlias)()
      val win = Window(Seq(rn), spec.partitionSpec,
        spec.orderSpec, child)
      val flt = Filter(LessThanOrEqual(rn.toAttribute, Literal(k)), win)
      Project(child.output, flt)
    }

  private def eligible(k: Int, we: WindowExpression, u: Union): Boolean = {
    if (u.byName || u.allowMissingCol || u.children.size < 2) return false
    if (k <= 0 || k > MaxPushedK) return false
    if (!rankLike(we.windowFunction)) return false
    val spec = we.windowSpec
    // partition/order keys: deterministic expressions over the union output
    val keys = spec.partitionSpec ++ spec.orderSpec.map(_.child)
    if (!keys.forall { e =>
      e.deterministic &&
        e.references.forall(a => u.output.exists(_.exprId == a.exprId))
    }) return false
    // positional remap through the union collapses duplicate exprIds
    if (u.output.map(_.exprId).distinct.size != u.output.size) return false
    // idempotence: children already wrapped (fixpoint convergence)
    if (u.children.exists(_.exists(p => p.expressions.exists(_.exists {
      case Alias(_, RankAlias) => true
      case _ => false
    })))) return false
    // profitability: the union can't federate wholesale, at least one
    // child fragment can, and every remote child can express the window
    val childResults = u.children.map(FederationRule.scanResultOf)
    val wholesale = ScanResult.merge(childResults)
    val remotes = childResults.collect {
      case ScanResult.Distinct(p) if p != NopFederationProvider => p
    }
    val windowsOk = remotes.forall {
      case p: SqlFederationProvider =>
        p.executor.dialect.supportsWindowFunctions
      case _ => false
    }
    wholesale.isAmbiguous && remotes.nonEmpty && windowsOk
  }
}
