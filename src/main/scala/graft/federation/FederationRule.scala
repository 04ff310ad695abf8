package graft.federation

import org.apache.spark.sql.catalyst.expressions.{Exists, ListQuery, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.federation.plans.{FederatedPlan, RemoteRelation}
import graft.federation.sql.SqlFederationProvider

/** The heart of the engine: find the largest single-provider subtrees of an
  * optimized plan and hand each to its provider — the Spark re-expression
  * of the reference's `FederationOptimizerRule`
  * (src/optimizer/mod.rs:26-306).
  *
  * Spark has no built-in equivalent: `V2ScanRelationPushDown` / JDBC
  * pushdown operate on a *single* relation; grouping a join/union/aggregate
  * of several same-source relations into one remote query is exactly what
  * this rule adds.
  *
  * Algorithm (bottom-up, one pass):
  *  1. every subtree gets a [[ScanResult]]: `RemoteRelation` →
  *     `Distinct(provider)`, any other leaf → `Distinct(Nop)` (so
  *     remote⋈local comes out `Ambiguous`, reference NopFederationProvider
  *     trick), already-federated nodes and subquery expressions →
  *     `Ambiguous`;
  *  2. a node whose children merge to `Distinct(p)` stays unwrapped — the
  *     fragment keeps growing;
  *  3. at an `Ambiguous` node (or the root), each maximal `Distinct`
  *     child fragment is handed to `provider.optimize`, which wraps it in
  *     an opaque [[FederatedPlan]] — but only if it actually unparses
  *     (unparse failure degrades to local execution, never an error).
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` (or
  * `spark.experimental.extraOptimizations`), i.e. after Catalyst's main
  * batches: predicate pushdown, pruning, constant folding and subquery
  * decorrelation have already run — mirroring the reference's rule
  * placement after `scalar_subquery_to_join` (src/lib.rs:39-51). The rule
  * is idempotent (FederatedPlan is a leaf with a Nop-like result), so
  * fixpoint batches are safe.
  */
/** Gate for shipping a [[LocalRelation]] as an inline VALUES table: small
  * (the rendered SQL is the wire format), scalar renderable types only,
  * distinct column names (the derived column list must be unambiguous),
  * non-empty (SQL has no zero-row VALUES; empty-relation joins are
  * normally eliminated by PropagateEmptyRelation before this rule). */
object InlineValues {
  val MaxRows = 1000

  def ok(l: LocalRelation): Boolean =
    l.data.nonEmpty && l.data.length <= MaxRows &&
      l.output.map(_.name).distinct.size == l.output.size &&
      l.output.forall(a => scalarRenderable(a.dataType))

  private def scalarRenderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           BooleanType | DateType | TimestampType | TimestampNTZType |
           FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }
  }
}

object FederationRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // The rule lives in a fixpoint batch, so it can run on intermediate
    // plan shapes. Re-derive the grouping from scratch each invocation —
    // unwrap previously-cut fragments first — so an early, conservative cut
    // (e.g. made before other rules finished collapsing the plan) heals
    // into the larger fragment on the final iteration. Rewrap of an
    // unchanged plan is structurally identical, so the batch converges.
    // A fragment carrying a bind join is FINAL: the join it absorbed no
    // longer exists in the surrounding plan, so unwrapping to `inner`
    // (which loses the build side's output) would leave dangling
    // attribute references above.
    val unwrapped = plan.transformUpWithSubqueries {
      case f: FederatedPlan if f.bindJoins.isEmpty => f.inner
    }
    val (rewritten, result) = optimizeRecursively(unwrapped)
    result.providerOpt match {
      case Some(p) if p != NopFederationProvider =>
        federateOrDescend(rewritten, p)
      case _ => rewritten
    }
  }

  /** Federate the whole single-provider fragment; when the unparser cannot
    * express its root (e.g. an Expand whose grouping id is consumed), push
    * federation down to the largest expressible subtrees instead of giving
    * up — the unsupported operator then runs locally over federated
    * children. Uncorrelated subquery plans hanging off unparsable nodes
    * are federated as independent roots on the way down. */
  private def federateOrDescend(fragment: LogicalPlan,
      p: FederationProvider): LogicalPlan =
    federate(fragment, p).getOrElse {
      fragment
        .withNewChildren(fragment.children.map(federateOrDescend(_, p)))
        .transformExpressions {
          case s: SubqueryExpression if !s.isCorrelated =>
            s.withNewPlan(apply(s.plan))
        }
    }

  /** Returns the (possibly rewritten) plan and the subtree's ScanResult. */
  private def optimizeRecursively(plan: LogicalPlan): (LogicalPlan, ScanResult) =
    plan match {
      // double-federation guard (reference optimizer/mod.rs:142-147)
      case f: FederatedPlan => (f, ScanResult.Ambiguous)

      case r: RemoteRelation =>
        (r, ScanResult.Distinct(SqlFederationProvider.forExecutor(r.executor)))

      // a small literal relation is provider-NEUTRAL: it merges with any
      // fragment (NoScan) and the unparser ships it as an inline VALUES
      // table, so remote ⋈ literal-dim — and everything stacked above —
      // federates as ONE SQL. Oversize/exotic relations fall through to
      // the Nop leaf case and keep blocking, as before.
      case l: LocalRelation if InlineValues.ok(l) =>
        (l, ScanResult.NoScan)

      case leaf: LeafNode =>
        (leaf, ScanResult.Distinct(NopFederationProvider))

      // commands / EXPLAIN-style wrappers are never federated wholesale
      // (reference Analyze carve-out, optimizer/mod.rs:194-209)
      case c: Command =>
        val newChildren = c.children.map(ch => apply(ch))
        (c.withNewChildren(newChildren), ScanResult.Ambiguous)

      case node =>
        val childResults = node.children.map(optimizeRecursively)
        // Subquery expressions participate in the lattice (reference
        // scan_plan_exprs, optimizer/mod.rs:84-126): an uncorrelated
        // subquery contributes its own plan's ScanResult, so e.g.
        // `WHERE x > (SELECT avg(..) FROM same_provider)` keeps the
        // fragment growing and the whole predicate ships remotely.
        // Correlated subqueries force Ambiguous (optimizer/mod.rs:114-120).
        val exprResults = subqueriesOf(node).map(subqueryScan)
        val merged = ScanResult.merge(childResults.map(_._2) ++ exprResults)

        if (!merged.isAmbiguous) {
          (node.withNewChildren(childResults.map(_._1)), merged)
        } else {
          // federate each maximal Distinct child fragment individually
          // (reference optimizer/mod.rs:217-250), and each uncorrelated
          // subquery plan as an independent federation root (reference
          // optimizer/mod.rs:285-305)
          val newChildren = childResults.map {
            case (child, ScanResult.Distinct(p))
                if p != NopFederationProvider =>
              federateOrDescend(child, p)
            case (child, _) => child
          }
          val rewritten = node.withNewChildren(newChildren)
            .transformExpressions {
              case s: ScalarSubquery if !s.isCorrelated =>
                s.withNewPlan(apply(s.plan))
              case e: Exists if !e.isCorrelated =>
                e.withNewPlan(apply(e.plan))
              case l: ListQuery if !l.isCorrelated =>
                l.withNewPlan(apply(l.plan))
            }
          (rewritten, ScanResult.Ambiguous)
        }
    }

  /** Lattice contribution of one subquery expression: uncorrelated
    * scalar/EXISTS/IN subqueries contribute their plan's ScanResult; any
    * other subquery form (correlated, dynamic pruning) blocks. */
  private def subqueryScan(s: SubqueryExpression): ScanResult = s match {
    case s if s.isCorrelated => ScanResult.Ambiguous
    case _: ScalarSubquery | _: Exists | _: ListQuery => scanResultOf(s.plan)
    case _ => ScanResult.Ambiguous
  }

  private def subqueriesOf(node: LogicalPlan): Seq[SubqueryExpression] =
    node.expressions.flatMap(_.collect { case s: SubqueryExpression => s })

  /** Pure (non-rewriting) ScanResult of a plan — used for subquery plans,
    * which are unparsed in place when the fragment federates. */
  private[federation] def scanResultOf(plan: LogicalPlan): ScanResult = plan match {
    case _: FederatedPlan => ScanResult.Ambiguous
    case r: RemoteRelation =>
      ScanResult.Distinct(SqlFederationProvider.forExecutor(r.executor))
    case l: LocalRelation if InlineValues.ok(l) => ScanResult.NoScan
    case leaf: LeafNode => ScanResult.Distinct(NopFederationProvider)
    case _: Command => ScanResult.Ambiguous
    case node =>
      val exprResults = subqueriesOf(node).map(subqueryScan)
      ScanResult.merge(node.children.map(scanResultOf) ++ exprResults)
  }

  /** [[scanResultOf]] after looking through previously-cut bind-free
    * [[FederatedPlan]] leaves — the probe mirror of [[apply]]'s
    * unwrap-and-regroup: a fragment that an earlier fixpoint iteration
    * (or the subquery optimizer, which federates IN/EXISTS subquery plans
    * before the main plan's batch runs) already cut is still regroupable,
    * so profitability probes must count it as its provider, not as
    * opaque. Bind-final fragments stay opaque, exactly as in [[apply]]. */
  private[federation] def effectiveScan(plan: LogicalPlan): ScanResult =
    // common case first: no previously-cut fragment anywhere → the
    // unwrap transform would copy the whole tree for nothing
    if (!plan.exists(_.isInstanceOf[FederatedPlan])) scanResultOf(plan)
    else scanResultOf(plan.transformUpWithSubqueries {
      case f: FederatedPlan if f.bindJoins.isEmpty => f.inner
    })

  /** Hand a single-provider fragment to its provider; `None` keeps it
    * local. A root the unparser cannot render as a top-level SELECT block
    * is wrapped in an identity Projection first (reference wrap_projection,
    * optimizer/mod.rs:341-358). Sort/Limit/Offset roots are deliberately
    * NOT wrapped: the unparser peels them into trailing ORDER BY/LIMIT
    * clauses, whereas a Projection wrap would bury the ORDER BY inside a
    * derived table where the remote engine is free to drop it. */
  private def federate(fragment: LogicalPlan,
      provider: FederationProvider): Option[LogicalPlan] = {
    val wrapped = fragment match {
      case _: Project | _: Aggregate | _: Sort | _: GlobalLimit |
           _: LocalLimit | _: Offset | _: Distinct | _: Union | _: Window |
           _: Filter => fragment
      case other => Project(other.output, other)
    }
    provider.optimize(wrapped)
  }
}
