package graft.federation

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
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
object FederationRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val (rewritten, result) = optimizeRecursively(plan)
    result.providerOpt match {
      case Some(p) if p != NopFederationProvider =>
        federate(rewritten, p).getOrElse(rewritten)
      case _ => rewritten
    }
  }

  /** Returns the (possibly rewritten) plan and the subtree's ScanResult. */
  private def optimizeRecursively(plan: LogicalPlan): (LogicalPlan, ScanResult) =
    plan match {
      // double-federation guard (reference optimizer/mod.rs:142-147)
      case f: FederatedPlan => (f, ScanResult.Ambiguous)

      case r: RemoteRelation =>
        (r, ScanResult.Distinct(SqlFederationProvider.forExecutor(r.executor)))

      case leaf: LeafNode =>
        (leaf, ScanResult.Distinct(NopFederationProvider))

      // commands / EXPLAIN-style wrappers are never federated wholesale
      // (reference Analyze carve-out, optimizer/mod.rs:194-209)
      case c: Command =>
        val newChildren = c.children.map(ch => apply(ch))
        (c.withNewChildren(newChildren), ScanResult.Ambiguous)

      case node =>
        val childResults = node.children.map(optimizeRecursively)
        // subqueries in expressions block federation at this node (the
        // reference forces Ambiguous for correlated refs and errors on
        // InSubquery at the cut point, optimizer/mod.rs:113-120; Catalyst
        // has decorrelated most by now, so this is rare)
        val exprBlocks = node.expressions.exists(_.exists(
          _.isInstanceOf[SubqueryExpression]))
        val merged0 = ScanResult.merge(childResults.map(_._2))
        val merged =
          if (exprBlocks) ScanResult.Ambiguous else merged0

        if (!merged.isAmbiguous) {
          (node.withNewChildren(childResults.map(_._1)), merged)
        } else {
          // federate each maximal Distinct child fragment individually
          // (reference optimizer/mod.rs:217-250)
          val newChildren = childResults.map {
            case (child, ScanResult.Distinct(p))
                if p != NopFederationProvider =>
              federate(child, p).getOrElse(child)
            case (child, _) => child
          }
          (node.withNewChildren(newChildren), ScanResult.Ambiguous)
        }
    }

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
