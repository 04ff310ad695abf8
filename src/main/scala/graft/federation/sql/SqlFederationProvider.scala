package graft.federation.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.federation.FederationProvider
import graft.federation.plans.FederatedPlan

/** Provider for SQL-speaking remote engines — the analog of the
  * reference's `SQLFederationProvider` + `SQLFederationOptimizerRule`
  * (src/sql/mod.rs:46-130): accepting a sub-plan means freezing it inside
  * an opaque [[FederatedPlan]] node. The unparse is probed eagerly so a
  * fragment the dialect cannot express is simply left local.
  */
final class SqlFederationProvider(val executor: SqlExecutor)
  extends FederationProvider {

  override def name: String = executor.name
  override def computeContext: Option[String] = executor.computeContext

  override def optimize(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case f: FederatedPlan => Some(f) // double-federation guard
    case p =>
      SqlUnparser.tryUnparse(hooked(p), executor.dialect)
        .map(_ => FederatedPlan(p, this))
  }

  /** Apply the executor's logical-plan hook, enforcing the reference's
    * schema-preservation contract (src/sql/mod.rs:268-284): a hook that
    * changes the fragment's output is a misconfiguration and fails loudly. */
  private def hooked(plan: LogicalPlan): LogicalPlan = {
    val rewritten = executor.planRewriter(plan)
    require(rewritten.output.map(a => (a.name, a.dataType)) ==
      plan.output.map(a => (a.name, a.dataType)),
      s"[${executor.name}] planRewriter changed the fragment schema: " +
        s"${plan.output.map(_.name)} -> ${rewritten.output.map(_.name)}")
    rewritten
  }

  /** Generate the final SQL for a frozen fragment (strategy-time): plan
    * hook (schema-checked) → unparse → SQL-string hook — the reference's
    * final_sql() chain (src/sql/mod.rs:207-232). */
  def unparse(plan: LogicalPlan): String =
    executor.sqlRewriter(new SqlUnparser(executor.dialect).unparse(hooked(plan)))

  /** The fragment's final SQL texts, one per remote cursor: a splittable
    * fragment on an executor with `splitCount` n > 1 yields n disjoint
    * split queries ([[SplitScan]]); anything else yields the single SQL. */
  def unparseSplits(plan: LogicalPlan): Seq[String] = {
    val p = hooked(plan)
    val n = executor.splitCount
    val col = if (n > 1) SplitScan.splitColumn(p) else None
    col match {
      case Some(c) =>
        (0 until n).map { i =>
          executor.sqlRewriter(new SqlUnparser(executor.dialect)
            .unparse(SplitScan.withSplitFilter(p, c, n, i)))
        }
      case None =>
        // plan hook already applied above — unparse `p` directly, or a
        // side-effecting/expensive planRewriter would run twice
        Seq(executor.sqlRewriter(new SqlUnparser(executor.dialect).unparse(p)))
    }
  }
}

object SqlFederationProvider {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SqlExecutor, SqlFederationProvider]()

  /** Providers are compared by (name, computeContext); cache per executor
    * instance so the lattice's equality checks are cheap and stable. */
  def forExecutor(e: SqlExecutor): SqlFederationProvider =
    cache.computeIfAbsent(e, ex => new SqlFederationProvider(ex))
}
