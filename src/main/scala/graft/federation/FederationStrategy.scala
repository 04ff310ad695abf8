package graft.federation

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

import graft.federation.exec.RemoteScanExec
import graft.federation.plans.{FederatedPlan, RemoteRelation}
import graft.federation.sql.{SqlFederationProvider, SqlUnparser}

/** Physical planning for federation nodes — analog of the reference's
  * `FederatedPlanner`/`SQLFederationPlanner` (src/plan_node.rs:139-172,
  * src/sql/mod.rs:133-161). Registered via
  * `SparkSessionExtensions.injectPlannerStrategy` (or
  * `spark.experimental.extraStrategies`).
  *
  * A bare [[RemoteRelation]] (reachable when the federation rule is not
  * installed, or when a fragment didn't unparse) still plans: it becomes a
  * whole-table remote scan with local filters on top — the reference's
  * fallback-provider path (src/table_provider.rs:110-139).
  */
object FederationStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case f: FederatedPlan =>
      val provider = f.provider match {
        case p: SqlFederationProvider => p
        case other =>
          throw new IllegalStateException(
            s"cannot plan federation for provider ${other.name}")
      }
      RemoteScanExec(f.output, provider.unparseSplits(f.inner),
        provider.executor, f.runtimeFilters, f.bindJoins) :: Nil

    case r: RemoteRelation =>
      // route through the provider so plan/SQL hooks apply on the
      // fallback path exactly as on the federated path
      val provider = SqlFederationProvider.forExecutor(r.executor)
      RemoteScanExec(r.output, provider.unparseSplits(Project(r.output, r)),
        r.executor) :: Nil

    case _ => Nil
  }
}
