package graft.federation

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort, SubqueryAlias}
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

  /** Unsorted-LIMIT fragment: `GlobalLimit(k, [LocalLimit(k,]core)` with
    * no Sort/Offset at the limit's child — the shape where any k rows are
    * a valid answer, so each split cursor may truncate at k
    * ([[graft.federation.sql.SqlFederationProvider.unparseSplitsInfo]]).
    * Past the cap shipping k rows per cursor stops being obviously
    * better than the plain single-cursor LIMIT (mirrors TopKPushdownRule's
    * MaxPushedK). */
  private val MaxPerCursorLimit = 100000L
  private object SplitLimit {
    import org.apache.spark.sql.catalyst.expressions.IntegerLiteral
    def unapply(p: LogicalPlan): Option[(Int, LogicalPlan)] = p match {
      case GlobalLimit(IntegerLiteral(k), LocalLimit(IntegerLiteral(k2), core))
          if k == k2 && unordered(core) => Some((k, core))
      case GlobalLimit(IntegerLiteral(k), core) if unordered(core) =>
        Some((k, core))
      case _ => None
    }
    // A Sort/Offset anywhere on the deterministic per-row spine under the
    // limit makes it ORDERED: per-cursor truncation would keep arbitrary
    // rows instead of the top-k. Catalyst normally normalizes Project
    // above a limit or below a Sort before federation cuts the plan, so
    // the direct child is a Sort when ordered — but that is a
    // normalization invariant this code must OWN, not assume: recurse
    // through order-preserving nodes (deterministic Project/Filter/
    // SubqueryAlias) to find a hidden global Sort (r12 verdict item 2).
    private def unordered(core: LogicalPlan): Boolean = core match {
      case _: Sort => false
      case _: org.apache.spark.sql.catalyst.plans.logical.Offset => false
      case p: Project if p.projectList.forall(_.deterministic) =>
        unordered(p.child)
      case f: Filter if f.condition.deterministic => unordered(f.child)
      case s: SubqueryAlias => unordered(s.child)
      case _ => true
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case f: FederatedPlan =>
      val provider = f.provider match {
        case p: SqlFederationProvider => p
        case other =>
          throw new IllegalStateException(
            s"cannot plan federation for provider ${other.name}")
      }
      f.inner match {
        // Per-cursor LIMIT truncation on split scans: n cursors EACH stop
        // at k engine-side (instead of one cursor, or n draining fully);
        // the exact global cut happens locally — GlobalLimitExec over the
        // ≤ n·k union (EnsureRequirements inserts its single-partition
        // exchange). Runtime filters / bind joins wrap the fragment SQL
        // OUTSIDE a pushed LIMIT, which would change row counts — those
        // fragments keep the single-cursor form.
        case SplitLimit(k, core)
            if k <= MaxPerCursorLimit && provider.executor.splitCount > 1 &&
              f.runtimeFilters.isEmpty && f.bindJoins.isEmpty =>
          val (sqls, rangeIdx) =
            provider.unparseSplitsInfo(core, Some(k.toLong))
          if (sqls.size <= 1) defaultScan(f, provider) :: Nil
          else {
            val scan = RemoteScanExec(f.output, sqls, provider.executor,
              Nil, Nil, Nil, rangeIdx.map(f.output), streamOf(f.inner))
            org.apache.spark.sql.execution.GlobalLimitExec(k,
              org.apache.spark.sql.execution.LocalLimitExec(k, scan)) :: Nil
          }
        case _ => defaultScan(f, provider) :: Nil
      }

    case r: RemoteRelation =>
      // route through the provider so plan/SQL hooks apply on the
      // fallback path exactly as on the federated path
      val provider = SqlFederationProvider.forExecutor(r.executor)
      val (sqls, rangeIdx) =
        provider.unparseSplitsInfo(Project(r.output, r))
      RemoteScanExec(r.output, sqls, r.executor,
        rangeSplitCol = rangeIdx.map(r.output), stream = r.stream) :: Nil

    case _ => Nil
  }

  /** The SparkDataStream whose microbatch this fragment reads, if any —
    * set by FedStreamScanRule's substituted leaf; surfaces on the physical
    * scan so streaming progress meters numInputRows. */
  private def streamOf(inner: LogicalPlan): Option[
      org.apache.spark.sql.connector.read.streaming.SparkDataStream] =
    inner.collectFirst {
      case r: RemoteRelation if r.stream.isDefined => r.stream.get
    }

  private def defaultScan(f: FederatedPlan,
      provider: SqlFederationProvider): SparkPlan = {
    val (sqls, rangeIdx) = provider.unparseSplitsInfo(f.inner)
    RemoteScanExec(f.output, sqls,
      provider.executor, f.runtimeFilters, f.bindJoins,
      remoteOrdering(f, provider, sqls.size),
      rangeIdx.map(f.output), streamOf(f.inner))
  }

  /** The ordering a fragment's remote SQL GUARANTEES on the wire — a
    * top-level `Sort(global)` (possibly under the LIMIT/OFFSET it was
    * pushed with, which the unparser renders as the SAME query level's
    * ORDER BY … LIMIT/FETCH) — admitted only when:
    *  - ONE cursor, one partition per SQL (split filters would wrap the
    *    ORDER BY in a derived table, where SQL stops guaranteeing order,
    *    and the mock's inner-session RDD keeps its own partitioning);
    *  - no bind joins (the VALUES join wraps the sorted SQL in a derived
    *    table — same loss of guarantee);
    *  - every sort key is a bare output attribute whose type the dialect
    *    probed order-portable (string collation and float NaN placement
    *    differ by engine).
    * Runtime filters are fine: their predicates wrap as
    * `SELECT * FROM (…) WHERE p` — but that too is a derived table, so
    * refuse those as well; they are join-driven anyway, and the join will
    * re-shuffle. */
  private def remoteOrdering(f: FederatedPlan, p: SqlFederationProvider,
      nSqls: Int): Seq[SortOrder] = {
    if (nSqls != 1 || !p.executor.singlePartitionPerCursor ||
        f.bindJoins.nonEmpty || f.runtimeFilters.nonEmpty) return Nil
    // mirror of SqlUnparser.select's peel: the shapes whose rendered SQL
    // carries the ORDER BY at the OUTERMOST level (possibly beside
    // LIMIT/OFFSET). Returns the Sort plus the projection between it and
    // the fragment output (identity when the Sort is on top).
    def top(plan: LogicalPlan): Option[(Sort,
        Option[Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]])] =
      plan match {
        case s @ Sort(_, true, _, _) => Some((s, None))
        case GlobalLimit(_, child) => top(child)
        case LocalLimit(_, child) => top(child)
        case org.apache.spark.sql.catalyst.plans.logical.Offset(_, child) =>
          top(child)
        case Project(list, s @ Sort(_, true, _, _))
            if list.forall(_.deterministic) =>
          Some((s, Some(list)))
        case _ => None
      }
    val d = p.executor.dialect
    top(f.inner) match {
      case None => Nil
      case Some((sort, projection)) =>
        // exprIds equivalent to a sort key: the key itself, plus any alias
        // of it DEFINED right under the Sort (ORDER BY a column and ORDER
        // BY its per-row alias deliver the same stream)
        def keyIds(a: AttributeReference): Set[
            org.apache.spark.sql.catalyst.expressions.ExprId] = {
          val below = sort.child match {
            case Project(l1, _) => l1.collect {
              case al: org.apache.spark.sql.catalyst.expressions.Alias
                  if al.child.semanticEquals(a) => al.exprId
            }
            case _ => Nil
          }
          below.toSet + a.exprId
        }
        // express each sort key as a fragment OUTPUT attribute (ordering
        // claims are read by EnsureRequirements against this node's
        // output); a key the projection dropped ends the claimable PREFIX
        // — a prefix of a delivered ordering is itself delivered
        sort.order.iterator.map { so =>
          so.child match {
            case a: AttributeReference if d.orderingPortable(a.dataType) =>
              val ids = keyIds(a)
              projection match {
                case None =>
                  if (f.inner.outputSet.contains(a)) Some(so) else None
                case Some(list) => list.collectFirst {
                  case out: AttributeReference if ids.contains(out.exprId) =>
                    so.copy(child = out)
                  case al: org.apache.spark.sql.catalyst.expressions.Alias
                      if al.child.semanticEquals(a) ||
                        (al.child match {
                          case c: AttributeReference => ids.contains(c.exprId)
                          case _ => false
                        }) =>
                    so.copy(child = al.toAttribute)
                }
              }
            case _ => None
          }
        }.takeWhile(_.isDefined).flatten.toSeq
    }
  }
}
