package graft.federation.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics, StreamSourceAwareLogicalPlan}
import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.types.StructType

import graft.federation.FederationProvider
import graft.federation.sql.{RemoteTableRef, SqlExecutor}

/** Leaf logical node for a table that lives on a remote engine.
  *
  * The Spark analog of the reference's `FederatedTableProviderAdaptor` +
  * `SQLTableSource` (src/table_provider.rs:20-158, src/sql/table.rs:118-176):
  * it carries the remote name, the eagerly-inferred schema, and the
  * executor, so the unparser emits remote names directly — no post-hoc
  * string rewriting of table names is needed (SURVEY §2c,
  * RewriteTableScanAnalyzer note).
  */
final case class RemoteRelation(
    ref: RemoteTableRef,
    executor: SqlExecutor,
    output: Seq[AttributeReference],
    hooks: Option[graft.federation.sql.TableHooks] = None,
    // the streaming fed source substitutes this leaf into a microbatch
    // plan (FedStreamScanRule): the flag must survive so stateful
    // operators above keep planning incrementally (StateStore placement
    // keys off Aggregate.isStreaming)
    override val isStreaming: Boolean = false,
    // the SparkDataStream this leaf reads a microbatch of, when it came
    // from FedStreamScanRule — threaded to RemoteScanExec so the engine's
    // ProgressContext meters the scan's numOutputRows as the source's
    // numInputRows (StreamSourceAwareSparkPlan contract)
    stream: Option[SparkDataStream] = None)
  extends LeafNode with MultiInstanceRelation
    with StreamSourceAwareLogicalPlan {

  override def withStream(s: SparkDataStream): LogicalPlan =
    copy(stream = Some(s))

  override def getStream: Option[SparkDataStream] = stream

  override def newInstance(): RemoteRelation =
    copy(output = output.map(_.newInstance()))

  override def computeStats(): Statistics = {
    val base = executor.statistics(ref).getOrElse(
      Statistics(sizeInBytes = conf.defaultSizeInBytes))
    // column stats are read only by cost-based optimization — don't pay
    // the (bounded, cached) per-column probes unless CBO will use them
    if (!conf.cboEnabled) base
    else {
      val byName = executor.columnStatistics(ref)
      if (byName.isEmpty) base
      else base.copy(attributeStats =
        org.apache.spark.sql.catalyst.expressions.AttributeMap(
          output.flatMap(a => byName.get(a.name).map(a -> _))))
    }
  }

  def schema2: StructType = org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(output)

  override def simpleString(maxFields: Int): String =
    s"RemoteRelation [${executor.name}] $ref"
}

object RemoteRelation {
  def apply(ref: RemoteTableRef, executor: SqlExecutor): RemoteRelation =
    apply(ref, executor, None)

  def apply(ref: RemoteTableRef, executor: SqlExecutor,
      hooks: Option[graft.federation.sql.TableHooks]): RemoteRelation = {
    val schema = executor.tableSchema(ref)
    RemoteRelation(ref, executor,
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
      hooks)
  }
}

/** A runtime filter attached to a federated fragment: at execution time
  * the small local `buildPlan` is evaluated and its distinct `buildKey`
  * values are inlined into the remote SQL as an IN-list (or min/max range)
  * predicate on the fragment output `column` — the Spark re-expression of
  * the reference's physical filter-pushdown acceptance
  * (`handle_child_pushdown_result`, src/sql/mod.rs:416-444; executor filter
  * contract src/sql/executor.rs:45-56), with the broadcast-join build side
  * playing the role of the parent filter. Without it, a remote fact joined
  * against a small local dimension streams the fact unfiltered. */
final case class RemoteRuntimeFilter(
    column: AttributeReference,
    buildPlan: LogicalPlan,
    buildKey: org.apache.spark.sql.catalyst.expressions.Expression)

/** A bind join attached to a federated fragment: the small `buildPlan` is
  * evaluated locally at execution time and inlined into the remote SQL as
  * a `(VALUES ...) AS t(...)` derived table, and the equi-join COMPLETES
  * on the remote engine — the classic federation bind join (SQL/MED
  * wrapper literature; Trino/Presto connector join pushdown is the same
  * move). Where a [[RemoteRuntimeFilter]] only pre-filters the fragment
  * (the join still runs locally and re-streams the build side), a bind
  * join ships O(build rows) out and O(join result) back, and the local
  * join disappears entirely.
  *
  * `buildOutput` keeps the build side's original attributes (exprIds
  * intact) so the widened fragment output resolves in parent plans;
  * `keys` pairs a bare fragment output column with the build output
  * attribute it equi-joins to; `buildLeft` records which side of the
  * original join the build was on (output ordering; Inner only).
  *
  * `joinType` is Inner (VALUES join, output widens by the build
  * columns), LeftSemi (`WHERE EXISTS` against the VALUES table) or
  * LeftAnti (`WHERE NOT EXISTS`) — for semi/anti the output is the
  * fragment's alone, and SQL equality inside (NOT) EXISTS reproduces
  * Spark's strict-EqualTo semi/anti null semantics exactly (a NULL key
  * compares unknown → EXISTS false → semi drops / anti keeps the row,
  * as Spark does).
  *
  * `residual` holds FRAGMENT-side-only non-equi conjuncts of the join
  * condition (e.g. `frag.date < X` riding along with the key equality),
  * proven unparsable-in-dialect at planning time by
  * [[graft.federation.BindJoinRule]]. Rendering preserves Spark's
  * condition-must-be-TRUE semantics per join type: Inner appends a WHERE
  * on the wrapped join; semi/anti render the residual INSIDE the (NOT)
  * EXISTS subquery — an anti row whose residual evaluates to NULL must be
  * KEPT (the condition is never TRUE), which an outer `WHERE NOT (p AND
  * EXISTS …)` would get wrong (NULL → row dropped). Build-side or
  * mixed-side residuals refuse the bind entirely. */
final case class RemoteBindJoin(
    buildPlan: LogicalPlan,
    buildOutput: Seq[Attribute],
    keys: Seq[(AttributeReference, Attribute)],
    buildLeft: Boolean,
    joinType: org.apache.spark.sql.catalyst.plans.JoinType =
      org.apache.spark.sql.catalyst.plans.Inner,
    residual: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil)

/** Opaque logical node wrapping a sub-plan that will run remotely.
  *
  * A LeafNode on purpose: exposing no children/expressions freezes the
  * fragment against later optimizer batches, the same trick as the
  * reference's `FederatedPlanNode` (`UserDefinedLogicalNode` with no
  * inputs/exprs, src/plan_node.rs:18-73).
  */
final case class FederatedPlan(
    inner: LogicalPlan,
    provider: FederationProvider,
    runtimeFilters: Seq[RemoteRuntimeFilter] = Nil,
    bindJoins: Seq[RemoteBindJoin] = Nil)
  extends LeafNode {

  // streaming fragments (FedStreamScanRule substitutions) must keep the
  // flag through the opaque wrap, or stateful operators above would
  // silently plan as batch
  override def isStreaming: Boolean = inner.isStreaming

  /** Output widens per bind in wrap order: each successive inner bind's
    * build columns append on its own side of the previous layer's output
    * (semi/anti binds filter the fragment; no widening). Must stay
    * positionally consistent with [[graft.federation.exec.RemoteScanExec]]'s
    * fold over the same sequence. */
  override def output: Seq[Attribute] = bindJoins.foldLeft(inner.output) {
    (acc, bj) => bj.joinType match {
      case org.apache.spark.sql.catalyst.plans.Inner =>
        if (bj.buildLeft) bj.buildOutput ++ acc else acc ++ bj.buildOutput
      case _ => acc // semi/anti: subset of the fragment rows
    }
  }

  /** Propagate the fragment's estimated stats so Spark can still pick
    * broadcast joins over small federated fragments (reference statistics
    * hook, src/sql/executor.rs:61-63).
    *
    * The local estimate inherits the base table's size through Filters
    * (Catalyst's size-only visitor doesn't reduce on selection), so a
    * heavily filtered fragment of a big remote table would never
    * broadcast. When that is the situation — fragment carries a filter,
    * local estimate alone is over the broadcast bar — ask the executor
    * for fragment-level statistics (reference `statistics(plan)`,
    * src/sql/executor.rs:61-63: the hook takes the plan, not a name).
    * Probing is skipped whenever it cannot flip the decision, and
    * executors cache per fragment SQL, so planning stays cheap. */
  override def computeStats(): Statistics = {
    val local = inner.stats
    val threshold = conf.autoBroadcastJoinThreshold
    val probed = provider match {
      case p: graft.federation.sql.SqlFederationProvider
          if threshold > 0 && local.sizeInBytes > threshold && hasSelection =>
        try p.executor.fragmentStatistics(p.unparse(inner), schema2)
        catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
    probed.getOrElse(local)
  }

  // same selectivity bar as the runtime-filter rule: inferred
  // IsNotNull(joinKey) guards alone don't justify a remote probe
  private lazy val hasSelection: Boolean =
    graft.federation.RuntimeFilterRule.selective(inner)

  private def schema2: StructType =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(output)

  override def simpleString(maxFields: Int): String = {
    val rf = if (runtimeFilters.isEmpty) ""
      else s" rfilters=[${runtimeFilters.map(_.column.name).mkString(",")}]"
    val bj = if (bindJoins.isEmpty) "" else
      bindJoins.map(b =>
        s" bind=[${b.keys.map(k => k._1.name + "=" + k._2.name).mkString(",")}]")
        .mkString
    s"Federated [${provider.name}]$rf$bj"
  }
}
