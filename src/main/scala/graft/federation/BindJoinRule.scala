package graft.federation

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.federation.plans.{FederatedPlan, RemoteBindJoin}
import graft.federation.sql.SqlFederationProvider

/** Bind-join pushdown (beyond the reference — its optimizer only
  * federates whole same-provider subtrees, src/optimizer/mod.rs:188-209):
  * an INNER equi-join between a federated fragment and a small, selective
  * build side is rewritten so the JOIN ITSELF runs on the remote engine,
  * with the build side inlined into the fragment SQL as a
  * `(VALUES ...) AS t(...)` derived table at execution time
  * ([[graft.federation.exec.RemoteScanExec]]). The classic federation
  * bind join: wire cost drops from O(fragment rows) to
  * O(build rows out + join result back).
  *
  * The build side may itself be a fragment of ANOTHER provider — then the
  * small provider's result is bound into the big provider's query: a
  * cross-provider join that executes remotely.
  *
  * Eligibility (everything else is left to [[RuntimeFilterRule]], which
  * still covers outer/semi shapes, FP keys, oversize builds, and dialects
  * without inline VALUES):
  *  - inner join whose condition is equi-pairs of a bare fragment output
  *    column and a bare build output column, plus optionally
  *    FRAGMENT-side-only deterministic residual conjuncts the fragment's
  *    dialect can render (e.g. `frag.date < X` riding along with the key
  *    equality — trial-unparsed at planning time, rendered into the
  *    wrapped SQL at execution; semi/anti put it INSIDE the (NOT) EXISTS
  *    to preserve NULL semantics). Build-side or MIXED-side residuals
  *    still disqualify — they would reference the build VALUES outside
  *    the equality scope the rewrite provides;
  *  - every build output type renderable as a portable literal, floats
  *    excluded (NaN/Infinity have no SQL spelling, and unlike the
  *    IN-list path there is no safe "skip" once the local join is gone);
  *  - build side deterministic, its stats under
  *    `spark.graft.federation.bindJoin.maxBytes` (the inline SQL is the
  *    wire format — this bar is deliberately far below the broadcast
  *    threshold), and selective in the [[RuntimeFilterRule.selective]]
  *    sense — an unfiltered dimension would only widen the result rows;
  *  - the fragment's dialect supports inline VALUES tables.
  *
  * Runs between [[FederationRule]] and [[RuntimeFilterRule]] in the same
  * fixpoint batch: fragments exist when it fires, and a join it consumes
  * never gets a (then-redundant) runtime filter. A filter attached on an
  * earlier iteration for the same build side is stripped as the bind
  * absorbs it. Idempotent: the rewrite yields a leaf.
  */
object BindJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.federation.bindJoin.enabled"
  val MaxBytesKey = "spark.graft.federation.bindJoin.maxBytes"
  val DefaultMaxBytes = 131072L

  /** Types with portable, total literal rendering — no floats: a
    * non-finite value at execution time could not degrade gracefully. */
  private[federation] def renderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BooleanType | DateType | TimestampType | TimestampNTZType |
         _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val maxBytes =
      conf.getConfString(MaxBytesKey, DefaultMaxBytes.toString).toLong
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _) =>
        tryBind(j, l, r, buildLeft = false, Inner, maxBytes)
          .orElse(tryBind(j, r, l, buildLeft = true, Inner, maxBytes))
          .getOrElse(j)
      // semi/anti: the fragment must be the preserved LEFT side; the
      // build inlines as (NOT) EXISTS against the VALUES table. Strict
      // EqualTo matching refuses Catalyst's null-aware anti (NOT IN)
      // shape, whose condition carries Or/IsNull conjuncts.
      case j @ Join(l, r, jt @ (LeftSemi | LeftAnti), Some(cond), _) =>
        tryBind(j, l, r, buildLeft = false, jt, maxBytes).getOrElse(j)
    }
  }

  private def dialectOk(f: FederatedPlan): Boolean = f.provider match {
    case p: SqlFederationProvider => p.executor.dialect.supportsInlineValues
    case _ => false
  }

  /** Engines with a finite `maxBindRows` (Derby: its VALUES parser dies
    * past ~1000 rows and chunking degrades past a few thousand) bound the
    * build by ROWS at planning time — there is no execution-time fallback
    * once the local join is gone. A known rowCount is checked directly;
    * without one, a conservative bytes-per-row floor stands in (16 B/row
    * is below any renderable build row's stats footprint, so the bound
    * can only over-refuse, never over-admit past cap × 16 bytes). Refused
    * binds still get a runtime filter (IN-list/range) from
    * [[RuntimeFilterRule]]. */
  private def rowsOk(f: FederatedPlan, build: LogicalPlan): Boolean = {
    val cap = f.provider match {
      case p: SqlFederationProvider => p.executor.dialect.maxBindRows
      case _ => Int.MaxValue
    }
    cap == Int.MaxValue || (RuntimeFilterRule.exactRows(build) match {
      case Some(n) => n <= cap
      case None => build.stats.sizeInBytes <= cap.toLong * 16
    })
  }

  /** The selectivity bar, looking through a federated build side (its
    * plan is an opaque leaf; the filters live on `inner`). */
  private def selective(build: LogicalPlan): Boolean = build match {
    case f: FederatedPlan => RuntimeFilterRule.selective(f.inner)
    case other => RuntimeFilterRule.selective(other)
  }

  private def deterministic(build: LogicalPlan): Boolean =
    !build.exists(_.expressions.exists(e => !e.deterministic))

  /** The fragment side as seen by a join: the federated leaf itself, or
    * the leaf under a bare column-pruning Project (Catalyst prunes the
    * widened output of an earlier bind before the NEXT join in a star —
    * the Project must be looked through or only the first dim ever
    * binds). Returns the leaf plus the pruning attribute list. */
  private def unwrapFrag(p: LogicalPlan)
      : Option[(FederatedPlan, Option[Seq[AttributeReference]])] = p match {
    case f: FederatedPlan => Some((f, None))
    case org.apache.spark.sql.catalyst.plans.logical.Project(pl, f: FederatedPlan)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      Some((f, Some(pl.map(_.asInstanceOf[AttributeReference]))))
    case _ => None
  }

  private def tryBind(j: Join, fragSide: LogicalPlan, build: LogicalPlan,
      buildLeft: Boolean, joinType: JoinType,
      maxBytes: Long): Option[LogicalPlan] =
    unwrapFrag(fragSide) match {
      case Some((f, pruned))
          if dialectOk(f) &&
             build.stats.sizeInBytes <= maxBytes &&
             rowsOk(f, build) &&
             // semi/anti output is a SUBSET of the fragment, so ANY small
             // build profits; inner widens rows, so it must be selective
             (joinType != Inner || selective(build)) &&
             deterministic(build) &&
             build.output.forall(a => renderable(a.dataType)) =>
        object EquiPair {
          def unapply(e: org.apache.spark.sql.catalyst.expressions.Expression)
              : Option[(AttributeReference, AttributeReference)] = e match {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if f.outputSet.contains(a) && build.outputSet.contains(b) =>
              Some((a, b))
            case EqualTo(b: AttributeReference, a: AttributeReference)
                if f.outputSet.contains(a) && build.outputSet.contains(b) =>
              Some((a, b))
            case _ => None
          }
        }
        val conjuncts = splitConjunctivePredicates(j.condition.get)
        val pairs = conjuncts.collect { case EquiPair(a, b) => (a, b) }
        val rest = conjuncts.filter(EquiPair.unapply(_).isEmpty)
        // non-pair conjuncts: fragment-side-only deterministic residuals
        // ride into the wrapped SQL's WHERE; anything touching the build
        // side (or non-deterministic, or unrenderable in the fragment's
        // dialect) refuses the bind — RuntimeFilterRule still covers it
        val (residual, disqualifying) = rest.partition(e =>
          e.references.subsetOf(f.outputSet) && e.deterministic)
        // duplicate output names inside either side would make the
        // rendered column references ambiguous; refuse (cf. the
        // PartialAggRule dup-exprId guard). Residual rendering reads
        // fragment columns by NAME, so name uniqueness is required too.
        val unambiguous =
          f.output.map(_.exprId).distinct.size == f.output.size &&
          build.output.map(_.exprId).distinct.size == build.output.size &&
          (residual.isEmpty ||
            f.output.map(_.name).distinct.size == f.output.size)
        if (pairs.isEmpty || disqualifying.nonEmpty || !unambiguous ||
            !residualRenders(f, residual)) None
        else {
          val bound = f.copy(
            runtimeFilters =
              f.runtimeFilters.filterNot(_.buildPlan.sameResult(build)),
            bindJoins = f.bindJoins :+ RemoteBindJoin(
              build, build.output, pairs, buildLeft, joinType, residual))
          pruned match {
            case None => Some(bound)
            case Some(attrs) =>
              // restore the pruning Project, widened to mirror the join's
              // own output: Join(Project(f), build).output is
              // attrs ++ build cols (sides per buildLeft; semi/anti add
              // nothing) — the replacement must stay positionally equal
              val keep: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression] =
                if (joinType == Inner) {
                  if (buildLeft) build.output ++ attrs else attrs ++ build.output
                } else attrs
              Some(org.apache.spark.sql.catalyst.plans.logical.Project(keep, bound))
          }
        }
      case _ => None
    }

  /** Planning-time proof that every residual conjunct renders in the
    * fragment's dialect — once the local join is gone there is no
    * graceful-skip path, so an execution-time unparse failure must be
    * impossible. The trial render uses the same scope the executor will
    * (`bj_sub.<col>` per fragment output), and the unparser is
    * deterministic, so success here guarantees success there. */
  private def residualRenders(f: FederatedPlan,
      residual: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Boolean =
    residual.isEmpty || (f.provider match {
      case p: SqlFederationProvider =>
        val d = p.executor.dialect
        val scope = f.output
          .map(a => a.exprId -> s"bj_sub.${d.quoteIfNeeded(a.name)}").toMap
        try {
          val u = new graft.federation.sql.SqlUnparser(d)
          residual.foreach(e => u.render(e, scope))
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      case _ => false
    })
}
