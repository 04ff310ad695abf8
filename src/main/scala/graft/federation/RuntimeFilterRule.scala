package graft.federation

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, IsNotNull, KnownFloatingPointNormalized, PredicateHelper}
import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, Join, LocalLimit, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.federation.plans.{FederatedPlan, RemoteRuntimeFilter}

/** Runtime (dynamic) filter pushdown into remote scans — the Spark
  * re-expression of the reference's `handle_child_pushdown_result`
  * (src/sql/mod.rs:416-444): the remote scan node accepts filters derived
  * from its join parents and hands them to the executor with the query.
  *
  * Spark's own runtime filters (DPP, bloom) only target file/DSv2 sources,
  * so a remote fact joined to a small local dimension would stream the fact
  * unfiltered through the join. This rule spots
  * `Join(FederatedPlan, smallLocal)` equi-joins where filtering the remote
  * side by the other side's key set is semantics-preserving, and attaches a
  * [[RemoteRuntimeFilter]] to the fragment. At execution time
  * ([[graft.federation.exec.RemoteScanExec]]) the build side is evaluated
  * (one bounded job, same cost model as Spark's DPP subqueries) and the key
  * set is inlined into the remote SQL as an IN-list, or a min/max range
  * when the key set exceeds the cap — so at 100 TB only the matching slice
  * of the remote fact ever crosses the wire.
  *
  * Safety: an IN-list on the build side's non-null key values is a superset
  * of the rows the join can emit from the filtered side, so it is only
  * attached where dropped non-matching rows cannot surface: the
  * streamed side of Inner/LeftSemi joins, the left of RightOuter, the
  * right of LeftOuter/LeftAnti. Null-safe equality (`<=>`) never
  * qualifies — null keys would match.
  *
  * Runs after [[FederationRule]] in the same (fixpoint) batch; the
  * attachment is deterministic from the join structure, so re-running
  * converges.
  */
object RuntimeFilterRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.federation.runtimeFilter.enabled"
  val MaxKeysKey = "spark.graft.federation.runtimeFilter.maxKeys"
  val DefaultMaxKeys = 1024

  /** Key types every dialect's `literal` can render. */
  private def renderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | DateType | TimestampType |
         TimestampNTZType | _: DecimalType => true
    case _ => false
  }

  private def leftFilterable(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | RightOuter => true
    case _ => false
  }

  private def rightFilterable(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | LeftAnti | LeftOuter => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, joinType, Some(cond), _) =>
        val pairs = equiPairs(cond, left, right)
        if (pairs.isEmpty) j
        else {
          val newLeft =
            if (leftFilterable(joinType))
              attach(left, right, pairs, threshold)
            else left
          val newRight =
            if (rightFilterable(joinType))
              attach(right, left, pairs.map(_.swap), threshold)
            else right
          if ((newLeft eq left) && (newRight eq right)) j
          else j.copy(left = newLeft, right = newRight)
        }
    }
  }

  /** Strip the float normalization Catalyst wraps around FP join keys
    * (`KnownFloatingPointNormalized(NormalizeNaNAndZero(k))`). Rendering
    * stays safe without it: -0.0 vs 0.0 is equal under SQL comparison on
    * any engine, and non-finite build keys make the render skip the filter
    * entirely (RemoteScanExec.renderFilter). */
  private def unwrapNorm(e: Expression): Expression = e match {
    case KnownFloatingPointNormalized(inner) => unwrapNorm(inner)
    case NormalizeNaNAndZero(inner) => unwrapNorm(inner)
    case _ => e
  }

  /** Equi-key pairs (leftSideKey, rightSideKey) from the conjunctive
    * condition — strict equality only (see null note above). */
  private def equiPairs(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[(Expression, Expression)] =
    splitConjunctivePredicates(cond).collect {
      case EqualTo(l, r)
          if l.references.subsetOf(left.outputSet) &&
             r.references.subsetOf(right.outputSet) =>
        (unwrapNorm(l), unwrapNorm(r))
      case EqualTo(l, r)
          if r.references.subsetOf(left.outputSet) &&
             l.references.subsetOf(right.outputSet) =>
        (unwrapNorm(r), unwrapNorm(l))
    }

  /** Builds with an EXACTLY known row count at or under this are admitted
    * regardless of shape: the shape heuristic below is a stand-in for
    * "small at runtime", and a stats-exact row count is strictly better
    * evidence (the r10 boundary stress joined a 15M-row remote fact to a
    * 20k-row generated key frame — no Filter in the build, so the shape
    * bar refused and 15M rows crossed the wire for a 20k-key join). The
    * real size bounding is done in BYTES at each consumer (the broadcast
    * threshold here, BindJoinRule's maxBytes + the dialect's maxBindRows
    * there); this cap only stops obviously-fact-sized builds from being
    * evaluated eagerly at all. */
  val ExactRowCap: BigInt = BigInt(65536)

  /** Same bar as Spark's own runtime-filter injection: only a build side
    * that prunes something (filter/limit/aggregate in its tree) — or whose
    * row count is exactly known and small ([[ExactRowCap]]) — promises a
    * selective key set; an unfiltered dimension scan of unknown size would
    * push a key range covering the whole fact for nothing. Catalyst infers
    * IsNotNull(joinKey) on every equi-join build side, so null guards
    * alone do NOT count as selection. */
  def selective(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case f: Filter if hasRealPredicate(f.condition) => ()
      case _: GlobalLimit | _: LocalLimit | _: Aggregate => ()
    }.nonEmpty || exactRows(plan).exists(_ <= ExactRowCap)

  /** A row count that is exact by construction. Non-CBO stats propagation
    * (SizeInBytesOnlyStatsPlanVisitor) drops `rowCount` at every unary
    * node, so a bare Project over a Range/LocalRelation reads as
    * unknown — but Project is row-preserving, so the child's exact count
    * IS the plan's. */
  def exactRows(plan: LogicalPlan): Option[BigInt] = plan match {
    case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
      exactRows(p.child)
    case _ => plan.stats.rowCount
  }

  private def hasRealPredicate(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case IsNotNull(_: AttributeReference) => false
      case _ => true
    }

  /** Attach filters to `side` when it is a federated fragment and `build`
    * is cheap enough to evaluate eagerly (the broadcast bar: if Spark
    * would ship it to every executor, one driver-side scan of it is free
    * by comparison). The fragment key must be a bare output attribute so
    * the predicate can name a column of the generated remote SQL. */
  private def attach(side: LogicalPlan, build: LogicalPlan,
      pairs: Seq[(Expression, Expression)], threshold: Long): LogicalPlan =
    side match {
      case f: FederatedPlan
          if build.stats.sizeInBytes <= threshold && selective(build) =>
        val fresh = pairs.collect {
          case (a: AttributeReference, bk)
              if f.outputSet.contains(a) && renderable(a.dataType) &&
                 bk.deterministic && renderable(bk.dataType) =>
            RemoteRuntimeFilter(a, build, bk)
        }.filterNot(rf => f.runtimeFilters.exists(old =>
          old.column.semanticEquals(rf.column) &&
            old.buildKey.semanticEquals(rf.buildKey)))
        if (fresh.isEmpty) side
        else f.copy(runtimeFilters = f.runtimeFilters ++ fresh)
      // A LOCAL Filter/Project wrapper above the leaf must not hide the
      // fragment (seen in the r10 boundary stress: Catalyst's
      // InferFiltersFromConstraints derived a pmod predicate the dialect
      // refuses to unparse, leaving Filter(Project(Federated)) on the
      // fragment side — and 15M rows crossed unfiltered). Reducing the
      // leaf by a superset-of-join-matches key set commutes with any
      // local Filter or Project: dropped rows can only be rows the join
      // above would drop anyway. NOT safe through multiplicity- or
      // content-changing nodes (Limit/Aggregate/Window), so only these
      // two shapes recurse; the inner case re-checks that the join key
      // is an output of the leaf itself, so renames terminate safely.
      case flt @ Filter(_, child) =>
        val nc = attach(child, build, pairs, threshold)
        if (nc eq child) side else flt.copy(child = nc)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        val nc = attach(p.child, build, pairs, threshold)
        if (nc eq p.child) side else p.copy(child = nc)
      case _ => side
    }
}
