package graft.federation

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Join distribution over federation boundaries — the join-shaped sibling
  * of [[PartialAggRule]] / [[TopKPushdownRule]] / [[GroupTopKPushdownRule]]
  * (all beyond the reference, whose `FederationOptimizerRule` federates
  * whole single-provider subtrees only: a join between a multi-provider
  * UNION and a small dimension ships EVERY union row to the local engine
  * and joins there).
  *
  * Rewrite (join distributivity over UNION ALL — exact multiset algebra
  * for Inner / LeftOuter / LeftSemi / LeftAnti with the union as the
  * preserved left side):
  * {{{
  *   Join(Union(c1 .. cn), dim)
  *     ==>  Project[restore] (Union(Join(c1, dim'1) .. Join(cn, dim'n)))
  * }}}
  * where each `dim'i` is a fresh-exprId clone of the dimension subtree.
  * The per-arm joins then federate through the rules already in the
  * batch, each by the best means available to its arm:
  *
  *  - arm and dim on the SAME provider → [[FederationRule]] federates the
  *    whole join as one remote SQL (the biggest win: only join results
  *    travel);
  *  - local inline dim ([[InlineValues]]) → the arm's SQL carries the dim
  *    as a `(VALUES …)` table, again one SQL per provider;
  *  - anything else small → [[BindJoinRule]] / [[RuntimeFilterRule]]
  *    handle the per-arm join exactly as they would a non-union join.
  *
  * At 100 TB the union arms are the big side (fact partitions living on
  * different engines); the wire cost drops from O(union rows) to
  * O(join results), while the duplicated dim work is bounded by the
  * smallness guard below.
  *
  * Eligibility:
  *  - union on the LEFT, join type Inner / LeftOuter / LeftSemi /
  *    LeftAnti (each distributes exactly over the left union; RightOuter/
  *    FullOuter do NOT — a dim row unmatched in c1 must not surface
  *    per-arm), condition present and deterministic;
  *  - the union cannot federate wholesale but ≥1 child is remote (same
  *    profitability bar as the sibling rules — a single-provider
  *    union+join is better shipped as one SQL, and a pure-local plan
  *    gains nothing);
  *  - the dim subtree is deterministic Project/Filter nodes over ONE
  *    multi-instance leaf ([[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]] /
  *    [[graft.federation.plans.RemoteRelation]]) — the shapes we can
  *    clone with fresh exprIds without a full DeduplicateRelations pass —
  *    with stats under `spark.graft.federation.unionJoin.maxBytes`
  *    (1 MB default: per-arm duplication of dim work is only safe for
  *    genuinely small dims; a remote dim is re-read once per arm);
  *  - no duplicate or overlapping exprIds between the union output and
  *    the dim output (the positional remap must be a function).
  *
  * Idempotence: the rewrite leaves `Union(Join(..))` — the pattern
  * `Join(Union(..), _)` no longer occurs in the produced subtree, and on
  * later fixpoint iterations the arms are `FederatedPlan` leaves whose
  * lattice result is Ambiguous, which fails the someRemote bar anyway.
  */
object JoinUnionDistributeRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.federation.unionJoin.enabled"
  val MaxBytesKey = "spark.graft.federation.unionJoin.maxBytes"
  val DefaultMaxBytes = 1048576L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val maxBytes =
      conf.getConfString(MaxBytesKey, DefaultMaxBytes.toString).toLong
    plan.transformUp {
      case j @ Join(u: Union, dim,
          Inner | LeftOuter | LeftSemi | LeftAnti, Some(cond), _)
          if eligible(u, dim, cond, maxBytes) =>
        distribute(j, u, dim, cond, unionLeft = true)
      // symmetric shape: the union syntactically on the RIGHT. Inner is
      // commutative; RightOuter preserves the union side, so both
      // distribute exactly. (If both sides are unions, freshDim refuses
      // the non-distributed side and neither case fires.)
      case j @ Join(dim, u: Union, Inner | RightOuter, Some(cond), _)
          if eligible(u, dim, cond, maxBytes) =>
        distribute(j, u, dim, cond, unionLeft = false)
    }
  }

  // ------------------------------------------------------------ clone

  /** Fresh-exprId clone of a dim subtree (deterministic Project / Filter
    * over one multi-instance leaf), plus the old→new output mapping. */
  private def freshDim(p: LogicalPlan)
      : Option[(LogicalPlan, Map[ExprId, Attribute])] = p match {
    case leaf: LeafNode with MultiInstanceRelation =>
      val fresh = leaf.newInstance().asInstanceOf[LogicalPlan]
      Some((fresh, leaf.output.map(_.exprId).zip(fresh.output).toMap))
    case Project(list, child) if list.forall(_.deterministic) =>
      freshDim(child).flatMap { case (c2, m) =>
        val list2 = list.map {
          case a: Alias =>
            Some(Alias(remap(a.child, m), a.name)(
              qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata)))
          case a: AttributeReference => m.get(a.exprId)
          case _ => None
        }
        if (list2.exists(_.isEmpty)) None
        else {
          val proj = Project(list2.map(_.get), c2)
          Some((proj, p.output.map(_.exprId).zip(proj.output).toMap))
        }
      }
    case Filter(cond, child) if cond.deterministic =>
      freshDim(child).map { case (c2, m) =>
        (Filter(remap(cond, m), c2), m)
      }
    case _ => None
  }

  private def remap(e: Expression, m: Map[ExprId, Attribute]): Expression =
    e.transform {
      case a: AttributeReference => m.getOrElse(a.exprId, a)
    }

  // ---------------------------------------------------------- rewrite

  private def distribute(j: Join, u: Union, dim: LogicalPlan,
      cond: Expression, unionLeft: Boolean): LogicalPlan = {
    val arms = u.children.map { child =>
      // Union.output reuses the head child's exprIds, so for arm 0 this
      // is the identity map — the same positional remap as the sibling
      // pushdown rules
      val uMap: Map[ExprId, Attribute] =
        u.output.map(_.exprId).zip(child.output).toMap
      val (dimClone, dMap) = freshDim(dim).get // eligibility pre-checked
      val condI = remap(cond, uMap ++ dMap)
      if (unionLeft) Join(child, dimClone, j.joinType, Some(condI), j.hint)
      else Join(dimClone, child, j.joinType, Some(condI), j.hint)
    }
    val newUnion = Union(arms, byName = false, allowMissingCol = false)
    // Restore the original output exprIds (the union-side columns already
    // carry them — head-child reuse — so only Inner/LeftOuter dim columns
    // need an alias; semi/anti need no Project at all).
    val restore = newUnion.output.zip(j.output).map { case (n, o) =>
      if (n.exprId == o.exprId) n
      else Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
        explicitMetadata = Some(o.metadata))
    }
    if (restore.forall(_.isInstanceOf[AttributeReference])) newUnion
    else Project(restore, newUnion)
  }

  // ------------------------------------------------------------ guards

  private def eligible(u: Union, dim: LogicalPlan, cond: Expression,
      maxBytes: Long): Boolean = {
    if (u.byName || u.allowMissingCol || u.children.size < 2) return false
    if (!cond.deterministic) return false
    // remaps must be functions: distinct ids within each side, none shared
    val uIds = u.output.map(_.exprId)
    val dIds = dim.output.map(_.exprId)
    if (uIds.distinct.size != uIds.size) return false
    if (dIds.distinct.size != dIds.size) return false
    if (uIds.toSet.intersect(dIds.toSet).nonEmpty) return false
    // dim: clonable shape, bounded size
    if (dim.stats.sizeInBytes > maxBytes) return false
    if (freshDim(dim).isEmpty) return false
    // profitability: the union can't federate wholesale, but ≥1 child can
    val childResults = u.children.map(FederationRule.scanResultOf)
    val wholesale = ScanResult.merge(childResults)
    val someRemote = childResults.exists {
      case ScanResult.Distinct(p) => p != NopFederationProvider
      case _ => false
    }
    wholesale.isAmbiguous && someRemote
  }
}
