package graft.federation

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** A remote execution engine that can run sub-plans on our behalf.
  *
  * Mirrors the reference's `FederationProvider` trait
  * (datafusion-federation src/lib.rs:56-90): `name` + `computeContext`
  * discriminate engine *instances* (two MySQLs with the same name but
  * different URLs must not be merged — reference warning at
  * src/sql/executor.rs:25-29), and the provider self-determines how much of
  * a sub-plan it accepts via [[optimize]].
  */
trait FederationProvider {
  def name: String

  /** Instance/catalog/credential discriminator. `None` risks wrongly
    * merging distinct databases; concrete providers should always set it. */
  def computeContext: Option[String]

  /** Provider-specific optimization of a sub-plan it was handed — for SQL
    * engines this wraps the plan in a [[graft.federation.plans.FederatedPlan]].
    * Returns None when the provider cannot accept the plan (the rule then
    * leaves it local). */
  def optimize(plan: LogicalPlan): Option[LogicalPlan]

  override def equals(other: Any): Boolean = other match {
    case p: FederationProvider =>
      p.name == name && p.computeContext == computeContext
    case _ => false
  }
  override def hashCode(): Int = (name, computeContext).##
}

/** Placeholder provider for plain local tables so the lattice logic stays
  * uniform (reference `NopFederationProvider`, optimizer/mod.rs:308-324):
  * a join of a remote table with a local parquet table must come out
  * `Ambiguous`, not `Distinct(remote)`. */
object NopFederationProvider extends FederationProvider {
  override val name: String = "nop"
  override val computeContext: Option[String] = None
  override def optimize(plan: LogicalPlan): Option[LogicalPlan] = None
}

/** 3-state lattice describing which provider(s) a subtree scans.
  *
  * Merge semantics verbatim from the reference
  * (src/optimizer/scan_result.rs:14-27):
  * {{{
  *   None ∧ x            = x
  *   Distinct(a) ∧ Distinct(a) = Distinct(a)
  *   Distinct(a) ∧ Distinct(b) = Ambiguous   (a ≠ b)
  *   Ambiguous ∧ x       = Ambiguous
  * }}}
  */
sealed trait ScanResult {
  import ScanResult._

  def merge(other: ScanResult): ScanResult = (this, other) match {
    case (NoScan, x) => x
    case (x, NoScan) => x
    case (Distinct(a), Distinct(b)) if a == b => this
    case _ => Ambiguous
  }

  def isAmbiguous: Boolean = this == Ambiguous
  def isDistinct: Boolean = this.isInstanceOf[Distinct]
  def providerOpt: Option[FederationProvider] = this match {
    case Distinct(p) => Some(p)
    case _ => None
  }
}

object ScanResult {
  /** Subtree scans no tables at all (e.g. OneRowRelation). */
  case object NoScan extends ScanResult
  /** Subtree scans exactly one provider. */
  final case class Distinct(provider: FederationProvider) extends ScanResult
  /** Subtree mixes providers (or contains a construct that blocks
    * federation, e.g. an already-federated node or a subquery). */
  case object Ambiguous extends ScanResult

  def merge(results: Iterable[ScanResult]): ScanResult =
    results.foldLeft[ScanResult](NoScan)(_ merge _)
}
