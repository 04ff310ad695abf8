package graft.federation.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

import graft.federation.plans.RemoteRelation

/** Parallel remote reads via disjoint split predicates — the federation
  * analog of Spark JDBC's `partitionColumn`/`numPartitions`, generalized
  * from single tables to whole pushed-down fragments.
  *
  * A fragment is '''splittable''' when it is a pure scan shape — only
  * Project/Filter/Join/SubqueryAlias over [[RemoteRelation]] leaves, all
  * expressions deterministic. Appending `WHERE ((col % n) + n) % n = i`
  * to such a fragment partitions its result set exactly (the predicates
  * are disjoint and exhaustive), so the union of the n split queries is
  * the unsplit result. Sort/limit/offset make splits order-sensitive, and
  * aggregates would be recomputed per split, so those shapes stay single.
  *
  * At 100 TB this is the difference between one remote cursor and n
  * parallel cursors feeding n Spark partitions: each split SQL is executed
  * independently (by a separate task on a real cluster), and downstream
  * local operators consume n-way parallel input instead of a single
  * stream. The reference leaves this open (1-partition
  * `VirtualExecutionPlan`, src/sql/mod.rs:175-180) — SURVEY §7.4 risk 7
  * calls for designing the scan for n partitions from day one.
  */
object SplitScan {

  /** The split column for `plan`, when the fragment's shape allows
    * splitting: the first integral-typed output attribute. */
  def splitColumn(plan: LogicalPlan): Option[Attribute] =
    if (scanShaped(plan)) plan.output.find(a => integral(a.dataType))
    else None

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def scanShaped(plan: LogicalPlan): Boolean = plan match {
    case _: RemoteRelation => true
    case p @ (_: Project | _: Filter | _: Join | _: SubqueryAlias) =>
      p.expressions.forall(_.deterministic) && p.children.forall(scanShaped)
    case _ => false
  }

  /** Wrap `plan` with the i-th of n disjoint, exhaustive split filters on
    * `col`: ((col % n) + n) % n = i (double-remainder = non-negative modulo,
    * portable SQL — no engine-specific pmod). NULL split-column values fail
    * every modulo predicate, so split 0 additionally takes `col IS NULL` —
    * the same exhaustiveness repair Spark JDBC applies to its first
    * partitionColumn stride. */
  def withSplitFilter(plan: LogicalPlan, col: Attribute, n: Int,
      i: Int): LogicalPlan = {
    val nL = Literal(n.toLong, LongType)
    val c = if (col.dataType == LongType) col else Cast(col, LongType)
    val bucket = Remainder(Add(Remainder(c, nL), nL), nL)
    val eq = EqualTo(bucket, Literal(i.toLong, LongType))
    val pred = if (i == 0) Or(eq, IsNull(col)) else eq
    Filter(pred, plan)
  }
}
