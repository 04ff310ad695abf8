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
    * splitting. Split balance depends entirely on the column's cardinality:
    * modulo-n over a 1..7 column (`l_linenumber`) leaves splits empty or
    * 2× skewed, over a dense surrogate key it is near-uniform. Preference
    * order among integral output attributes:
    *   1. statistics-informed — the attribute with the highest known
    *      distinctCount (catalog/CBO column stats, when the remote engine
    *      provides them);
    *   2. name heuristic — an attribute ending in "key" (TPC-H-style
    *      surrogate keys are dense and high-cardinality);
    *   3. fallback — the first integral attribute (previous behavior). */
  def splitColumn(plan: LogicalPlan): Option[Attribute] = {
    if (!scanShaped(plan)) return None
    pickInformed(plan.output.filter(a => integral(a.dataType)), plan)
  }

  /** Shared candidate chooser: statistics-informed (highest known
    * distinctCount — balance tracks cardinality) → `*key` name heuristic
    * (TPC-H-style surrogate keys are dense) → first candidate.
    *
    * Cardinality comes from `plan.stats.attributeStats` when CBO filled
    * them, and otherwise from the executor's own (bounded, cached)
    * column probes through the fragment's [[RemoteRelation]] leaves — a
    * 16-cursor split that lands on a 3-value column costs far more than
    * one sample aggregate, and at 100 TB the chooser is exactly the
    * place that must not run blind. At-cap tables report sample ndv
    * (ranking survives sampling even when totals are unknown). */
  private def pickInformed(candidates: Seq[Attribute],
      statsSource: LogicalPlan): Option[Attribute] = {
    if (candidates.isEmpty) return None
    if (candidates.size == 1) return candidates.headOption
    val colStats =
      try statsSource.stats.attributeStats
      catch { case scala.util.control.NonFatal(_) =>
        org.apache.spark.sql.catalyst.expressions.AttributeMap.empty[
          org.apache.spark.sql.catalyst.plans.logical.ColumnStat]
      }
    def executorNdv(a: Attribute): Option[BigInt] =
      statsSource.collectFirst {
        case r: RemoteRelation if r.outputSet.contains(a) =>
          try r.executor.columnStatistics(r.ref)
            .get(a.name).flatMap(_.distinctCount)
          catch { case scala.util.control.NonFatal(_) => None }
      }.flatten
    val byDistinct = candidates.flatMap { a =>
      colStats.get(a).flatMap(_.distinctCount).orElse(executorNdv(a))
        .map(a -> _)
    }
    if (byDistinct.nonEmpty) Some(byDistinct.maxBy(_._2)._1)
    else candidates.find(_.name.toLowerCase.endsWith("key"))
      .orElse(candidates.headOption)
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Window-aware splittability (r12): a fragment whose spine is
    * Project/Filter/SubqueryAlias/Window over a scan-shaped core splits
    * on a column that is a PARTITION key of EVERY window — each split's
    * filter keeps whole groups, and filtering a window's input to
    * complete groups commutes with the window (and with the per-row
    * Project/Filter above it). The filter must inject BELOW the lowest
    * window: engines do not push predicates through window operators
    * (probed on DuckDB — even `grp = 3` stays above WINDOW), so an
    * outer-wrapped split would recompute the FULL window per cursor.
    * Returns the split attribute and the lowest Window node (the
    * injection point); None when the shape or keys do not allow it. */
  def windowSplit(plan: LogicalPlan): Option[(Attribute, LogicalPlan)] = {
    // every group-local node on the spine with its partition keys; the
    // LAST one is the injection point (WindowGroupLimit — the optimizer's
    // per-group truncation under rank<=k filters — counts: it keeps
    // whole groups exactly like the Window above it)
    val grouped =
      scala.collection.mutable.ArrayBuffer.empty[(LogicalPlan, Seq[Expression])]
    def spine(p: LogicalPlan): Boolean = p match {
      case w: Window if w.expressions.forall(_.deterministic) =>
        grouped += ((w, w.partitionSpec)); spine(w.child)
      case wgl: WindowGroupLimit =>
        grouped += ((wgl, wgl.partitionSpec)); spine(wgl.child)
      case pr: Project if pr.projectList.forall(_.deterministic) =>
        spine(pr.child)
      case f: Filter if f.condition.deterministic => spine(f.child)
      case s: SubqueryAlias => spine(s.child)
      case core => scanShaped(core)
    }
    if (!spine(plan) || !grouped.exists(_._1.isInstanceOf[Window]))
      return None
    val lowest = grouped.last._1
    // candidate = bare integral attr in EVERY group-local node's partition
    val keySets = grouped.map(_._2.collect {
      case a: AttributeReference if integral(a.dataType) => a.exprId
    }.toSet)
    val shared = keySets.reduce(_ intersect _)
    if (shared.isEmpty) return None
    val core = lowest.children.head
    val candidates = core.output.filter(a => shared.contains(a.exprId))
    // same stats-informed → *key → first choice as plain splits (r12
    // verdict item 6: the heuristic alone picked the FIRST integral
    // partition key regardless of cardinality — a 3-value key next to a
    // dense one left cursors 30× skewed); stats come from the CORE under
    // the window, where the split filter injects
    pickInformed(candidates, core).map((_, lowest))
  }

  /** Inject the i-th modulo split filter BELOW the lowest group-local
    * node (see [[windowSplit]] for why the filter cannot wrap the whole
    * plan). */
  def withWindowSplitFilter(plan: LogicalPlan, lowest: LogicalPlan,
      col: Attribute, n: Int, i: Int): LogicalPlan =
    plan.transform {
      case p if p eq lowest =>
        p.mapChildren(c => withSplitFilter(c, col, n, i))
    }

  /** Range-split sibling of [[withWindowSplitFilter]]. */
  def withWindowRangeFilter(plan: LogicalPlan, lowest: LogicalPlan,
      col: Attribute, bounds: Seq[Long], i: Int): LogicalPlan =
    plan.transform {
      case p if p eq lowest =>
        p.mapChildren(c => withRangeFilter(c, col, bounds, i))
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

  /** The i-th of `bounds.size + 1` RANGE split filters — the skew-aware
    * alternative to modulo ([[SqlExecutor.splitBoundaries]] supplies the
    * quantile cuts): split 0 takes `col < b0` plus the NULL arm, middle
    * splits take half-open `[b(i-1), b(i))` ranges, the last takes
    * `col >= b(last)`. Disjoint and exhaustive for ANY value distribution
    * — a column whose values all share a residue class (where modulo-n
    * leaves n−1 cursors empty) still cuts into near-equal ranges. */
  def withRangeFilter(plan: LogicalPlan, col: Attribute,
      bounds: Seq[Long], i: Int): LogicalPlan = {
    require(bounds.nonEmpty && i >= 0 && i <= bounds.size)
    val c = if (col.dataType == LongType) col else Cast(col, LongType)
    def lit(v: Long) = Literal(v, LongType)
    val pred =
      if (i == 0) Or(LessThan(c, lit(bounds.head)), IsNull(col))
      else if (i == bounds.size) GreaterThanOrEqual(c, lit(bounds.last))
      else And(GreaterThanOrEqual(c, lit(bounds(i - 1))),
        LessThan(c, lit(bounds(i))))
    Filter(pred, plan)
  }
}
