package graft.federation.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.types.StructType

/** The remote-engine driver interface — Spark analog of the reference's
  * `SQLExecutor` trait (src/sql/executor.rs:18-75): identity + dialect +
  * query execution + catalog introspection + optional hooks.
  *
  * `execute` returns an `RDD[InternalRow]` (not an iterator) so each
  * implementation chooses where the remote I/O happens: the JDBC executor
  * opens connections inside `RDD.compute` on executor tasks (N partitions =
  * N parallel remote cursors); the in-process mock returns the inner
  * session's RDD directly.
  */
trait SqlExecutor {
  def name: String

  /** Instance discriminator (URL + user for JDBC). See
    * [[graft.federation.FederationProvider.computeContext]]. */
  def computeContext: Option[String]

  def dialect: SqlDialect

  /** Run `sql` remotely; rows must match `schema` positionally. */
  def execute(sql: String, schema: StructType): RDD[InternalRow]

  /** [[execute]] for one of `siblings` concurrently-opened split cursors
    * of the same fragment. Engines that spin up their own compute per
    * cursor should cap it to a fair share — n embedded engine instances
    * each grabbing every core thrash instead of parallelize (measured on
    * the 50M window-split stress: 16 cursors × all-cores quadrupled the
    * single-cursor wall; 16 × cores/16 beat it 1.7×). A remote SERVER
    * engine does its own admission control — the default just delegates. */
  def executeSplit(sql: String, schema: StructType,
      siblings: Int): RDD[InternalRow] = execute(sql, schema)

  /** Remote catalog listing (the engine's default schema). */
  def tableNames: Seq[String]

  /** Listing of one NAMED engine schema — the reference's
    * `SQLSchemaProvider` enumerates per schema (src/sql/schema.rs:16-46);
    * this backs `SHOW TABLES IN <catalog>.<schema>`. Default: nothing
    * known (executors without schema introspection). */
  def tableNames(schema: String): Seq[String] = Nil

  /** The engine's schema (namespace) names, for catalog namespace
    * enumeration. Default: none beyond the implicit default namespace. */
  def schemaNames: Seq[String] = Nil

  /** Eager one-shot schema inference at registration time (reference
    * `get_table_schema`, src/sql/table.rs:126-133). */
  def tableSchema(ref: RemoteTableRef): StructType

  /** Optional per-table statistics so Spark can plan broadcasts. */
  def statistics(ref: RemoteTableRef): Option[Statistics] = None

  /** Optional PER-COLUMN statistics (ndv / min / max / null count /
    * lengths), keyed by remote column name — what Catalyst's cost-based
    * join reorder needs beyond row counts: with ndv on the join keys a
    * stitched multi-fragment join reorders onto the selective dimension
    * first. Called by [[graft.federation.plans.RemoteRelation]] only when
    * CBO is enabled; implementations must bound and cache the probes as
    * [[statistics]] does. */
  def columnStatistics(ref: RemoteTableRef): Map[String,
      org.apache.spark.sql.catalyst.plans.logical.ColumnStat] = Map.empty

  /** Optional fragment-level statistics: estimate the result size of a
    * generated fragment SQL without running it to completion. The
    * reference's `statistics` hook takes the *plan*
    * (src/sql/executor.rs:61-63), not a table ref, precisely so a heavily
    * filtered fragment can report far smaller stats than its base table
    * and win a broadcast the whole-table numbers would forfeit. Called by
    * [[graft.federation.plans.FederatedPlan.computeStats]] only when the
    * answer could flip a broadcast decision. Implementations must cache:
    * planning may ask repeatedly. */
  def fragmentStatistics(sql: String, schema: StructType): Option[Statistics] =
    None

  /** Number of parallel remote cursors to open for a splittable fragment
    * (see [[SplitScan]]). 1 = a single remote query. A JDBC executor would
    * size this from the remote table's row count and the cluster's task
    * slots, like Spark JDBC's `numPartitions`. */
  def splitCount: Int = 1

  /** Split-range boundaries for `col` over the fragment `fromSql`:
    * `n - 1` ascending values cutting the column's observed distribution
    * into near-equal slices ([[SplitScan.withRangeFilter]]). None = the
    * engine can't probe (or the probe isn't worth it) — the caller falls
    * back to modulo splits, which are exact but skew-blind: a split
    * column whose values share a residue class puts the whole table on
    * one cursor. Implementations must cache: planning may ask per plan. */
  def splitBoundaries(fromSql: String, col: String,
      n: Int): Option[Seq[Long]] = None

  /** True when [[execute]] yields exactly ONE RDD partition per SQL (the
    * remote-cursor executors: JDBC, DuckDB subprocess) — lets a sorted
    * single-SQL scan claim `SinglePartition` + `outputOrdering`, so a
    * window/merge-join above it needs neither exchange nor re-sort. The
    * mock executor returns the inner session's own partitioning and must
    * say false. */
  def singlePartitionPerCursor: Boolean = true

  /** Optional write path: append `df`'s rows to an existing remote table —
    * the reference's `insert_into` fallback delegation
    * (src/table_provider.rs:110-139; providers without an inner write path
    * refuse there too). The JDBC executor implements distributed appends
    * (one connection + batched INSERT per partition task). */
  def insertInto(ref: RemoteTableRef,
      df: org.apache.spark.sql.DataFrame): Unit =
    throw new UnsupportedOperationException(
      s"remote [$name] has no write path")

  /** Same-engine `INSERT INTO target (SELECT …)`: when the rows to append
    * are themselves a query against THIS engine, the copy should execute
    * entirely remotely — zero rows cross the wire in either direction.
    * Returns false when the engine has no such path (caller falls back to
    * streaming the rows through [[insertInto]]). */
  def insertFromQuery(ref: RemoteTableRef, selectSql: String): Boolean = false

  /** Optional DML path: delete the remote table's rows matching an
    * already-rendered predicate — ships as ONE `DELETE FROM t WHERE …`
    * executed where the data lives (the DML sibling of
    * [[insertFromQuery]]; beyond the read-mostly reference). Returns the
    * engine-reported affected-row count. There is no local fallback for
    * remote DML, so executors without a delete path throw. */
  def deleteWhere(ref: RemoteTableRef, whereSql: String): Long =
    throw new UnsupportedOperationException(
      s"remote [$name] has no delete path")

  /** Optional DML path: `UPDATE t SET <setSql> WHERE <whereSql>` executed
    * where the data lives (the third DML leg next to [[insertFromQuery]]
    * and [[deleteWhere]]). Both clauses arrive pre-rendered in this
    * engine's dialect. Returns the affected-row count. */
  def updateWhere(ref: RemoteTableRef, setSql: String,
      whereSql: String): Long =
    throw new UnsupportedOperationException(
      s"remote [$name] has no update path")

  /** Optional DDL path: create (replacing any existing) a remote table
    * shaped like `schema`, using the engine's own type names — the
    * prerequisite of a true CREATE TABLE AS
    * ([[graft.federation.Federation.createRemoteTableAs]]). */
  def createTable(ref: RemoteTableRef,
      schema: org.apache.spark.sql.types.StructType): Unit =
    throw new UnsupportedOperationException(
      s"remote [$name] has no create path")

  /** Optional DDL path: drop a remote table (bind-staging cleanup; a
    * missing table is not an error — cleanup must be idempotent). */
  def dropTable(ref: RemoteTableRef): Unit =
    throw new UnsupportedOperationException(
      s"remote [$name] has no drop path")

  /** Whether bind-join builds past the dialect's
    * [[SqlDialect.bindStageRows]] may be MATERIALIZED into a staging
    * table on this engine (needs [[createTable]], [[insertInto]] and
    * [[dropTable]]). Engines whose inline-VALUES execution degrades
    * super-linearly (embedded Derby: O(build × fact) nested loop over a
    * re-evaluated union chain, probed r10) get a real remote join this
    * way at the cost of one CREATE + bulk INSERT + DROP per bind. */
  def supportsBindStaging: Boolean = false

  /** Best-effort GC of staging leftovers from CRASHED writes: a died
    * `insertInto` leaves `<t>__stg_…` tables behind, and the enumeration
    * filter hides them forever. Staging names embed their creation
    * millis, so `olderThanMillis` (default 1 h) protects the staging
    * tables of writes still in flight in OTHER processes. Bind-staging
    * tables (`graft_bind_…`) carry no timestamp and are dropped only
    * under `includeBindTables = true` — an explicit "nothing is running"
    * assertion by the caller. Returns the dropped names. Default no-op
    * for executors that never stage. */
  def vacuumStaging(olderThanMillis: Long = 3600000L,
      includeBindTables: Boolean = false): Seq[String] = Nil

  /** Drop every cached catalog probe (table list, schemas, statistics) so
    * the next ask re-reads the live remote catalog. Default no-op for
    * executors that cache nothing. */
  def invalidateCaches(): Unit = ()

  /** Drop the cached probes of ONE table — the hook behind
    * `REFRESH TABLE` / `TableCatalog.invalidateTable` on catalog-resolved
    * remote tables; other tables' caches stay warm. Executors with
    * undifferentiated caches fall back to the full flush. */
  def invalidateTable(ref: RemoteTableRef): Unit = invalidateCaches()

  /** Optional hook: rewrite the generated SQL string just before execution
    * (reference `sql_query_rewriter`, src/sql/table.rs:33-45). */
  def sqlRewriter: String => String = identity

  /** Optional hook: engine-specific logical-plan rewrite applied to the
    * frozen fragment before unparsing (reference `logical_optimizer`,
    * src/sql/executor.rs:36-43). The rewrite must preserve the fragment's
    * output schema — enforced at the call site, mirroring the reference's
    * schema check (src/sql/mod.rs:268-284). */
  def planRewriter: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = identity
}

/** Per-TABLE rewrite hooks — the reference attaches these to each
  * `SQLTableSource` (`logical_optimizer` / `sql_query_rewriter`,
  * src/sql/table.rs:22-46) and gathers the hooks of every table referenced
  * by a fragment at SQL-generation time (src/sql/mod.rs:234-266). Executor
  * hooks are the per-ENGINE layer; these let one table of an engine be a
  * view needing an argument rewrite or a compatibility shim while its
  * siblings are untouched.
  *
  * Deliberately NOT a case class: identity equality is the dedup key — a
  * fragment referencing the same table twice (self-join; `newInstance`
  * copies share the hooks reference) applies its hooks once.
  *
  * `planRewriter` must preserve the fragment's output schema (same
  * contract, and the same loud failure, as the executor-level hook).
  * Note that the fragment handed in is COLUMN-PRUNED: a hook whose
  * rewrite needs a column the query didn't read (e.g. a row screen on a
  * flag column under a COUNT(*)) must re-derive it from a fresh
  * full-schema `RemoteRelation(ref, executor)` and project back to the
  * pruned output attributes (keeping their exprIds). Hooks apply to
  * STREAMING reads of the table too — microbatch fragments and the
  * cursor MIN/MAX probes both see the rewritten plan. */
final class TableHooks(
    val planRewriter: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = identity,
    val sqlRewriter: String => String = identity,
    val name: String = "table-hooks")

/** Mock executor backed by a second (isolated-catalog) SparkSession over
  * parquet files — mirrors the reference's `MockSqliteExecutor` /
  * `MockPostgresExecutor` over an inner DataFusion context
  * (examples/shared/mod.rs:30-146). Used by tests and the `fed_*` driver
  * queries; the "network boundary" is a session boundary.
  */
final class SparkSqlExecutor(
    override val name: String,
    val inner: SparkSession,
    tables: Map[String, String], // remote table name -> parquet path
    context: String,
    hookPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = identity,
    hookSql: String => String = identity,
    numSplits: Int = 1)
  extends SqlExecutor {

  override def splitCount: Int = numSplits

  // execute() returns the inner session's RDD with ITS partitioning
  override def singlePartitionPerCursor: Boolean = false

  override def planRewriter: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = hookPlan
  override def sqlRewriter: String => String = hookSql

  // register the remote catalog eagerly (schema inferred once per table)
  tables.foreach { case (tbl, path) =>
    inner.read.parquet(path).createOrReplaceTempView(tbl)
  }

  override def computeContext: Option[String] = Some(context)
  override def dialect: SqlDialect = SparkDialect

  /** Every SQL this executor has run, oldest first — lets tests assert on
    * the exact queries a plan shipped (e.g. runtime-filter predicates). */
  val executedSql = new scala.collection.mutable.ArrayBuffer[String]

  override def execute(sql: String, schema: StructType): RDD[InternalRow] = {
    executedSql.synchronized { executedSql += sql }
    // sqlRewriter was already applied at SQL-generation time
    // (SqlFederationProvider.unparse/unparseSplits) — applying it here too
    // would run non-idempotent hooks twice
    val df =
      try inner.sql(sql)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"remote [$name] rejected generated SQL: $sql", e)
      }
    val coerced = graft.federation.sql.SchemaCoercion.coerce(df, schema)
    coerced.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.toRdd
  }

  override def tableNames: Seq[String] = tables.keys.toSeq.sorted

  override def tableSchema(ref: RemoteTableRef): StructType =
    inner.table(ref.parts.map(p => s"`$p`").mkString(".")).schema

  override def statistics(ref: RemoteTableRef): Option[Statistics] = {
    val plan = inner.table(ref.parts.map(p => s"`$p`").mkString("."))
      .queryExecution.optimizedPlan
    Some(plan.stats)
  }

  private val fragStatsCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Statistics]]
  /** Rows the fragment probe scans remotely before giving up ("not small
    * enough to matter for a broadcast"). */
  val fragmentStatsRowCap: Long = 1L << 20

  /** Bounded remote count over the fragment SQL. Cached per SQL text —
    * including the at-cap "no stats" outcome, so a big fragment is probed
    * once per executor lifetime, not once per plan. Transient failures are
    * NOT cached. */
  override def fragmentStatistics(sql: String,
      schema: StructType): Option[Statistics] =
    fragStatsCache.get(sql).getOrElse {
      try {
        val capped = s"SELECT * FROM ($sql) frag_probe" +
          dialect.limitClause(Some(fragmentStatsRowCap), None)
        val n = inner.sql(s"SELECT COUNT(*) c FROM ($capped) frag_capped")
          .head().getLong(0)
        val result =
          if (n >= fragmentStatsRowCap) None
          else {
            val rowSize = schema.fields.map(_.dataType.defaultSize).sum.max(8)
            Some(Statistics(
              sizeInBytes = (BigInt(n) * rowSize).max(1),
              rowCount = Some(BigInt(n))))
          }
        fragStatsCache.put(sql, result)
        result
      } catch { case scala.util.control.NonFatal(_) => None }
    }
}

object SqlExecutor {
  /** Internal staging artifacts — bind-join staging tables
    * (`graft_bind_<hex>`) and per-partition write staging tables
    * (`<t>__stg_<writeId>_<pid>`) — must never surface in catalog
    * enumeration: they are transient (dropped asynchronously at
    * SQL-execution / publish end), so a `tableNames` caller that
    * enumerates one can lose it before its schema probe runs — a real
    * race the r10 test suite hit (registerViews enumerated a live
    * bind table; the async DROP landed; the registration's DESCRIBE
    * then failed). Epoch-fence tables (`__epochs`) are durable state,
    * not staging, and stay listed. */
  private val StagingName =
    java.util.regex.Pattern.compile(".*__stg_[0-9a-f]+_[0-9]+$")

  def isStagingArtifact(name: String): Boolean = {
    val n = name.toLowerCase
    // anchored to the exact generated shape (<t>__stg_<hexmillis+ctr>_<pid>,
    // JdbcSqlExecutor.stagePrefix) — a legitimate user table that merely
    // CONTAINS "__stg_" must keep enumerating
    n.startsWith("graft_bind_") || StagingName.matcher(n).matches()
  }

  private val StagingStamp =
    java.util.regex.Pattern.compile(".*__stg_([0-9a-f]+)_[0-9]+$")

  /** Creation millis embedded in a write-staging name. The hex group is
    * `<hexmillis><counter>` with no separator, but epoch millis render as
    * exactly 11 hex digits from 2004 through 2527 — the leading 11 are
    * the timestamp. */
  def stagingTimestamp(name: String): Option[Long] = {
    val m = StagingStamp.matcher(name.toLowerCase)
    if (!m.matches()) None
    else {
      val g = m.group(1)
      if (g.length < 11) None
      else try Some(java.lang.Long.parseLong(g.substring(0, 11), 16))
      catch { case _: NumberFormatException => None }
    }
  }

  /** The staging artifacts in `all` that [[SqlExecutor.vacuumStaging]]
    * should drop at `nowMs`: write-staging tables older than the guard
    * window, plus (opt-in) untimestamped bind tables. */
  def vacuumCandidates(all: Seq[String], nowMs: Long,
      olderThanMs: Long, includeBind: Boolean): Seq[String] =
    all.filter { n =>
      val ln = n.toLowerCase
      if (!isStagingArtifact(ln)) false
      else if (ln.startsWith("graft_bind_")) includeBind
      else stagingTimestamp(ln).exists(ts => nowMs - ts > olderThanMs)
    }
}
