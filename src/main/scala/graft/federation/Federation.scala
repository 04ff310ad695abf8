package graft.federation

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession, SparkSessionExtensions}

import graft.federation.plans.RemoteRelation
import graft.federation.sql.{RemoteTableRef, SqlExecutor, TableHooks}

/** Session wiring — the analog of the reference's `default_session_state`
  * (src/lib.rs:25-54) and `SQLSchemaProvider` catalog bootstrap
  * (src/sql/schema.rs:16-75).
  */
object Federation {

  /** Install rule + strategy into a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(FederationStrategy))
      exp.extraStrategies = exp.extraStrategies :+ FederationStrategy
    // catalog-resolved remote tables must become RemoteRelation before
    // any other federation rule looks at the plan
    if (!exp.extraOptimizations.contains(CatalogRemoteTableRule))
      exp.extraOptimizations = CatalogRemoteTableRule +: exp.extraOptimizations
    // same precedence for the streaming sibling: each microbatch's v2
    // scan relation becomes a range-filtered RemoteRelation here
    if (!exp.extraOptimizations.contains(
        graft.streaming.FedStreamScanRule))
      exp.extraOptimizations =
        graft.streaming.FedStreamScanRule +: exp.extraOptimizations
    // PartialAggRule must PRECEDE FederationRule within each batch
    // iteration: once the union's children are wrapped as FederatedPlan,
    // per-provider eligibility is no longer observable
    if (!exp.extraOptimizations.contains(PartialAggRule))
      exp.extraOptimizations = PartialAggRule +: exp.extraOptimizations
    // same precedence requirement as PartialAggRule
    if (!exp.extraOptimizations.contains(TopKPushdownRule))
      exp.extraOptimizations = TopKPushdownRule +: exp.extraOptimizations
    if (!exp.extraOptimizations.contains(GroupTopKPushdownRule))
      exp.extraOptimizations = GroupTopKPushdownRule +: exp.extraOptimizations
    // also before FederationRule: a join over a still-observable
    // multi-provider union distributes into per-arm joins that the rest
    // of the batch then federates/binds arm by arm
    if (!exp.extraOptimizations.contains(JoinUnionDistributeRule))
      exp.extraOptimizations = JoinUnionDistributeRule +: exp.extraOptimizations
    if (!exp.extraOptimizations.contains(FederationRule))
      exp.extraOptimizations = exp.extraOptimizations :+ FederationRule
    // after FederationRule in the same batch: consumes eligible
    // fragment-vs-small-build inner joins whole...
    if (!exp.extraOptimizations.contains(BindJoinRule))
      exp.extraOptimizations = exp.extraOptimizations :+ BindJoinRule
    // ...and runtime filters cover every join shape the bind rule
    // refuses (outer/semi, FP keys, oversize or unrenderable builds)
    if (!exp.extraOptimizations.contains(RuntimeFilterRule))
      exp.extraOptimizations = exp.extraOptimizations :+ RuntimeFilterRule
  }

  /** The federated EXPLAIN surface: one row per remote fragment of the
    * query's physical plan — provider, cursor/split count, bind-join and
    * runtime-filter counts, whether the fragment's ORDER BY is exposed
    * as local ordering, and the exact SQL that will ship (pre
    * runtime-filter inlining, which is execution-time by design). What
    * an operator debugging a 100 TB federated job needs first: "which
    * engine runs what, and how many cursors does it open". */
  def explainFederated(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import graft.federation.exec.RemoteScanExec
    def gather(p: SparkPlan): Seq[RemoteScanExec] = p match {
      case a: AdaptiveSparkPlanExec => gather(a.executedPlan)
      // a materialized AQE stage hides its subtree behind `plan`
      // (children = Nil) — an ALREADY-RUN query would report no
      // fragments without this arm
      case q: QueryStageExec => gather(q.plan)
      case r: RemoteScanExec => Seq(r)
      case other =>
        (other.children ++ other.subqueries).flatMap(gather)
    }
    val frags = gather(df.queryExecution.executedPlan).zipWithIndex.map {
      case (r, i) => (i, r.executor.name, r.sqls.size,
        r.bindJoins.size, r.runtimeFilters.size,
        r.outputOrdering.nonEmpty, r.sqls.head)
    }
    df.sparkSession.createDataFrame(frags).toDF("fragment", "provider",
      "n_splits", "n_binds", "n_runtime_filters", "sorted", "sql")
  }

  /** Register one remote table under a local name. Schema is inferred
    * eagerly through the executor (once). `hooks` attaches per-table
    * plan/SQL rewriters (reference `SQLTableSource` hooks,
    * src/sql/table.rs:22-46) applied once per fragment referencing it. */
  def registerRemoteTable(spark: SparkSession, localName: String,
      remoteRef: String, executor: SqlExecutor,
      hooks: Option[TableHooks] = None): Unit =
    remoteDataFrame(spark, remoteRef, executor, hooks)
      .createOrReplaceTempView(localName)

  /** A DataFrame rooted at a [[RemoteRelation]] — usable with the full
    * DataFrame API, not just SQL. */
  def remoteDataFrame(spark: SparkSession, remoteRef: String,
      executor: SqlExecutor, hooks: Option[TableHooks] = None): DataFrame =
    GraftShims.ofRows(spark,
      RemoteRelation(RemoteTableRef.parse(remoteRef), executor, hooks))

  /** Like [[remoteDataFrame]] but with a DECLARED schema instead of the
    * engine-inferred one — the reference's schema-cast contract
    * (`SQLTableSource::new_with_schema` + schema_cast/, src/sql/table.rs,
    * struct_cast.rs:12-55): the user asserts richer types than the remote
    * catalog reports (JSON text columns declared as struct/array, wide
    * decimals narrowed), and the boundary coerces each wire value to the
    * declared type as it lands. Field count and names must match the
    * remote table positionally; types may differ where a coercion
    * exists — an impossible coercion fails the read, never silently
    * corrupts. */
  def remoteDataFrameAs(spark: SparkSession, remoteRef: String,
      executor: SqlExecutor,
      schema: org.apache.spark.sql.types.StructType,
      hooks: Option[TableHooks] = None): DataFrame =
    GraftShims.ofRows(spark,
      RemoteRelation(RemoteTableRef.parse(remoteRef), executor,
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        hooks))

  /** Register every table the executor's catalog lists, under its remote
    * name prefixed with `prefix` (reference SQLSchemaProvider::new,
    * src/sql/schema.rs:16-46). `hooks` maps REMOTE table names to their
    * per-table rewriters. */
  def registerAll(spark: SparkSession, executor: SqlExecutor,
      prefix: String = "", hooks: Map[String, TableHooks] = Map.empty): Unit =
    executor.tableNames.foreach { t =>
      registerRemoteTable(spark, prefix + t, t, executor, hooks.get(t))
    }

  /** Append `df` into a remote table, pushing the WHOLE copy to the
    * remote engine when possible: if `df`'s optimized plan is a single
    * federated fragment of `executor`'s own provider (no execution-time
    * runtime filters or binds pending), the fragment unparses and ships
    * as `INSERT INTO target (SELECT …)` — the engine produces and
    * consumes the rows itself, zero rows on the wire. Anything else
    * falls back to the distributed batched-INSERT append
    * ([[graft.federation.sql.SqlExecutor.insertInto]]). Returns true
    * when the push happened. */
  def insertIntoRemote(df: DataFrame, ref: RemoteTableRef,
      executor: SqlExecutor): Boolean = {
    val provider = graft.federation.sql.SqlFederationProvider
      .forExecutor(executor)
    df.queryExecution.optimizedPlan match {
      case f: graft.federation.plans.FederatedPlan
          if f.provider == provider && f.runtimeFilters.isEmpty &&
             f.bindJoins.isEmpty &&
             executor.insertFromQuery(ref, provider.unparse(f.inner)) =>
        true
      case _ =>
        executor.insertInto(ref, df)
        false
    }
  }

  /** TRUE federated CREATE TABLE AS: the target's DDL derives from the
    * frame's schema (engine type names via the executor), the table is
    * created remotely (replacing any prior incarnation), and the rows
    * land through [[insertIntoRemote]] — which pushes the whole
    * derivation as `INSERT INTO … (SELECT …)` when the source is the
    * engine's OWN fragment (zero rows on the wire) and falls back to the
    * distributed batched append otherwise. Returns true when the insert
    * pushed. */
  def createRemoteTableAs(df: DataFrame, remoteRef: String,
      executor: SqlExecutor): Boolean = {
    val ref = RemoteTableRef.parse(remoteRef)
    executor.createTable(ref, df.schema)
    insertIntoRemote(df, ref, executor)
  }

  /** Predicate DELETE pushed to the remote engine (the DML sibling of
    * [[insertIntoRemote]]'s INSERT..SELECT path): `cond` is resolved
    * against the remote table's schema, unparsed in the executor's
    * dialect with BARE column references (standard `DELETE FROM t` has no
    * alias scope), and ships as ONE `DELETE FROM t WHERE p` — zero rows
    * move, the wire carries the statement and an update count. The
    * condition must be deterministic, subquery-free, and renderable in
    * the dialect; anything else THROWS rather than falling back, because
    * remote DML has no local fallback (a quietly-different local path
    * would be a correctness trap, not a convenience). */
  def deleteFromRemote(spark: SparkSession, remoteRef: String,
      executor: SqlExecutor,
      cond: org.apache.spark.sql.Column): Long = {
    val rel = RemoteRelation(RemoteTableRef.parse(remoteRef), executor)
    executor.deleteWhere(rel.ref,
      renderDmlPredicate(spark, rel, executor, cond))
  }

  /** Predicate UPDATE pushed to the remote engine — the third DML leg
    * next to [[insertIntoRemote]] and [[deleteFromRemote]], same
    * contract: set values and the condition resolve against the remote
    * schema, unparse in the executor's dialect with bare column
    * references, and ship as ONE `UPDATE t SET … WHERE …`. Unsupported
    * shapes THROW (no local fallback exists for remote DML). */
  def updateRemote(spark: SparkSession, remoteRef: String,
      executor: SqlExecutor,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
    val rel = RemoteRelation(RemoteTableRef.parse(remoteRef), executor)
    val df = GraftShims.ofRows(spark, rel)
    val unparser = new graft.federation.sql.SqlUnparser(executor.dialect)
    val scope = rel.output.map(a => a.exprId ->
      executor.dialect.quoteIfNeeded(a.name)).toMap
    val setSql = sets.map { case (target, value) =>
      val tgt = rel.output.find(_.name == target).getOrElse(
        throw new IllegalArgumentException(
          s"unknown UPDATE target column '$target' on ${rel.ref}"))
      val v = stripAliases(df.select(value).queryExecution.analyzed) match {
        case Project(Seq(item), _) => item match {
          case Alias(c, _) => c
          case a => a
        }
        case other => throw new IllegalArgumentException(
          s"unexpected SET value shape: ${other.nodeName}")
      }
      checkDmlExpr(v, "UPDATE")
      s"${executor.dialect.quoteIfNeeded(tgt.name)} = " +
        unparser.render(v, scope)
    }.mkString(", ")
    executor.updateWhere(rel.ref, setSql,
      renderDmlPredicate(spark, rel, executor, cond))
  }

  private def stripAliases(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
    case org.apache.spark.sql.catalyst.plans.logical
      .SubqueryAlias(_, c) => stripAliases(c)
    case other => other
  }

  private def checkDmlExpr(
      c: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Unit = {
    require(c.deterministic, s"non-deterministic $what expression: $c")
    require(!c.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      s"subqueries are not supported in a pushed $what: $c")
  }

  /** Resolve `cond` against the remote table and render it as a bare
    * WHERE predicate in the executor's dialect (shared by DELETE and
    * UPDATE — standard DML statements have no alias scope). */
  private def renderDmlPredicate(spark: SparkSession, rel: RemoteRelation,
      executor: SqlExecutor,
      cond: org.apache.spark.sql.Column): String = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val analyzed = GraftShims.ofRows(spark, rel).filter(cond)
      .queryExecution.analyzed
    stripAliases(analyzed) match {
      case Filter(c, child) =>
        stripAliases(child) match {
          case _: RemoteRelation => ()
          case other => throw new IllegalArgumentException(
            s"DML predicate must sit directly over the remote table, " +
              s"got: ${other.nodeName}")
        }
        checkDmlExpr(c, "DML predicate")
        val scope = rel.output.map(a => a.exprId ->
          executor.dialect.quoteIfNeeded(a.name)).toMap
        new graft.federation.sql.SqlUnparser(executor.dialect)
          .render(c, scope)
      case other => throw new IllegalArgumentException(
        s"expected Filter over the remote table, got: ${other.nodeName}")
    }
  }

  /** Register the union of several executors' catalogs into one namespace,
    * first executor listing a name wins — the reference's
    * `MultiSchemaProvider` chaining (src/sql/schema.rs:110-143). */
  def registerAllChained(spark: SparkSession, executors: Seq[SqlExecutor],
      prefix: String = ""): Unit = {
    val seen = scala.collection.mutable.Set.empty[String]
    for (ex <- executors; t <- ex.tableNames if seen.add(t))
      registerRemoteTable(spark, prefix + t, t, ex)
  }

  /** GC staging leftovers of crashed writes on a remote engine — see
    * [[graft.federation.sql.SqlExecutor.vacuumStaging]]. Call it from a
    * maintenance window; `includeBindTables = true` additionally drops
    * untimestamped bind-staging tables and asserts no query is in
    * flight. Returns the dropped table names. */
  def vacuum(executor: SqlExecutor, olderThanMillis: Long = 3600000L,
      includeBindTables: Boolean = false): Seq[String] =
    executor.vacuumStaging(olderThanMillis, includeBindTables)

  /** Mount `executors` as the session catalog `name`: afterwards
    * `SELECT * FROM <name>.<ns>.<table>` (and `SHOW TABLES IN <name>`,
    * `USE <name>`) resolve with no per-table registration — the DSv2
    * face of [[registerAll]] (reference `SQLSchemaProvider`,
    * src/sql/schema.rs:12-108). Several executors chain first-match-wins
    * like [[registerAllChained]]. Schema inference is lazy per table and
    * cached inside each executor; `REFRESH TABLE` re-probes just that
    * table. Requires [[install]] (done here) so catalog-resolved tables
    * take the normal federation path. */
  def registerCatalog(spark: SparkSession, name: String,
      executors: Seq[SqlExecutor],
      defaultNamespace: Seq[String] = Seq("main"),
      hooks: Map[String, graft.federation.sql.TableHooks] = Map.empty): Unit = {
    require(executors.nonEmpty, "registerCatalog needs at least one executor")
    RemoteEngineCatalog.registry(name) = RemoteEngineCatalog.Spec(
      executors, defaultNamespace.toArray, hooks)
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[RemoteEngineCatalog].getName)
    install(spark)
  }
}

/** `SparkSessionExtensions` installer for
  * `spark.sql.extensions=graft.federation.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CatalogRemoteTableRule)
    e.injectOptimizerRule(_ => TopKPushdownRule)
    e.injectOptimizerRule(_ => GroupTopKPushdownRule)
    e.injectOptimizerRule(_ => JoinUnionDistributeRule)
    e.injectOptimizerRule(_ => PartialAggRule)
    e.injectOptimizerRule(_ => FederationRule)
    e.injectOptimizerRule(_ => BindJoinRule)
    e.injectOptimizerRule(_ => RuntimeFilterRule)
    e.injectPlannerStrategy(_ => FederationStrategy)
  }
}
