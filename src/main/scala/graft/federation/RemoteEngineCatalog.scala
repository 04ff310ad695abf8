package graft.federation

import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.federation.plans.RemoteRelation
import graft.federation.sql.{RemoteTableRef, SqlExecutor, TableHooks}

/** DataSource-v2 `TableCatalog` over one or more remote [[SqlExecutor]]s —
  * the idiomatic Spark surface of the reference's `SQLSchemaProvider`
  * (src/sql/schema.rs:12-108): remote tables become first-class catalog
  * citizens (`SELECT * FROM duck.main.customer`, `SHOW TABLES IN duck`,
  * `USE duck`) with NO per-table registration step. Several executors
  * chain first-match-wins, mirroring `MultiSchemaProvider`
  * (src/sql/schema.rs:110-143).
  *
  * Resolution stays METADATA-ONLY here: the catalog's `Table` claims
  * batch-read capability so analysis succeeds, and
  * [[CatalogRemoteTableRule]] (installed with the other federation rules)
  * swaps the resolved v2 relation for the same [[RemoteRelation]] leaf a
  * `registerRemoteTable` view produces — so catalog-resolved tables take
  * the exact same federation path (fragment grouping, pushdown, bind
  * joins, split scans) as registered ones, not a second, weaker DSv2 read
  * path. Schema inference is lazy (first `loadTable`) and cached by the
  * executor's own schema cache, which the execution-time drift guard
  * protects against going stale silently.
  *
  * Wire-up: either programmatic —
  * `Federation.registerCatalog(spark, "duck", Seq(executor))` — or pure
  * config for simple engines:
  * `spark.sql.catalog.duck=graft.federation.RemoteEngineCatalog` plus
  * `spark.sql.catalog.duck.engine=duckdb` and
  * `spark.sql.catalog.duck.path=/data/x.db`.
  */
class RemoteEngineCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var spec: RemoteEngineCatalog.Spec = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    spec = RemoteEngineCatalog.registry.get(name) match {
      case Some(s) => s
      case None => RemoteEngineCatalog.fromOptions(name, options)
    }
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = spec.defaultNamespace

  private def isDefaultNs(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(spec.defaultNamespace)

  /** Spark's default analysis is case-INsensitive: `duck.main.CUSTOMER`
    * must resolve the remote's `customer` (honoring
    * `spark.sql.caseSensitive` when the user flips it). */
  private def caseSensitive: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get.caseSensitiveAnalysis
    catch { case scala.util.control.NonFatal(_) => false }

  private def nameMatch(listed: String, asked: String): Boolean =
    if (caseSensitive) listed == asked else listed.equalsIgnoreCase(asked)

  /** Default-namespace tables address the remote by BARE name — that is
    * the namespace `tableNames` enumerates in (DuckDB `main`, Derby the
    * connection schema), so the bare form works on every executor. A
    * non-default namespace is an explicit engine schema: keep it. The
    * ref carries the REMOTE's listed spelling, not the identifier's —
    * the wire SQL must address the engine's actual name. */
  private def refFor(ident: Identifier): RemoteTableRef =
    if (isDefaultNs(ident.namespace)) RemoteTableRef(Seq(ident.name))
    else RemoteTableRef(ident.namespace.toIndexedSeq :+ ident.name)

  /** A quoted table-FUNCTION identifier — `` duck.main.`range(6)` `` —
    * parses to a ref with args (reference `table_reference.rs:47-92`);
    * no listing enumerates these, so resolution is a schema probe (the
    * engine can DESCRIBE a table-function select like any query). */
  private def fnRef(ident: Identifier): Option[RemoteTableRef] =
    if (!ident.name.contains("(")) None
    else scala.util.Try(RemoteTableRef.parse(ident.name)).toOption
      .filter(_.args.isDefined)
      .map { r =>
        if (isDefaultNs(ident.namespace)) r
        else RemoteTableRef(ident.namespace.toIndexedSeq ++ r.parts, r.args)
      }

  /** First-match-wins executor resolution (reference MultiSchemaProvider):
    * the default namespace resolves against the cached remote listing
    * (case-folded per session config); a non-default namespace is an
    * explicit engine schema — its own listing when the executor
    * enumerates schemas, a cached schema probe otherwise. Table-function
    * identifiers probe directly. */
  private def resolve(ident: Identifier): Option[(SqlExecutor, RemoteTableRef)] =
    fnRef(ident) match {
      case Some(fn) =>
        spec.executors.iterator.flatMap { e =>
          try { e.tableSchema(fn); Some((e, fn)) }
          catch { case scala.util.control.NonFatal(_) => None }
        }.nextOption()
      case None => resolvePlain(ident)
    }

  private def resolvePlain(ident: Identifier): Option[(SqlExecutor, RemoteTableRef)] =
    if (isDefaultNs(ident.namespace))
      spec.executors.iterator.flatMap { e =>
        e.tableNames.find(nameMatch(_, ident.name))
          .map(actual => (e, RemoteTableRef(Seq(actual))))
      }.nextOption()
    else {
      val ns = ident.namespace.toIndexedSeq
      spec.executors.iterator.flatMap { e =>
        // resolve the ENGINE's listed schema spelling first: tableNames
        // does an exact information_schema / JDBC-metadata match, so the
        // asked-case spelling (`IN duck.ANALYTICS` under case-insensitive
        // analysis) must fold to the engine's actual one before listing
        val listed =
          if (ns.size == 1)
            schemaSpelling(e, ns.head)
              .flatMap(s => e.tableNames(s).find(nameMatch(_, ident.name))
                .map(t => RemoteTableRef(Seq(s, t))))
          else None
        listed.map(r => (e, r)).orElse {
          val ref = refFor(ident)
          try { e.tableSchema(ref); Some((e, ref)) }
          catch { case scala.util.control.NonFatal(_) => None }
        }
      }.nextOption()
    }

  /** The engine's OWN spelling of an asked schema name (exact-match
    * listings like information_schema / JDBC metadata need the engine's
    * case, not the identifier's). */
  private def schemaSpelling(e: SqlExecutor, asked: String): Option[String] =
    e.schemaNames.find(nameMatch(_, asked))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // first-match-wins applies to listing too: a name owned by an earlier
    // executor shadows the same name in a later one
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    if (isDefaultNs(namespace))
      spec.executors.foreach(e => e.tableNames.foreach(seen += _))
    else if (namespace.length == 1 &&
        spec.executors.exists(_.schemaNames.exists(nameMatch(_, namespace.head))))
      // list under each engine's own spelling of the asked schema
      spec.executors.foreach(e => schemaSpelling(e, namespace.head)
        .foreach(s => e.tableNames(s).foreach(seen += _)))
    else
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    seen.toArray.map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    resolve(ident).isDefined

  override def loadTable(ident: Identifier): Table =
    resolve(ident) match {
      case Some((e, ref)) =>
        RemoteCatalogTable(ref, e,
          s"$catalogName.${ident.toString}",
          spec.hooks.get(ref.parts.last)
            .orElse(spec.hooks.get(ident.name)))
      case None => throw new NoSuchTableException(ident)
    }

  /** Per-TABLE refresh: only the owning executor re-probes, and only this
    * table's caches drop (r12 nuked every executor's caches). An ident no
    * listing resolves may still have just APPEARED remotely behind a
    * stale listing — that one case flushes the listings everywhere. */
  override def invalidateTable(ident: Identifier): Unit =
    resolve(ident) match {
      case Some((e, ref)) => e.invalidateTable(ref)
      case None => spec.executors.foreach(_.invalidateCaches())
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"remote catalog [$catalogName] cannot create partitioned tables")
    val e = spec.executors.head // creation always targets the first engine
    e.createTable(refFor(ident), schema)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    resolve(ident) match {
      case Some((e, ref)) => e.dropTable(ref); true
      case None => false
    }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"remote catalog [$catalogName] does not alter remote tables")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"remote catalog [$catalogName] does not rename remote tables")

  // ------------------------------------------------------- namespaces
  /** Default namespace first, then every engine schema the executors
    * enumerate (reference schema.rs:16-46; executors without schema
    * introspection contribute nothing). */
  override def listNamespaces(): Array[Array[String]] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[String]]
    seen += (if (spec.defaultNamespace.isEmpty) Nil
      else spec.defaultNamespace.toSeq)
    spec.executors.foreach(_.schemaNames.foreach(s => seen += Seq(s)))
    seen.toArray.map(_.toArray)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    isDefaultNs(namespace) || (namespace.length == 1 &&
      spec.executors.exists(_.schemaNames.exists(nameMatch(_, namespace.head))))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) Collections.emptyMap()
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"remote catalog [$catalogName] does not create namespaces")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"remote catalog [$catalogName] does not alter namespaces")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"remote catalog [$catalogName] does not drop namespaces")
}

object RemoteEngineCatalog {
  final case class Spec(
      executors: Seq[SqlExecutor],
      defaultNamespace: Array[String],
      hooks: Map[String, TableHooks])

  /** Catalog name → executors, shared JVM-wide: Spark instantiates the
    * plugin reflectively per session, and executors are live objects
    * (connection pools, caches) that cannot ride the string-only options
    * map. Populated by [[Federation.registerCatalog]]. */
  private[graft] val registry =
    scala.collection.concurrent.TrieMap.empty[String, Spec]

  /** Config-only construction for engines expressible as strings. */
  private def fromOptions(name: String,
      options: CaseInsensitiveStringMap): Spec = {
    val spark = SparkSession.active
    options.get("engine") match {
      case "duckdb" =>
        val path = Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException(
            s"catalog $name: engine=duckdb needs option 'path'"))
        Spec(Seq(new graft.federation.duckdb.DuckDbSqlExecutor(
            name, spark, path)), Array("main"), Map.empty)
      case "derby" =>
        val url = Option(options.get("url")).getOrElse(
          throw new IllegalArgumentException(
            s"catalog $name: engine=derby needs option 'url'"))
        Spec(Seq(new graft.federation.jdbc.JdbcSqlExecutor(
            name, spark, url, graft.federation.jdbc.DerbyDialect)),
          Array.empty, Map.empty)
      case other =>
        throw new IllegalArgumentException(
          s"catalog $name: no registered executors and unknown " +
            s"engine '$other' — call Federation.registerCatalog first " +
            "or set engine=duckdb|derby")
    }
  }
}

/** Catalog metadata for one remote table. Claims batch-read so analysis
  * accepts a SELECT; actual reads NEVER go through the v2 scan — the
  * substitution rule rewrites to [[RemoteRelation]] before planning.
  * Writes (`INSERT INTO cat.ns.t …`) take the V1 fallback into
  * [[Federation.insertIntoRemote]]: a same-engine SELECT source copies
  * entirely remotely (`INSERT INTO … SELECT …`, zero wire rows), anything
  * else streams through the executor's idempotent staged append. */
final case class RemoteCatalogTable(
    ref: RemoteTableRef,
    executor: SqlExecutor,
    fullName: String,
    hooks: Option[TableHooks]) extends Table with SupportsRead
    with SupportsWrite {

  override def name(): String = fullName

  override def schema(): StructType = executor.tableSchema(ref)

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE).asJava

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation:
              org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                if (overwrite) throw new UnsupportedOperationException(
                  s"remote table $fullName supports INSERT INTO (append) " +
                    "only — no INSERT OVERWRITE")
                Federation.insertIntoRemote(data, ref, executor)
                ()
              }
            }
        }
    }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      // column pruning arrives before the substitution rule runs; honoring
      // it narrows the RemoteRelation (and so the remote SELECT list).
      // Filters deliberately do NOT push here: the federation rule pushes
      // full Catalyst expressions into the fragment SQL, far beyond the
      // v2 Filter API's vocabulary.
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = RemoteCatalogScan(ref, executor,
        required, hooks,
        cursor = Option(options.get("cursor")),
        cursorStep =
          graft.streaming.FedStreamSourceProvider.parseStep(options),
        cursorHorizon =
          graft.streaming.FedStreamSourceProvider.parseHorizon(options))
    }
}

/** Placeholder v2 scan — only its metadata is ever consumed (batch reads
  * substitute to [[RemoteRelation]]; streaming reads hand off to
  * [[graft.streaming.FedMicroBatchStream]], whose per-batch scans
  * substitute the same way). */
final case class RemoteCatalogScan(
    ref: RemoteTableRef,
    executor: SqlExecutor,
    override val readSchema: StructType,
    hooks: Option[TableHooks],
    cursor: Option[String] = None,
    cursorStep: Option[Long] = None,
    cursorHorizon: Long = 0L) extends Scan {

  override def toBatch: Batch =
    throw new IllegalStateException(
      s"remote table $ref resolved through the catalog but the " +
        "federation rules are not installed — call " +
        "Federation.install(spark) (or set spark.sql.extensions=" +
        "graft.federation.GraftExtensions)")

  /** `spark.readStream.option("cursor", …).table("cat.ns.t")` — the DSv2
    * catalog face of the graft-fed source. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val c = cursor.getOrElse(throw new IllegalArgumentException(
      s"streaming read of remote table $ref needs .option(\"cursor\", " +
        "<monotone column>) (optionally .option(\"cursorStep\", n))"))
    // hooks thread through: a hooked catalog table read as a stream must
    // see the same plan/SQL rewrites (and probe the same rewritten
    // extrema) as its batch reads
    new graft.streaming.FedMicroBatchStream(SparkSession.active,
      executor, ref, c, cursorStep, cursorHorizon, hooks)
  }

  override def description(): String =
    s"RemoteCatalogScan [${executor.name}] $ref"
}

/** Swaps catalog-resolved remote tables for [[RemoteRelation]] leaves, so
  * every downstream federation rule sees the same plan shape as with
  * registered temp views. Runs in the same fixed-point batch as
  * [[FederationRule]], ahead of it in install order. */
object CatalogRemoteTableRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      // normal SELECT path: early scan pushdown already built the v2 scan
      // (with pruned columns); reuse its output attributes verbatim so
      // parent references keep binding
      case s: DataSourceV2ScanRelation
          if s.scan.isInstanceOf[RemoteCatalogScan] =>
        val sc = s.scan.asInstanceOf[RemoteCatalogScan]
        RemoteRelation(sc.ref, sc.executor, s.output, sc.hooks)
      // paths that reach the optimizer unconverted (e.g. CACHE TABLE)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[RemoteCatalogTable] =>
        val t = r.table.asInstanceOf[RemoteCatalogTable]
        RemoteRelation(t.ref, t.executor, r.output, t.hooks)
    }
}
