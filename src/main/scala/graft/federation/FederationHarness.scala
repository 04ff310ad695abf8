package graft.federation

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.federation.sql.SparkSqlExecutor

/** Test/driver harness: remote engines simulated by isolated-catalog
  * sibling SparkSessions over the same parquet testdata — the Spark
  * equivalent of the reference's mock SQLite/Postgres executors running an
  * inner DataFusion context over CSV (examples/shared/mod.rs:30-146).
  *
  * `fed_*` tables are registered in the caller's session as
  * [[graft.federation.plans.RemoteRelation]]s pointing at executor "alpha";
  * `fedb_*` tables at executor "beta" (a second, distinct provider, for
  * cross-provider plans).
  */
object FederationHarness {

  private val tpch = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  private val executors = TrieMap.empty[(Int, String, String), SparkSqlExecutor]

  def executor(spark: SparkSession, dir: String,
      name: String): SparkSqlExecutor =
    executors.getOrElseUpdate(
      (graft.SessionKeys.id(spark), dir, name), {
        val inner = spark.newSession()
        new SparkSqlExecutor(name, inner,
          tpch.map(t => t -> s"$dir/$t.parquet").toMap,
          context = s"$name@$dir")
      })

  /** A split-capable executor (n parallel remote cursors for splittable
    * fragments — see [[graft.federation.sql.SplitScan]]). */
  def splitExecutor(spark: SparkSession, dir: String,
      name: String, n: Int): SparkSqlExecutor =
    executors.getOrElseUpdate(
      (graft.SessionKeys.id(spark), dir, s"$name#$n"), {
        val inner = spark.newSession()
        new SparkSqlExecutor(name, inner,
          tpch.map(t => t -> s"$dir/$t.parquet").toMap,
          context = s"$name@$dir", numSplits = n)
      })

  /** Last dir whose fed_/fedb_ views were registered, per session:
    * setup() runs on EVERY federated gate build (93 gates × bench
    * iterations), and re-registering 18 remote views each time was pure
    * catalog churn (r15 FedProbe: DataFrame build 45-780 ms vs ~20 ms of
    * optimize). Views are re-registered only when the session is new or
    * the data dir changes (so switching dirs still repoints them). */
  private val registeredDir = TrieMap.empty[Int, String]

  /** Install federation into `spark` and register the fed_* / fedb_*
    * remote views for `dir` (idempotent, and a no-op when this session
    * already has this dir's views). */
  def setup(spark: SparkSession, dir: String): Unit = {
    val id = graft.SessionKeys.id(spark)
    if (registeredDir.get(id).contains(dir)) return
    Federation.install(spark)
    val alpha = executor(spark, dir, "alpha")
    val beta = executor(spark, dir, "beta")
    tpch.foreach { t =>
      Federation.registerRemoteTable(spark, s"fed_$t", t, alpha)
      Federation.registerRemoteTable(spark, s"fedb_$t", t, beta)
    }
    registeredDir.put(id, dir)
  }

  /** Run a SQL query against the federated views. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    setup(spark, dir)
    spark.sql(query)
  }
}
