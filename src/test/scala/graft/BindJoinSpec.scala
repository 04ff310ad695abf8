package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.federation.{BindJoinRule, FederationHarness}
import graft.operators.Federated
import graft.federation.plans.FederatedPlan

/** Bind-join pushdown: an inner equi-join between a federated fragment
  * and a small selective build side completes ON the remote engine, the
  * build inlined as a `(VALUES ...)` derived table at execution time. */
class BindJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bindjoin-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def setup(): Unit = {
    FederationHarness.setup(spark, dir)
    graft.sources.Tables.registerAll(spark, dir)
  }

  private def boundFrags(df: DataFrame): Seq[FederatedPlan] =
    df.queryExecution.optimizedPlan.collect {
      case f: FederatedPlan if f.bindJoins.nonEmpty => f
    }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("local selective dim binds into the remote SQL; join disappears locally") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    graft.sources.Tables.orders(spark, dir)
      .filter("o_totalprice > 480000")
      .createOrReplaceTempView("big_orders")
    val before = alpha.executedSql.size
    val df = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM fed_lineitem JOIN big_orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(boundFrags(df).nonEmpty,
      s"join did not bind:\n${df.queryExecution.optimizedPlan}")
    // results identical to fully-local execution
    assert(rows(df) == rows(spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM lineitem JOIN (SELECT * FROM orders WHERE o_totalprice > 480000) o
        |  ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)))
    // the executed remote SQL carries the VALUES join on the key
    val executed = alpha.executedSql.drop(before)
    assert(executed.exists(s => s.contains("JOIN (VALUES") &&
        s.contains("bj_sub.l_orderkey = bj_b.__bj_")),
      s"no VALUES join reached the remote engine:\n${executed.mkString("\n")}")
    // and no local join remains in the physical plan
    val phys = df.queryExecution.executedPlan.toString()
    assert(!phys.contains("Join"), phys)
  }

  test("cross-provider: small beta fragment binds into alpha's query") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    val beta = FederationHarness.executor(spark, dir, "beta")
    val beforeA = alpha.executedSql.size
    val beforeB = beta.executedSql.size
    val df = spark.sql(
      """SELECT n_name, COUNT(*) AS n_suppliers
        |FROM fed_supplier JOIN
        |  (SELECT n_nationkey, n_name FROM fedb_nation WHERE n_regionkey < 2) n
        |  ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
    assert(boundFrags(df).nonEmpty,
      s"cross-provider join did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT n_name, COUNT(*) AS n_suppliers
        |FROM supplier JOIN
        |  (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2) n
        |  ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)))
    // beta ran its own fragment (the build evaluation), and alpha's SQL
    // carries the VALUES with beta's rows
    assert(beta.executedSql.drop(beforeB).exists(_.contains("nation")),
      "beta never executed the build fragment")
    assert(alpha.executedSql.drop(beforeA).exists(s =>
        s.contains("supplier") && s.contains("JOIN (VALUES")),
      s"alpha SQL lacks the bound build:\n${alpha.executedSql.drop(beforeA).mkString("\n")}")
  }

  test("build on the left preserves column order and multiplicities") {
    setup()
    // duplicate build rows (UNION ALL of two filtered scans): inner-join
    // multiplicity must survive the VALUES rendering (no dedup)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW dup_dim AS
        |SELECT o_orderkey AS k, 'a' AS tag FROM orders WHERE o_orderkey < 5
        |UNION ALL
        |SELECT o_orderkey AS k, 'b' AS tag FROM orders WHERE o_orderkey < 5""".stripMargin)
    val df = spark.sql(
      """SELECT d.tag, l.l_orderkey, l.l_linenumber
        |FROM dup_dim d JOIN fed_lineitem l ON d.k = l.l_orderkey
        |ORDER BY d.tag, l.l_orderkey, l.l_linenumber""".stripMargin)
    assert(boundFrags(df).nonEmpty,
      s"duplicate-row build did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT d.tag, l.l_orderkey, l.l_linenumber
        |FROM (SELECT o_orderkey AS k, 'a' AS tag FROM orders WHERE o_orderkey < 5
        |      UNION ALL
        |      SELECT o_orderkey, 'b' FROM orders WHERE o_orderkey < 5) d
        |JOIN lineitem l ON d.k = l.l_orderkey
        |ORDER BY d.tag, l.l_orderkey, l.l_linenumber""".stripMargin)))
  }

  test("empty build side renders the widened 1=0 shape, zero rows") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    val before = alpha.executedSql.size
    graft.sources.Tables.orders(spark, dir)
      .filter("o_totalprice > 99999999")
      .selectExpr("o_orderkey", "o_orderpriority")
      .createOrReplaceTempView("no_orders")
    val df = spark.sql(
      """SELECT l_orderkey, o_orderpriority
        |FROM fed_lineitem JOIN no_orders ON l_orderkey = o_orderkey""".stripMargin)
    if (boundFrags(df).nonEmpty) {
      assert(df.collect().isEmpty)
      val executed = alpha.executedSql.drop(before).filter(_.contains("lineitem"))
      // AQE may skip the scan; if it ran, it must carry the short-circuit
      assert(executed.isEmpty || executed.exists(_.contains("1=0")),
        s"fact ran unfiltered:\n${executed.mkString("\n")}")
    } else fail(s"join did not bind:\n${df.queryExecution.optimizedPlan}")
  }

  test("null payload values render as typed NULLs and match local") {
    setup()
    // payload NULL on one build row: must render CAST(NULL AS <type>)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW nullable_dim AS
        |SELECT o_orderkey AS k,
        |  CASE WHEN o_orderkey = 2 THEN NULL ELSE o_orderstatus END AS payload
        |FROM orders WHERE o_orderkey <= 3""".stripMargin)
    val df = spark.sql(
      """SELECT l.l_orderkey, l.l_linenumber, d.payload
        |FROM fed_lineitem l JOIN nullable_dim d ON l.l_orderkey = d.k
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)
    assert(boundFrags(df).nonEmpty,
      s"join did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT l.l_orderkey, l.l_linenumber, d.payload
        |FROM lineitem l JOIN
        |  (SELECT o_orderkey AS k,
        |     CASE WHEN o_orderkey = 2 THEN NULL ELSE o_orderstatus END AS payload
        |   FROM orders WHERE o_orderkey <= 3) d ON l.l_orderkey = d.k
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)))
  }

  test("refusals: FP keys, residual predicates, unfiltered or oversize builds") {
    setup()
    // FP join key → refuse (falls back to runtime filter machinery)
    val fp = spark.sql(
      """SELECT COUNT(*) AS n FROM fed_lineitem
        |JOIN (SELECT DISTINCT l_quantity AS q FROM lineitem WHERE l_quantity < 3) d
        |  ON l_quantity = d.q""".stripMargin)
    assert(boundFrags(fp).isEmpty, "FP key must not bind")
    // MIXED-side residual conjunct (references both fragment and build
    // beyond the equality) → refuse; fragment-side-only residuals bind
    // since r8 (see the dedicated residual tests below)
    graft.sources.Tables.orders(spark, dir)
      .filter("o_totalprice > 480000")
      .createOrReplaceTempView("big_orders2")
    val residual = spark.sql(
      """SELECT COUNT(*) AS n
        |FROM fed_lineitem JOIN big_orders2
        |  ON l_orderkey = o_orderkey AND l_extendedprice > o_totalprice / 100""".stripMargin)
    assert(boundFrags(residual).isEmpty, "mixed residual predicate must not bind")
    assert(residual.collect().head.getLong(0) ==
      spark.sql(
        """SELECT COUNT(*) AS n
          |FROM lineitem JOIN (SELECT * FROM orders WHERE o_totalprice > 480000) o
          |  ON l_orderkey = o_orderkey AND l_extendedprice > o_totalprice / 100""".stripMargin)
        .collect().head.getLong(0))
    // unfiltered (non-selective) dimension → refuse
    val unfiltered = spark.sql(
      """SELECT COUNT(*) AS n
        |FROM fed_lineitem JOIN nation ON l_suppkey = n_nationkey""".stripMargin)
    assert(boundFrags(unfiltered).isEmpty, "unfiltered dim must not bind")
    // oversize build (cap forced to 1 byte) → refuse
    spark.conf.set(BindJoinRule.MaxBytesKey, "1")
    try {
      val over = spark.sql(
        """SELECT COUNT(*) AS n
          |FROM fed_lineitem JOIN big_orders2 ON l_orderkey = o_orderkey""".stripMargin)
      assert(boundFrags(over).isEmpty, "over-cap build must not bind")
    } finally spark.conf.unset(BindJoinRule.MaxBytesKey)
  }

  test("semi join binds as EXISTS against the VALUES table") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    val before = alpha.executedSql.size
    // unfiltered small build: the semi output is a subset of the fragment,
    // so the selectivity bar is deliberately relaxed
    val df = spark.sql(
      """SELECT s_name FROM fed_supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2)
        |ORDER BY s_name""".stripMargin)
    assert(boundFrags(df).exists(_.bindJoins.head.joinType ==
        org.apache.spark.sql.catalyst.plans.LeftSemi),
      s"semi join did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT s_name FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2)
        |ORDER BY s_name""".stripMargin)))
    assert(alpha.executedSql.drop(before).exists(s =>
        s.contains("WHERE EXISTS") && s.contains("(VALUES")),
      s"no EXISTS-VALUES SQL executed:\n${alpha.executedSql.drop(before).mkString("\n")}")
  }

  test("anti join binds as NOT EXISTS; null-aware NOT IN refuses") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    val before = alpha.executedSql.size
    val df = spark.sql(
      """SELECT s_name FROM fed_supplier s
        |WHERE NOT EXISTS (SELECT 1 FROM nation n
        |  WHERE n.n_nationkey = s.s_nationkey AND n.n_regionkey < 2)
        |ORDER BY s_name""".stripMargin)
    assert(boundFrags(df).exists(_.bindJoins.head.joinType ==
        org.apache.spark.sql.catalyst.plans.LeftAnti),
      s"anti join did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT s_name FROM supplier s
        |WHERE NOT EXISTS (SELECT 1 FROM nation n
        |  WHERE n.n_nationkey = s.s_nationkey AND n.n_regionkey < 2)
        |ORDER BY s_name""".stripMargin)))
    assert(alpha.executedSql.drop(before).exists(s =>
        s.contains("WHERE NOT EXISTS") && s.contains("(VALUES")),
      s"no NOT-EXISTS-VALUES SQL executed:\n${alpha.executedSql.drop(before).mkString("\n")}")
    // null-aware anti (NOT IN over a nullable key expression): the Or/
    // IsNull condition is not bare equi-pairs — must refuse
    val notIn = spark.sql(
      """SELECT COUNT(*) AS n FROM fed_supplier
        |WHERE CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END
        |  NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2)""".stripMargin)
    assert(boundFrags(notIn).isEmpty,
      s"null-aware NOT IN must not bind:\n${notIn.queryExecution.optimizedPlan}")
    assert(rows(notIn) == rows(spark.sql(
      """SELECT COUNT(*) AS n FROM supplier
        |WHERE CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END
        |  NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2)""".stripMargin)))
  }

  test("inline DataFrame dim federates as VALUES inside ONE remote SQL, aggregate included") {
    setup()
    import spark.implicits._
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    val before = alpha.executedSql.size
    Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "tag").createOrReplaceTempView("inline_dim")
    // unlike the execution-time bind join, the VALUES relation composes:
    // the aggregate ABOVE the join ships in the same remote SQL
    val df = spark.sql(
      """SELECT tag, COUNT(*) AS n
        |FROM fed_lineitem JOIN inline_dim ON l_orderkey = k
        |GROUP BY tag ORDER BY tag""".stripMargin)
    val frags = df.queryExecution.optimizedPlan.collect {
      case f: FederatedPlan => f
    }
    assert(frags.nonEmpty, s"did not federate:\n${df.queryExecution.optimizedPlan}")
    assert(boundFrags(df).isEmpty,
      "should ride the VALUES relation, not the execution-time bind")
    assert(rows(df) == rows(spark.sql(
      """SELECT tag, COUNT(*) AS n
        |FROM lineitem JOIN (SELECT * FROM VALUES (1L,'one'),(2L,'two'),(3L,'three')
        |  AS t(k, tag)) ON l_orderkey = k
        |GROUP BY tag ORDER BY tag""".stripMargin)))
    val executed = alpha.executedSql.drop(before)
    assert(executed.exists(s => s.contains("(VALUES") &&
        s.contains("GROUP BY") && s.contains("lineitem")),
      s"VALUES + aggregate not in one remote SQL:\n${executed.mkString("\n")}")
  }

  test("gate query fed_bind_join binds and matches its oracle shape") {
    val df = Federated.bindJoin(spark, dir)
    assert(boundFrags(df).nonEmpty,
      s"gate query did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(df.count() > 0)
  }

  test("inner bind with fragment-side residual rides into the remote WHERE") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    // For an INNER join Catalyst always pushes a fragment-side conjunct
    // out of the condition before any injected rule runs, and
    // PushDownPredicates is on the optimizer's non-excludable list — so
    // the condition-carrying shape is built directly here: the shape a
    // plan gets when a residual survives to the rule (as anti conditions
    // do naturally; see the next test).
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, LessThan, Literal}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, Project}
    val frag = spark.sql("SELECT l_orderkey, l_linenumber, l_quantity FROM fed_lineitem")
      .queryExecution.optimizedPlan.collectFirst { case f: FederatedPlan => f }
      .getOrElse(fail("fragment did not federate"))
    val build = graft.sources.Tables.orders(spark, dir)
      .filter("o_totalprice > 480000").select("o_orderkey")
      .queryExecution.optimizedPlan
    def out(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val cond = And(
      EqualTo(out(frag, "l_orderkey"), out(build, "o_orderkey")),
      LessThan(out(frag, "l_quantity"), Literal(10.0)))
    val joined = Join(frag, build, Inner, Some(cond), JoinHint.NONE)
    val rewritten = BindJoinRule(joined)
    val bound = rewritten.collectFirst {
      case f: FederatedPlan if f.bindJoins.nonEmpty => f }
      .getOrElse(fail(s"residual join did not bind:\n$rewritten"))
    assert(bound.bindJoins.head.residual.nonEmpty, "bind carries no residual")
    assert(rewritten.isInstanceOf[FederatedPlan], "join must collapse to the leaf")
    // execute the bound plan and the original local join: identical rows
    val before = alpha.executedSql.size
    val project = (p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =>
      Project(Seq(out(p, "l_orderkey"), out(p, "l_linenumber")), p)
    val got = org.apache.spark.sql.GraftShims.ofRows(spark, project(rewritten))
      .orderBy("l_orderkey", "l_linenumber")
    val want = spark.sql(
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem JOIN (SELECT * FROM orders WHERE o_totalprice > 480000) o
        |  ON l_orderkey = o_orderkey AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    assert(rows(got) == rows(want), "bound result differs from local join")
    val executed = alpha.executedSql.drop(before)
    assert(executed.exists(s => s.contains("JOIN (VALUES") &&
        s.contains("WHERE") && s.contains("l_quantity")),
      s"residual not in the remote SQL:\n${executed.mkString("\n")}")
  }

  test("anti bind with NULL-valued residual keeps the row (Spark semantics)") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    val before = alpha.executedSql.size
    // left-side conjuncts of an ANTI condition are NOT pushable (dropping
    // the row when the residual is false/NULL would be wrong), so this
    // residual reaches the rule in the condition under the DEFAULT
    // optimizer — no excludedRules needed. The CASE makes the residual
    // NULL for some probe rows: Spark keeps such rows (condition never
    // TRUE); rendering the residual INSIDE NOT EXISTS reproduces that.
    val df = spark.sql(
      """SELECT s_suppkey, s_name FROM fed_supplier s
        |LEFT ANTI JOIN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2) n
        |  ON s.s_nationkey = n.n_nationkey
        |     AND (CASE WHEN s.s_suppkey % 3 = 0 THEN NULL ELSE true END)
        |ORDER BY s_suppkey""".stripMargin)
    val bound = boundFrags(df)
    assert(bound.exists(f =>
        f.bindJoins.head.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti &&
        f.bindJoins.head.residual.nonEmpty),
      s"anti residual did not bind:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT s_suppkey, s_name FROM supplier s
        |LEFT ANTI JOIN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2) n
        |  ON s.s_nationkey = n.n_nationkey
        |     AND (CASE WHEN s.s_suppkey % 3 = 0 THEN NULL ELSE true END)
        |ORDER BY s_suppkey""".stripMargin)))
    val executed = alpha.executedSql.drop(before)
    // the residual references s_suppkey, which no key equality does; its
    // text may differ from the CASE (Catalyst legally rewrites NULL to
    // FALSE under condition-must-be-TRUE semantics) but must sit INSIDE
    // the NOT EXISTS subquery, after the ON equality
    assert(executed.exists(s => s.contains("NOT EXISTS") &&
        s.indexOf("s_suppkey", s.indexOf("NOT EXISTS")) > 0),
      s"residual not inside NOT EXISTS:\n${executed.mkString("\n")}")
  }

  test("star: two dims chain-bind; snowflake key resolves the first build's alias") {
    setup()
    val alpha = FederationHarness.executor(spark, dir, "alpha")
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW star_nat AS
        |SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 20""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW star_reg AS
        |SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3""".stripMargin)
    val before = alpha.executedSql.size
    val df = spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM fed_supplier s
        |JOIN star_nat n ON s.s_nationkey = n.n_nationkey
        |JOIN star_reg r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    val bound = boundFrags(df)
    assert(bound.nonEmpty && bound.head.bindJoins.size == 2,
      s"expected 2 binds:\n${df.queryExecution.optimizedPlan}")
    assert(rows(df) == rows(spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM supplier s
        |JOIN star_nat n ON s.s_nationkey = n.n_nationkey
        |JOIN star_reg r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)))
    val executed = alpha.executedSql.drop(before)
    // both VALUES tables nest in ONE remote SQL; the region bind's ON
    // references the nation bind's __bj alias on the bj_sub side (the
    // snowflake key is a build column, not a fragment column)
    val star = executed.find(s =>
      s.sliding("JOIN (VALUES".length).count(_ == "JOIN (VALUES") == 2)
    assert(star.isDefined,
      s"no remote SQL carries both binds:\n${executed.mkString("\n")}")
    assert(star.get.contains("bj_sub.__bj_") &&
        star.get.contains("= bj_b.__bj1_"),
      s"second ON does not key on the first build's alias:\n${star.get}")
    // no local join survives
    assert(!df.queryExecution.executedPlan.toString().contains("Join"),
      df.queryExecution.executedPlan.toString())
  }

  test("gate fed_bind_join_star: cross-provider star binds both beta dims") {
    val df = Federated.bindJoinStar(spark, dir)
    val bound = boundFrags(df)
    assert(bound.nonEmpty && bound.head.bindJoins.size == 2,
      s"gate star did not double-bind:\n${df.queryExecution.optimizedPlan}")
    assert(df.count() > 0)
  }
}
