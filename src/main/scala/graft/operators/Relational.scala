package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exact._
import graft.sources.Tables._

/** Core relational operators exercised TPC-H-style over the driver's
  * synthetic star schema. Each query has a DuckDB oracle (see
  * [[graft.SparkEntry.oracleSql]]) with identical column names and
  * deterministic ordering.
  *
  * Scale notes (100 TB design):
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast
  *    explicitly — no shuffle of the fact table for star joins;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once; AQE
  *    handles skew;
  *  - all aggregations are partial-aggregate friendly (sum/count/min/max of
  *    decimals), so map-side combine cuts shuffle volume;
  *  - decimal arithmetic (see [[graft.functions.Exact]]) keeps results
  *    order-independent, which is also what makes them reproducible across
  *    cluster sizes.
  */
object Relational {

  /** TPC-H Q1: pricing summary report. Single scan, partial-agg friendly. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumExact(col("l_quantity")).as("sum_qty"),
        sumExact(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast("double").as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        (sum(rate(col("l_discount"))).cast("double") / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(9,4))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3: shipping-priority top 10. customer is broadcast; orders ⋈
    * lineitem shuffles once on o_orderkey. Deterministic tiebreak on key. */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation for suppliers co-located with their
    * customers. All dimensions broadcast; only orders ⋈ lineitem shuffles. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
    val o = orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = customer(s, dir)
    val su = supplier(s, dir)
    val n = nation(s, dir)
    val r = region(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem, orders, customer, supplier, nation, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6: forecasting revenue change — pure scan + filter + agg,
    * fully pushed to parquet (PushedFilters on l_shipdate). */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * rate(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  val q6Oracle: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.04 AND l_discount <= 0.06
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10-style: top 20 customers by returned-item revenue. */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir).filter(col("l_returnflag") === "R")
    val o = orders(s, dir)
    val c = customer(s, dir)
    val n = nation(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Oracle: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem, orders, customer, nation
      |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q14-style: promo revenue share. part is broadcast. The shares are
    * computed from two exact decimal sums, then one double division. */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val p = part(s, dir)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type").startsWith("PROMO"),
          discPrice(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0 /
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double")).as("promo_revenue_pct"))
  }

  val q14Oracle: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      |    AS promo_revenue_pct
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  /** Window functions: top-3 highest-value orders per priority class
    * (rank over partitioned window, deterministic tiebreak). */
  def qTopOrdersPerPriority(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, dir)
      .withColumn("rank_in_priority", row_number().over(w))
      .filter(col("rank_in_priority") <= 3)
      .select(col("o_orderpriority"), col("rank_in_priority"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rank_in_priority"))
  }

  val qTopOrdersOracle: String =
    """SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank_in_priority
      |  FROM orders) t
      |WHERE rank_in_priority <= 3
      |ORDER BY o_orderpriority, rank_in_priority""".stripMargin

  /** ROLLUP aggregation (grouping sets family). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sumExact(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val qRollupOracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Correlated-style anti join: customers with no URGENT order, counted per
    * market segment — NOT EXISTS expressed as a left-anti join. */
  def qCustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val qCustomersWithoutOrdersOracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Scalar-subquery pattern: parts priced above the average retail price of
    * their brand (decorrelated by Catalyst into a broadcast join). Average is
    * exact-decimal summed then double-divided, so it hash-matches DuckDB. */
  def qAboveBrandAvg(s: SparkSession, dir: String): DataFrame = {
    val p = part(s, dir)
    val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
      .agg((sum(dec2(col("p_retailprice"))).cast("double") / count(lit(1)))
        .as("brand_avg"))
    p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
      .filter(col("p_retailprice") > col("brand_avg"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("p_brand"))
  }

  val qAboveBrandAvgOracle: String =
    """SELECT p_brand, COUNT(*) AS n_above
      |FROM part p
      |JOIN (SELECT p_brand AS b_brand,
      |        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS brand_avg
      |      FROM part GROUP BY p_brand) a
      |  ON p.p_brand = a.b_brand
      |WHERE p_retailprice > brand_avg
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** UNION ALL + distinct count: all distinct keys appearing on either side
    * of the order/lineitem relationship. */
  def qUnionKeys(s: SparkSession, dir: String): DataFrame = {
    val a = orders(s, dir).select(col("o_orderkey").as("k"))
    val b = lineitem(s, dir).select(col("l_orderkey").as("k"))
    a.union(b).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("k")).as("n_keys"))
  }

  val qUnionKeysOracle: String =
    """SELECT COUNT(*) AS n_rows, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
      |FROM (SELECT o_orderkey AS k FROM orders
      |      UNION ALL
      |      SELECT l_orderkey AS k FROM lineitem) t""".stripMargin
}
