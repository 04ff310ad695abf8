package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.federation.sql.{RemoteTableRef, SchemaCoercion, TableArg}

/** Schema-coercion kernels (reference schema_cast, SURVEY §4.3) and
  * table-reference parsing (reference table_reference.rs tests). */
class CoercionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-coercion-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("string → array via from_json decode") {
    import spark.implicits._
    val df = Seq(("[1,2,3]", 1L), ("[]", 2L), (null: String, 3L))
      .toDF("xs", "id")
    val out = SchemaCoercion.coerce(df,
      StructType(Seq(
        StructField("xs", ArrayType(IntegerType)),
        StructField("id", LongType))))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getSeq[Int](0) == Seq(1, 2, 3))
    assert(rows(1).getSeq[Int](0) == Seq())
    assert(rows(2).isNullAt(0))
  }

  test("string → struct via from_json decode") {
    import spark.implicits._
    val df = Seq(("""{"a": 7, "b": "x"}""", 1L)).toDF("s", "id")
    val target = StructType(Seq(
      StructField("s", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType)))),
      StructField("id", LongType)))
    val r = SchemaCoercion.coerce(df, target).collect().head.getStruct(0)
    assert(r.getInt(0) == 7 && r.getString(1) == "x")
  }

  test("calendar interval narrows to year-month when day/time are zero") {
    val df = spark.range(1)
      .select(make_interval(lit(1), lit(2)).as("i"))
    val out = SchemaCoercion.coerce(df,
      StructType(Seq(StructField("i", YearMonthIntervalType()))))
    val p = out.collect().head.get(0).asInstanceOf[java.time.Period]
    assert(p.toTotalMonths == 14)
  }

  test("calendar interval narrows to day-time with sub-ms truncation") {
    val df = spark.range(1)
      .select(make_interval(lit(0), lit(0), lit(0), lit(3), lit(4), lit(0),
        lit(BigDecimal("5.123456"))).as("i"))
    val out = SchemaCoercion.coerce(df,
      StructType(Seq(StructField("i", DayTimeIntervalType()))))
    val d = out.collect().head.get(0).asInstanceOf[java.time.Duration]
    // 3d 4h 5.123456s → micros truncated to ms (reference ns→ms behavior)
    assert(d == java.time.Duration.ofDays(3).plusHours(4)
      .plusSeconds(5).plusMillis(123))
  }

  test("mixed interval refuses year-month narrowing loudly") {
    val df = spark.range(1)
      .select(make_interval(lit(0), lit(1), lit(0), lit(2)).as("i"))
    val out = SchemaCoercion.coerce(df,
      StructType(Seq(StructField("i", YearMonthIntervalType()))))
    val e = intercept[Exception](out.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("YEAR TO MONTH")))
  }

  // ---- RemoteTableRef parsing (reference table_reference.rs:154-290) ----

  test("bare, partial, and full references parse") {
    assert(RemoteTableRef.parse("t").parts == Seq("t"))
    assert(RemoteTableRef.parse("s.t").parts == Seq("s", "t"))
    assert(RemoteTableRef.parse("c.s.t").parts == Seq("c", "s", "t"))
  }

  test("quoted parts keep dots and case") {
    val r = RemoteTableRef.parse("\"Sch.ema\".t")
    assert(r.parts == Seq("Sch.ema", "t"))
  }

  test("table-function args parse positionally and named") {
    val r = RemoteTableRef.parse("s.view(1, 2)")
    assert(r.parts == Seq("s", "view"))
    assert(r.args.get == Seq(TableArg.Positional("1"), TableArg.Positional("2")))
    val n = RemoteTableRef.parse("view(name => 'obj')")
    assert(n.args.get == Seq(TableArg.Named("name", "'obj'")))
  }

  test("table-function reference executes end-to-end through federation") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    graft.federation.Federation.install(spark)
    val exec = new graft.federation.sql.SparkSqlExecutor(
      "fnexec", spark.newSession(), Map.empty, context = "fnexec@mem")
    // range(6) is a table function the remote (Spark) engine accepts;
    // schema is declared, not inferred (no plain-table fallback exists)
    val rel = graft.federation.plans.RemoteRelation(
      RemoteTableRef.parse("range(6)"), exec,
      Seq(AttributeReference("id", LongType, nullable = false)()))
    val df = org.apache.spark.sql.GraftShims.ofRows(spark, rel)
      .filter(col("id") >= 2).orderBy(col("id"))
    val scan = df.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("RemoteScan")).getOrElse("")
    assert(scan.contains("range(6)"), s"table args lost: $scan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 5L))
  }
}
