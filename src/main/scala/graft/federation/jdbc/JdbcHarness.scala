package graft.federation.jdbc

import java.sql.DriverManager

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.federation.Federation

/** Gate/test harness for the REAL JDBC path: loads small dimension tables
  * from the driver's parquet testdata into an embedded in-memory Derby
  * database and registers them as `jdbc_*` remote views. The federation
  * pipeline then ships actual Derby SQL over an actual JDBC connection —
  * the production analog of the mock [[graft.federation.sql.SparkSqlExecutor]].
  *
  * Tables are created with quoted lower-case identifiers so names
  * round-trip Derby's unquoted-to-uppercase folding unchanged.
  */
object JdbcHarness {

  private val loaded = TrieMap.empty[(Int, String), JdbcSqlExecutor]

  /** Load `tables` (small ones — rows transit the driver) for `dir` into a
    * per-(session, dir) Derby database; idempotent. */
  def executor(spark: SparkSession, dir: String,
      tables: Seq[String] = Seq("supplier", "nation")): JdbcSqlExecutor =
    loaded.getOrElseUpdate((System.identityHashCode(spark), dir), {
      val db = s"graft_${Math.abs(dir.hashCode)}_${System.identityHashCode(spark)}"
      val url = s"jdbc:derby:memory:$db;create=true"
      val conn = DriverManager.getConnection(url)
      try {
        tables.foreach { t =>
          val df = spark.read.parquet(s"$dir/$t.parquet")
          val cols = df.schema.fields.map(f =>
            s""""${f.name}" ${derbyType(f.dataType)}""").mkString(", ")
          val st = conn.createStatement()
          st.executeUpdate(s"""CREATE TABLE "$t" ($cols)""")
          st.close()
          val ps = conn.prepareStatement(
            s"""INSERT INTO "$t" VALUES (${df.schema.map(_ => "?").mkString(",")})""")
          df.collect().foreach { row =>
            df.schema.fields.zipWithIndex.foreach { case (f, i) =>
              // Derby rejects setNull(Types.NULL) — pass the column's type
              if (row.isNullAt(i)) ps.setNull(i + 1, jdbcType(f.dataType))
              else f.dataType match {
                case LongType => ps.setLong(i + 1, row.getLong(i))
                case IntegerType => ps.setInt(i + 1, row.getInt(i))
                case DoubleType => ps.setDouble(i + 1, row.getDouble(i))
                case StringType => ps.setString(i + 1, row.getString(i))
                case other => throw new UnsupportedOperationException(
                  s"harness load of $other")
              }
            }
            ps.addBatch()
          }
          ps.executeBatch()
          ps.close()
        }
      } finally conn.close()
      new JdbcSqlExecutor("derby", spark, s"jdbc:derby:memory:$db", DerbyDialect)
    })

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case DoubleType => java.sql.Types.DOUBLE
    case StringType => java.sql.Types.VARCHAR
    case other => throw new UnsupportedOperationException(s"jdbc type for $other")
  }

  private def derbyType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case StringType => "VARCHAR(128)"
    case other => throw new UnsupportedOperationException(s"derby type for $other")
  }

  /** Register `jdbc_<table>` remote views over the Derby database and run
    * a SQL query against them. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    Federation.install(spark)
    val ex = executor(spark, dir)
    ex.tableNames.foreach { t =>
      Federation.registerRemoteTable(spark, s"jdbc_$t", t, ex)
    }
    spark.sql(query)
  }
}
