package graft.federation.exec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.LeafExecNode
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.StructType

import graft.federation.sql.SqlExecutor

/** Physical leaf that ships SQL to a remote engine and streams rows back
  * — the Spark analog of the reference's `VirtualExecutionPlan` (+ its
  * `SchemaCastScanExec` wrapper; coercion happens inside the executor's
  * `execute`, see [[graft.federation.sql.SchemaCoercion]]).
  *
  * `sqls` holds one query per remote cursor: a single fragment SQL in the
  * common case, or n disjoint split queries for a splittable fragment on a
  * split-capable executor ([[graft.federation.sql.SplitScan]]) — the
  * resulting RDD is the union, so downstream operators consume n-way
  * parallel input (n tasks each holding one remote cursor on a cluster).
  *
  * The generated SQL appears in EXPLAIN (the reference displays it the
  * same way, src/sql/mod.rs:348-369).
  */
final case class RemoteScanExec(
    override val output: Seq[Attribute],
    sqls: Seq[String],
    @transient executor: SqlExecutor)
  extends LeafExecNode {
  // @transient: physical plans are captured in task closures (whole-stage
  // codegen, broadcast); the executor is only dereferenced driver-side in
  // doExecute, and remote engines aren't java-serializable.

  require(sqls.nonEmpty, "RemoteScanExec needs at least one query")

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rows = metrics("numOutputRows")
    val schema =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(output)
    val rdd = sqls match {
      case Seq(one) => executor.execute(one, schema)
      case many => sparkContext.union(many.map(executor.execute(_, schema)))
    }
    // executors may emit generic rows (e.g. JDBC conversion); downstream
    // operators require UnsafeRow. Rows that already are unsafe (the mock
    // executor's toRdd) pass through without a copy.
    val types = output.map(_.dataType)
    rdd.mapPartitions { it =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(types.toArray)
      it.map { r =>
        rows += 1
        r match {
          case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u
          case other => proj(other)
        }
      }
    }
  }

  override def simpleString(maxFields: Int): String = {
    val split = if (sqls.size > 1) s" splits=${sqls.size}" else ""
    s"RemoteScan [${executor.name}]$split sql=${sqls.head}"
  }
}

object RemoteScanExec {
  def apply(output: Seq[Attribute], sql: String,
      executor: SqlExecutor): RemoteScanExec =
    RemoteScanExec(output, Seq(sql), executor)
}
