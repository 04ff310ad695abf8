package graft.federation.exec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.LeafExecNode
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.StructType

import graft.federation.sql.SqlExecutor

/** Physical leaf that ships `sql` to a remote engine and streams rows back
  * — the Spark analog of the reference's `VirtualExecutionPlan` (+ its
  * `SchemaCastScanExec` wrapper; coercion happens inside the executor's
  * `execute`, see [[graft.federation.sql.SchemaCoercion]]).
  *
  * The generated SQL appears in EXPLAIN (the reference displays it the
  * same way, src/sql/mod.rs:348-369). Partitioning is delegated to the
  * executor: JDBC-style executors may parallelize via split predicates; the
  * in-process mock inherits the inner plan's partitions.
  */
final case class RemoteScanExec(
    override val output: Seq[Attribute],
    sql: String,
    @transient executor: SqlExecutor)
  extends LeafExecNode {
  // @transient: physical plans are captured in task closures (whole-stage
  // codegen, broadcast); the executor is only dereferenced driver-side in
  // doExecute, and remote engines aren't java-serializable.

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rows = metrics("numOutputRows")
    executor.execute(sql, org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(output))
      .mapPartitions { it => it.map { r => rows += 1; r } }
  }

  override def simpleString(maxFields: Int): String =
    s"RemoteScan [${executor.name}] sql=$sql"
}
