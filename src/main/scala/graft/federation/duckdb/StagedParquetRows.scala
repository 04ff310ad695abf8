package graft.federation.duckdb

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Task-side reader for a staged boundary fetch: the wire worker spilled
  * rows past the stage threshold to a local parquet file (see the
  * `stage_dir` branch of [[DuckDbProcess]]'s server script); this iterator
  * reads it back through Spark's own vectorized parquet reader — the
  * columnar-boundary move of the reference's Arrow-streaming executor
  * contract (src/sql/executor.rs:51-56), with a file standing in for the
  * Arrow IPC stream.
  *
  * The EXPECTED fragment schema is passed as the requested schema
  * (`ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA`), exactly as Spark's
  * own parquet scans do: column vectors are typed by the declared
  * fragment output, and an incompatible file column fails loudly
  * (SchemaColumnConvertNotSupportedException) instead of misreading —
  * the staged twin of the JSON path's schema-drift guard. Rebase modes
  * are CORRECTED: the engine writes proleptic-Gregorian values (probed),
  * so no julian rebase may apply.
  */
private[duckdb] final class StagedParquetRows(
    path: String, schema: StructType)
  extends Iterator[InternalRow] with AutoCloseable {

  private val reader = {
    val conf = new Configuration(false)
    conf.setClassLoader(getClass.getClassLoader)
    conf.set("fs.file.impl",
      classOf[org.apache.hadoop.fs.LocalFileSystem].getName)
    // the key ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA — the object
    // is private[parquet], so the literal is pinned here (and guarded by
    // the round-trip spec)
    conf.set("org.apache.spark.sql.parquet.row.requested_schema", schema.json)
    conf.set("parquet.read.support.class", "org.apache.spark.sql." +
      "execution.datasources.parquet.ParquetReadSupport")
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key, false)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, true)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, true)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, false)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, false)
    val file = new java.io.File(path)
    // the reader casts to the LEGACY mapred split internally
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path(file.toURI), 0, file.length(), Array.empty[String])
    val ctx = new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0))
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    try r.initialize(split, ctx)
    catch {
      case e: Throwable =>
        r.close()
        throw new IllegalStateException(
          s"staged fetch cannot open '$path' against the declared " +
            s"fragment schema ${schema.simpleString} — wire format " +
            s"drift?: $e", e)
    }
    DuckDbProcess.stagedFetches.incrementAndGet()
    r
  }

  @volatile private var closed = false
  private var pending = false
  private var exhausted = false

  override def hasNext: Boolean = {
    if (!pending && !exhausted && !closed) {
      if (reader.nextKeyValue()) pending = true
      else { exhausted = true; close() }
    }
    pending
  }

  override def next(): InternalRow = {
    if (!hasNext) throw new NoSuchElementException
    pending = false
    // row mode (enableReturningBatches not called): the reader hands out
    // a mutable per-batch row — RemoteScanExec's UnsafeProjection copies
    // it before anything downstream retains it
    reader.getCurrentValue.asInstanceOf[InternalRow]
  }

  override def close(): Unit = if (!closed) {
    closed = true
    try reader.close()
    catch { case scala.util.control.NonFatal(_) => () }
  }
}
