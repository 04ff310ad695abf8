package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, SerializedOffset, Source}
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

import graft.federation.{Federation, RemoteEngineCatalog}
import graft.federation.sql.{RemoteTableRef, SqlExecutor}

/** Streaming federated SOURCE — the ingestion direction remote → stream,
  * the counterpart of the epoch-fenced remote sinks: a V1 microbatch
  * source that incrementally reads a LIVE remote table by a monotone
  * cursor column. Each trigger probes the remote high-water mark (one
  * federated `SELECT MAX(cursor)`, a 1-row wire fetch) and the batch
  * reads exactly the half-open cursor range `(lastMax, newMax]` — the
  * range predicate rides the normal federation path, so it is PUSHED
  * into the remote SQL and the wire carries only the new rows.
  *
  * Exactly-once contract (mirrors the sink's epoch fence, from the other
  * side): offsets are cursor values, durably WAL-ed by the streaming
  * engine before a batch runs; a crash/restart replays the SAME
  * `(start, end]` range, and a task retry re-runs the same wire SQL —
  * both yield the same rows under the source's append-only contract
  * (cursor values are never updated, deleted, or inserted below an
  * already-observed maximum; the classic CDC cursor assumption). The
  * remote max is therefore also the stream's high-water mark: with a
  * timestamp cursor, `withWatermark` on that column downstream is exact,
  * because a batch can never later contain rows at-or-below an already
  * emitted maximum.
  *
  * Scale shape: per trigger, ONE 1-row probe + one range-filtered
  * fetch (split scans apply to it like any fragment). The source reads
  * full rows (V1 sources see no downstream pruning) — cursor ingestion
  * is row-shaped by nature; prune in the remote VIEW if columns are fat.
  *
  * Wire-up:
  * {{{
  *   Federation.registerCatalog(spark, "duck", Seq(executor))
  *   spark.readStream.format("graft-fed")
  *     .option("catalog", "duck")        // executor chain to read from
  *     .option("table", "events_live")   // remote table (first match wins)
  *     .option("cursor", "event_id")     // monotone BIGINT/INT/timestamp
  *     .option("cursorStep", "20000")    // optional: cap cursor advance
  *     .load()                           //   per batch (paced backfill)
  * }}}
  */
class FedStreamSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-fed"

  private def resolve(params: Map[String, String]):
      (SqlExecutor, RemoteTableRef, String, Option[Long]) = {
    val cat = params.getOrElse("catalog", throw new IllegalArgumentException(
      "graft-fed source needs option 'catalog' (a name passed to " +
        "Federation.registerCatalog)"))
    val table = params.getOrElse("table", throw new IllegalArgumentException(
      "graft-fed source needs option 'table'"))
    val cursor = params.getOrElse("cursor", throw new IllegalArgumentException(
      "graft-fed source needs option 'cursor' (a monotone column)"))
    val spec = RemoteEngineCatalog.registry.getOrElse(cat,
      throw new IllegalArgumentException(s"no catalog '$cat' registered"))
    val ref = RemoteTableRef.parse(table)
    // first-match-wins across the catalog's executor chain, same rule as
    // catalog table resolution
    val ex = spec.executors.find(_.tableNames.contains(ref.parts.last))
      .orElse(spec.executors.find { e =>
        try { e.tableSchema(ref); true }
        catch { case scala.util.control.NonFatal(_) => false }
      })
      .getOrElse(throw new IllegalArgumentException(
        s"table '$table' not found in any executor of catalog '$cat'"))
    (ex, ref, cursor, params.get("cursorStep").map(_.toLong))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (ex, ref, cursor, _) = resolve(parameters)
    val s = ex.tableSchema(ref)
    require(s.fieldNames.contains(cursor),
      s"cursor column '$cursor' not in remote schema ${s.fieldNames.toSeq}")
    (s"graft-fed:${ex.name}:$ref", s)
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val (ex, ref, cursor, step) = resolve(parameters)
    new FedStreamSource(sqlContext.sparkSession, ex, ref, cursor, step)
  }
}

/** One instance per running query; all progress state lives in the
  * engine's offset log, so the source itself is stateless across
  * restarts (the exactly-once property). */
class FedStreamSource(
    spark: SparkSession,
    val executor: SqlExecutor,
    val ref: RemoteTableRef,
    cursorCol: String,
    cursorStep: Option[Long]) extends Source with Logging {

  override val schema: StructType = executor.tableSchema(ref)

  private val cursorType = schema(cursorCol).dataType
  require(cursorType match {
    case IntegerType | LongType | ShortType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }, s"cursor '$cursorCol' must be integral or date/time, is $cursorType")

  /** Offsets are the cursor's value as a long (micros for timestamps,
    * days for dates) — totally ordered and JSON-stable. */
  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case ts: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)
    case ldt: java.time.LocalDateTime =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(ldt)
    case i: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case ld: java.time.LocalDate => ld.toEpochDay
    case other => throw new IllegalStateException(
      s"unexpected cursor value $other (${other.getClass})")
  }

  private def cursorLit(v: Long) = cursorType match {
    case TimestampType | TimestampNTZType =>
      org.apache.spark.sql.functions.timestamp_micros(lit(v))
        .cast(cursorType)
    case DateType =>
      org.apache.spark.sql.functions.date_from_unix_date(lit(v.toInt))
    case _ => lit(v).cast(cursorType)
  }

  private def table: DataFrame =
    Federation.remoteDataFrame(spark, ref.toString, executor)

  // monotone guard: a remote max that moves BACKWARD (rows deleted at the
  // head) must not rewind the stream — keep the high-water mark
  @volatile private var seenMax: Option[Long] = None

  override def getOffset: Option[OffsetV1] = {
    // one federated 1-row aggregate: `SELECT MAX(cursor) FROM ref`
    // executes on the remote engine, the wire carries one value
    val row = table.agg(max(col(cursorCol)).as("m")).collect().head
    val remote = if (row.isNullAt(0)) None else Some(toLong(row.get(0)))
    val capped = (remote, seenMax, cursorStep) match {
      case (Some(r), last, Some(s)) =>
        // paced backfill: advance at most `s` cursor units per batch so a
        // huge first read splits into bounded microbatches; the first
        // batch bases off the remote MIN (one more 1-row probe)
        val base = last.getOrElse {
          val m = table.agg(org.apache.spark.sql.functions
            .min(col(cursorCol)).as("m")).collect().head
          toLong(m.get(0)) - 1L
        }
        Some(math.max(base, math.min(r, base + s)))
      case (Some(r), Some(last), None) => Some(math.max(r, last))
      case (Some(r), None, None) => Some(r)
      case (None, last, _) => last
    }
    capped.foreach(c => seenMax = Some(seenMax.fold(c)(math.max(_, c))))
    seenMax.map(FedOffset)
  }

  private def valueOf(o: OffsetV1): Long = o match {
    case FedOffset(v) => v
    case other => other.json().trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val hi = valueOf(end)
    seenMax = Some(seenMax.fold(hi)(math.max(_, hi))) // restart path
    val lo = start.map(valueOf)
    val ranged = lo.foldLeft(table.where(col(cursorCol) <= cursorLit(hi)))(
      (df, l) => df.where(col(cursorCol) > cursorLit(l)))
    logInfo(s"graft-fed batch $ref $cursorCol in (${lo.getOrElse("-inf")}, $hi]")
    // plan now (the range predicate federates into the wire SQL); execute
    // lazily when the microbatch runs
    GraftShims.streamingDataFrame(spark, ranged.queryExecution.toRdd, schema)
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"FedStreamSource[${executor.name}] $ref by $cursorCol"
}

case class FedOffset(value: Long) extends OffsetV1 {
  override def json: String = value.toString
}
