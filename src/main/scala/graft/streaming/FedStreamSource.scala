package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, GreaterThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.functions.{col, lit, max, min}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.federation.{Federation, RemoteEngineCatalog}
import graft.federation.plans.RemoteRelation
import graft.federation.sql.{RemoteTableRef, SqlExecutor}

/** Streaming federated SOURCE — the ingestion direction remote → stream,
  * the counterpart of the epoch-fenced remote sinks: a DSv2
  * `MicroBatchStream` that incrementally reads a LIVE remote table by a
  * monotone cursor column. Each trigger probes the remote high-water mark
  * (one federated `SELECT MAX(cursor)`, a 1-row wire fetch) and the batch
  * reads exactly the half-open cursor range `(lastMax, newMax]` — the
  * range predicate rides the normal federation path, so it is PUSHED
  * into the remote SQL and the wire carries only the new rows.
  *
  * The v2 surface (replacing the r12 V1 `Source`) buys three things:
  *  - `SupportsAdmissionControl.latestOffset(start, limit)` receives the
  *    engine-restored START offset every trigger, so pacing bases off the
  *    durable offset log — the V1 form kept the floor in memory and a
  *    restart under `cursorStep` could re-read committed ranges;
  *  - `readStream.table("cat.ns.t")` composes with the DSv2 catalog
  *    ([[graft.federation.RemoteEngineCatalog]]) — no registry lookup;
  *  - the V1 `isStreaming` DataFrame shim is gone: the microbatch scan
  *    relation is swapped for the SAME [[RemoteRelation]] leaf every
  *    federated batch read uses ([[FedStreamScanRule]]), range filter
  *    applied below it, so split scans / pushdown / runtime filters
  *    compose with streaming reads exactly as with batch ones.
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
  * Tie-safety (`cursorHorizon`): the bare MAX probe is tie-UNSAFE for
  * cursors real writers produce — two rows committed with the SAME
  * timestamp straddling a trigger boundary mean the probe observes the
  * first, the batch reads it, and the second (inserted at-or-below the
  * observed maximum) is silently lost. `.option("cursorHorizon", h)`
  * makes the stream read only to `MAX - h` (saturating): rows within the
  * horizon of the head stay unread until the head moves past them, so any
  * writer whose ties span less than `h` cursor units (e.g. h = max commit
  * skew in micros for a timestamp cursor) is read exactly once, loss-free.
  * The production CDC "read to MAX - epsilon" pattern.
  *
  * Scale shape: per trigger, ONE 1-row probe + one range-filtered
  * fetch (split scans apply to it like any fragment). Because the
  * microbatch plan federates like any batch plan, a projected stream
  * PRUNES the wire SELECT list — unprojected fat columns never cross
  * (spec-pinned; the V1 form read full rows).
  *
  * Wire-up (both forms need `Federation.install` / `registerCatalog`):
  * {{{
  *   spark.readStream.format("graft-fed")
  *     .option("catalog", "duck")        // executor chain to read from
  *     .option("table", "events_live")   // remote table (first match wins)
  *     .option("cursor", "event_id")     // monotone BIGINT/INT/timestamp
  *     .option("cursorStep", "20000")    // optional: cap cursor advance
  *     .load()                           //   per batch (paced backfill)
  *   // or through the catalog, no registry indirection:
  *   spark.readStream.option("cursor", "event_id")
  *     .table("duck.main.events_live")
  * }}}
  */
class FedStreamSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-fed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val r = FedStreamSourceProvider.resolve(options)
    val s = r.executor.tableSchema(r.ref)
    require(s.fieldNames.contains(r.cursor),
      s"cursor column '${r.cursor}' not in remote schema ${s.fieldNames.toSeq}")
    s
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val r = FedStreamSourceProvider.resolve(
      new CaseInsensitiveStringMap(properties))
    FedStreamTable(r.executor, r.ref, r.cursor, r.step, r.horizon, r.hooks)
  }
}

object FedStreamSourceProvider {

  private[graft] final case class Resolved(
      executor: SqlExecutor, ref: RemoteTableRef, cursor: String,
      step: Option[Long], horizon: Long,
      hooks: Option[graft.federation.sql.TableHooks])

  /** Parse + validate the step option: must be a positive long. */
  private[graft] def parseStep(params: CaseInsensitiveStringMap):
      Option[Long] =
    Option(params.get("cursorStep")).map { raw =>
      val v =
        try raw.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"option 'cursorStep' must be a positive integer, got '$raw'")
        }
      require(v > 0,
        s"option 'cursorStep' must be > 0, got $v — a non-positive step " +
          "would pin the stream at its base offset forever")
      v
    }

  /** Parse + validate the tie-safety horizon: non-negative (0 = off). */
  private[graft] def parseHorizon(params: CaseInsensitiveStringMap): Long =
    Option(params.get("cursorHorizon")).map { raw =>
      val v =
        try raw.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"option 'cursorHorizon' must be a non-negative integer, got '$raw'")
        }
      require(v >= 0, s"option 'cursorHorizon' must be >= 0, got $v")
      v
    }.getOrElse(0L)

  private def resolve(params: CaseInsensitiveStringMap): Resolved = {
    def req(k: String, hint: String): String =
      Option(params.get(k)).getOrElse(throw new IllegalArgumentException(
        s"graft-fed source needs option '$k' ($hint)"))
    val cat = req("catalog", "a name passed to Federation.registerCatalog")
    val table = req("table", "the remote table name")
    val cursor = req("cursor", "a monotone column")
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
    // same per-table hooks the catalog path attaches (loadTable): a hooked
    // table must behave identically through format("graft-fed")
    val hooks = spec.hooks.get(ref.parts.last)
    Resolved(ex, ref, cursor, parseStep(params), parseHorizon(params), hooks)
  }
}

/** Catalog metadata for one remote streaming read. */
final case class FedStreamTable(
    executor: SqlExecutor,
    ref: RemoteTableRef,
    cursorCol: String,
    cursorStep: Option[Long],
    cursorHorizon: Long = 0L,
    hooks: Option[graft.federation.sql.TableHooks] = None)
  extends Table with SupportsRead {

  override def name(): String = s"graft-fed:${executor.name}:$ref"

  override def schema(): StructType = executor.tableSchema(ref)

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        FedStreamScan(executor, ref, cursorCol, cursorStep, schema(),
          cursorHorizon, hooks)
    }
}

/** Metadata-only scan, the streaming sibling of
  * [[graft.federation.RemoteEngineCatalog]]'s batch placeholder: actual
  * reads never go through v2 partitions — [[FedStreamScanRule]] swaps the
  * per-batch scan relation for a range-filtered [[RemoteRelation]]. */
final case class FedStreamScan(
    executor: SqlExecutor,
    ref: RemoteTableRef,
    cursorCol: String,
    cursorStep: Option[Long],
    override val readSchema: StructType,
    cursorHorizon: Long = 0L,
    hooks: Option[graft.federation.sql.TableHooks] = None) extends Scan {

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new FedMicroBatchStream(SparkSession.active, executor, ref,
      cursorCol, cursorStep, cursorHorizon, hooks)

  override def description(): String =
    s"FedStreamScan [${executor.name}] $ref by $cursorCol"
}

/** One instance per running query; all progress state lives in the
  * engine's offset log — `latestOffset(start, limit)` receives the
  * restored offset every trigger, so the stream itself is stateless
  * across restarts (the exactly-once property, now structural). */
class FedMicroBatchStream(
    spark: SparkSession,
    val executor: SqlExecutor,
    val ref: RemoteTableRef,
    cursorCol: String,
    cursorStep: Option[Long],
    cursorHorizon: Long = 0L,
    hooks: Option[graft.federation.sql.TableHooks] = None)
    extends MicroBatchStream
    with SupportsTriggerAvailableNow with Logging {

  require(cursorHorizon >= 0, s"cursorHorizon must be >= 0, got $cursorHorizon")

  val schema: StructType = executor.tableSchema(ref)
  require(schema.fieldNames.contains(cursorCol),
    s"cursor column '$cursorCol' not in remote schema " +
      schema.fieldNames.toSeq)

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

  /** Catalyst literal of the cursor's type from its long offset form —
    * the internal representations line up exactly (micros / days / the
    * integral value itself). */
  private def litOf(v: Long): Literal = cursorType match {
    case LongType => Literal(v, LongType)
    case IntegerType => Literal(v.toInt, IntegerType)
    case ShortType => Literal(v.toShort, ShortType)
    case DateType => Literal(v.toInt, DateType)
    case TimestampType => Literal(v, TimestampType)
    case TimestampNTZType => Literal(v, TimestampNTZType)
    case other => throw new IllegalStateException(s"cursor type $other")
  }

  private def table =
    Federation.remoteDataFrame(spark, ref.toString, executor, hooks)

  /** One federated 1-row aggregate: executes on the remote engine, the
    * wire carries one value. Hooks apply to probes exactly as to batch
    * reads — a plan-rewritten (e.g. row-filtered) table must pace off ITS
    * extrema, not the raw table's. */
  private def probe(agg: org.apache.spark.sql.Column): Option[Long] = {
    val row = table.agg(agg.as("m")).collect().head
    if (row.isNullAt(0)) None else Some(toLong(row.get(0)))
  }

  /** Sentinel for "stream started on an empty remote table": no real
    * cursor can practically equal it, and [[rangePlan]] drops the lower
    * bound for it entirely. */
  private val EmptyBase = Long.MinValue

  /** Exclusive base offset one below `m`, guarded against underflow: a
    * cursor min at (or one above) Long.MinValue cannot be bounded from
    * below by any long — collapse to the sentinel, which drops the lower
    * bound entirely (reads everything up to the batch end; exactly right
    * at the type's floor, where nothing can precede the min). */
  private def baseBelow(m: Long): Long =
    if (m <= EmptyBase + 1) EmptyBase else m - 1L

  /** The readable high-water mark: remote MAX held back by the tie-safety
    * horizon (saturating — a horizon wider than the value range means
    * nothing is safely readable yet, the sentinel). */
  private def probeHigh(): Option[Long] =
    probe(max(col(cursorCol))).map { m =>
      if (cursorHorizon == 0L) m
      else if (m < EmptyBase + cursorHorizon) EmptyBase
      else m - cursorHorizon
    }

  override def initialOffset(): OffsetV2 =
    FedOffset(probe(min(col(cursorCol))).map(baseBelow).getOrElse(EmptyBase))

  override def deserializeOffset(json: String): OffsetV2 =
    FedOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def valueOf(o: OffsetV2): Long = o match {
    case FedOffset(v) => v
    case other => other.json().trim.toLong
  }

  /** Trigger.AvailableNow: freeze "available" at the remote MAX observed
    * when the trigger starts — the engine then runs PACED batches until
    * the offset reaches this bound and terminates, so a first-attach
    * backfill drains fully in bounded microbatches and stops, with rows
    * a concurrent writer keeps appending left for the next run. */
  @volatile private var availableNowBound: Option[Long] = None

  /** Freeze an EXPLICIT bound even when the table is empty at prepare
    * time (the sentinel: nothing available) — leaving None would let a
    * concurrent writer extend the run forever, and AvailableNow's whole
    * contract is self-termination. */
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(probeHigh().getOrElse(EmptyBase))

  /** The high-water mark for progress reporting: the frozen AvailableNow
    * bound when one is set; otherwise unknown (null per the contract —
    * a live probe per progress report would pay a wire roundtrip per
    * batch for a log line). */
  override def reportLatestOffset(): OffsetV2 =
    availableNowBound.map(FedOffset(_): OffsetV2).orNull

  /** Admission control: `start` is the engine-restored durable offset
    * (the pacing floor — never an in-memory guess), the returned offset
    * never moves below it (a remote max that moves BACKWARD — rows
    * deleted at the head — must not rewind the stream). */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = valueOf(start)
    probeHigh().map(r =>
        availableNowBound.fold(r)(math.min(r, _))) match {
      case None => start
      case Some(remote) =>
        val hi = cursorStep match {
          case Some(s) =>
            // paced backfill: advance at most `s` cursor units per batch
            // so a huge first read splits into bounded microbatches; on
            // the empty-start sentinel the pace bases off the remote MIN
            // (one more 1-row probe)
            val floor =
              if (base == EmptyBase)
                probe(min(col(cursorCol))).map(baseBelow).getOrElse(base)
              else base
            // saturating add: a timestamp cursor near Long.MaxValue
            // micros must not wrap negative
            val paced =
              if (floor > 0 && s > Long.MaxValue - floor) Long.MaxValue
              else floor + s
            math.min(remote, paced)
          case None => remote
        }
        FedOffset(math.max(base, hi))
    }
  }

  override def latestOffset(): OffsetV2 =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control form")

  /** The federated batch for one committed cursor range — the SAME leaf
    * and range shape every federated batch read uses, so pushdown /
    * split scans / runtime filters all apply. `isStreaming` rides the
    * leaf: stateful operators above must keep planning incrementally. */
  def rangePlan(output: Seq[AttributeReference], lo: Option[Long],
      hi: Long): LogicalPlan = {
    val cursor = output.find(_.name == cursorCol).getOrElse(
      throw new IllegalStateException(
        s"cursor '$cursorCol' missing from scan output ${output.map(_.name)}"))
    logInfo(s"graft-fed batch $ref $cursorCol in " +
      s"(${lo.filter(_ != EmptyBase).getOrElse("-inf")}, $hi]")
    val upper = LessThanOrEqual(cursor, litOf(hi))
    val pred = lo.filter(_ != EmptyBase)
      .map(l => And(GreaterThan(cursor, litOf(l)), upper))
      .getOrElse(upper)
    // hooks ride the leaf exactly as on batch reads of the same catalog
    // table; `stream = this` marks the physical scan stream-source-aware,
    // so progress reports meter its numOutputRows as numInputRows
    Filter(pred, RemoteRelation(ref, executor,
      output.map(_.asInstanceOf[AttributeReference]), hooks,
      isStreaming = true, stream = Some(this)))
  }

  override def planInputPartitions(start: OffsetV2,
      end: OffsetV2): Array[InputPartition] =
    throw new IllegalStateException(
      s"graft-fed stream $ref reached v2 partition planning — the " +
        "federation rules are not installed; call Federation.install " +
        "(or Federation.registerCatalog) before starting the query")

  override def createReaderFactory(): PartitionReaderFactory =
    throw new IllegalStateException(
      s"graft-fed stream $ref has no v2 reader — reads go through the " +
        "federation path (FedStreamScanRule)")

  override def commit(end: OffsetV2): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"FedMicroBatchStream[${executor.name}] $ref by $cursorCol"
}

case class FedOffset(value: Long) extends OffsetV2 {
  override def json: String = value.toString
}

/** Swaps each microbatch's streaming v2 scan relation for the federated
  * range fetch: the offsets the engine planned (WAL-ed before the batch
  * runs) become a cursor-range [[Filter]] over the standard
  * [[RemoteRelation]] leaf, which the downstream federation rules push
  * into the remote SQL — the streaming sibling of
  * [[graft.federation.CatalogRemoteTableRule]]. Installed with the other
  * federation rules; runs inside each microbatch's IncrementalExecution. */
object FedStreamScanRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case s: StreamingDataSourceV2ScanRelation
          if s.stream.isInstanceOf[FedMicroBatchStream] &&
            s.endOffset.isDefined =>
        val st = s.stream.asInstanceOf[FedMicroBatchStream]
        st.rangePlan(s.output,
          s.startOffset.map(o => o.json().trim.toLong),
          s.endOffset.get.json().trim.toLong)
    }
}
