package graft.federation.sql

import org.apache.spark.sql.types._

/** Execution-time remote schema-drift guard.
  *
  * Remote schemas are inferred ONCE at registration (reference
  * src/sql/table.rs:126-133 does the same); nothing re-validates them at
  * execution, so a table ALTERed between registration and query is the
  * failure mode federation users actually hit. The three drift shapes
  * behave differently at the wire:
  *
  *  - column ADDED on the remote: invisible — every fragment selects an
  *    explicit column list, never `*` (spec-pinned as benign);
  *  - column DROPPED/RENAMED: the fragment still names it, so the engine's
  *    own binder fails the query loudly (spec-pinned);
  *  - column RETYPED: the silent one. The wire decode is schema-directed
  *    by the REGISTERED types, and a numeric/boolean getter applied to
  *    text data yields 0/false instead of failing (probed: Jackson
  *    `asInt()` on non-numeric text is 0) — silent data corruption.
  *
  * This guard closes the retype hole: each executor asserts the cursor's
  * live result metadata against the expected schema before the first row
  * lands. The check is deliberately COARSE — engines legitimately widen
  * computed columns within a family (DuckDB SUM(INT)→HUGEINT where Spark
  * expects LongType; Derby AVG keeps the input type), untyped `NULL`
  * projections bind as INTEGER, and declared-schema reads intentionally
  * put struct/map/array/interval/timestamp types over engine text (the
  * boundary decode of garbage text fails loud on its own). So only the
  * provably-silent pair is an error: TEXT arriving where a NUMERIC or
  * BOOLEAN column is expected, plus any column-count mismatch (a
  * protocol violation regardless of types). Text-ward retypes
  * (INT→VARCHAR registered as text) decode as text — a lossless, visible
  * coercion, documented rather than flagged.
  */
object SchemaDrift {

  /** Coarse type family for drift comparison. */
  def family(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => "numeric"
    case StringType | _: CharType | _: VarcharType => "text"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case BinaryType => "binary"
    case _: ArrayType => "array"
    case _: StructType => "struct"
    case _: MapType => "map"
    case CalendarIntervalType | _: YearMonthIntervalType |
         _: DayTimeIntervalType => "interval"
    case _ => "other"
  }

  /** The silent-corruption pair: text data landing in a numeric/boolean
    * slot decodes as 0/false without any error surfacing. */
  private def corrupting(expected: String, live: String): Boolean =
    live == "text" && (expected == "numeric" || expected == "boolean")

  /** Assert live cursor metadata against the expected fragment schema.
    * `live` carries, per column: a display label (engine type name) and
    * the coarse family when the engine type is understood (`None` skips
    * the column — the guard is best-effort, never a new failure mode for
    * exotic types that already decoded fine). */
  def check(expected: Seq[StructField],
      live: Seq[(String, Option[String])],
      executorName: String, sql: String): Unit = {
    // a fully-pruned fragment (`df.count()` shapes) unparses as the
    // zero-column convention `SELECT 1 …` — the single constant column
    // is by construction, not drift (SqlUnparser's emptyOutput contract)
    if (expected.isEmpty) return
    if (live.length != expected.length)
      throw new IllegalStateException(
        s"remote schema drift [$executorName]: the engine answered with " +
          s"${live.length} columns where ${expected.length} were expected " +
          s"— the remote table was likely ALTERed after registration; " +
          s"re-register it. SQL: ${sql.take(500)}")
    var i = 0
    while (i < expected.length) {
      val exp = expected(i)
      val (label, fam) = live(i)
      fam.foreach { lf =>
        if (corrupting(family(exp.dataType), lf))
          throw new IllegalStateException(
            s"remote schema drift [$executorName]: column ${i + 1} " +
              s"('${exp.name}') arrived as $label but is registered as " +
              s"${exp.dataType.sql} — text data in a " +
              s"${family(exp.dataType)} slot decodes silently as 0/false. " +
              s"The remote table was likely ALTERed after registration; " +
              s"re-register it. SQL: ${sql.take(500)}")
      }
      i += 1
    }
  }

  /** java.sql.Types → coarse family (JDBC executors). Unknown codes map
    * to None (column skipped). */
  def jdbcFamily(t: Int): Option[String] = {
    import java.sql.Types._
    t match {
      case TINYINT | SMALLINT | INTEGER | BIGINT | REAL | FLOAT | DOUBLE |
           DECIMAL | NUMERIC => Some("numeric")
      case CHAR | VARCHAR | LONGVARCHAR | CLOB | NCHAR | NVARCHAR |
           LONGNVARCHAR => Some("text")
      case BOOLEAN | BIT => Some("boolean")
      case DATE => Some("date")
      case TIMESTAMP | TIMESTAMP_WITH_TIMEZONE => Some("timestamp")
      case BINARY | VARBINARY | LONGVARBINARY | BLOB => Some("binary")
      case ARRAY => Some("array")
      case _ => None
    }
  }
}
