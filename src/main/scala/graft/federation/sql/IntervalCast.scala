package graft.federation.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Strict calendar-interval coercions — the Spark analog of the reference's
  * intervals_cast kernels (src/schema_cast/intervals_cast.rs:11-75):
  * a remote engine hands back a mixed month-day-time interval, and the
  * locally-registered schema wants one of Spark's ANSI interval types.
  * Spark's own `Cast` refuses these conversions, and a permissive cast
  * would silently drop components; the reference instead validates that
  * the discarded components are zero and fails loudly — mirrored here.
  */
object IntervalCast {

  /** CalendarInterval → year-month interval. Errors when day/time
    * components are present (intervals_cast.rs:11-44). */
  case class CalendarToYearMonth(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = YearMonthIntervalType()
    override def prettyName: String = "calendar_to_year_month"

    override def nullSafeEval(input: Any): Any = {
      val ci = input.asInstanceOf[CalendarInterval]
      if (ci.days != 0 || ci.microseconds != 0)
        throw new IllegalArgumentException(
          s"cannot cast interval '$ci' to YEAR TO MONTH: " +
            "day/time components present")
      java.lang.Integer.valueOf(ci.months)
    }
    override protected def withNewChildInternal(c: Expression): CalendarToYearMonth =
      copy(child = c)
  }

  /** CalendarInterval → day-time interval. Errors when a month component
    * is present; sub-millisecond precision is truncated, matching the
    * reference's ns→ms truncation into Arrow's millisecond DayTime
    * (intervals_cast.rs:47-75). */
  case class CalendarToDayTime(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DayTimeIntervalType()
    override def prettyName: String = "calendar_to_day_time"

    private val MicrosPerDay = 24L * 60 * 60 * 1000 * 1000

    override def nullSafeEval(input: Any): Any = {
      val ci = input.asInstanceOf[CalendarInterval]
      if (ci.months != 0)
        throw new IllegalArgumentException(
          s"cannot cast interval '$ci' to DAY TO SECOND: month component present")
      val truncatedMs = (ci.microseconds / 1000L) * 1000L
      java.lang.Long.valueOf(ci.days * MicrosPerDay + truncatedMs)
    }
    override protected def withNewChildInternal(c: Expression): CalendarToDayTime =
      copy(child = c)
  }

  import org.apache.spark.sql.GraftShims.{column, expression}

  def toYearMonth(c: Column): Column = column(CalendarToYearMonth(expression(c)))
  def toDayTime(c: Column): Column = column(CalendarToDayTime(expression(c)))
}
