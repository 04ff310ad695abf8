package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle-comparable aggregation.
  *
  * Floating-point SUM is order-dependent, and Spark's partial aggregation
  * order differs run-to-run and engine-to-engine. For hash-exact comparison
  * against the DuckDB oracle we do all additive arithmetic in decimal
  * (associative, exact), then cast once to double at the end. The decimal
  * precisions are chosen tight enough that Spark never hits the 38-digit
  * cap (where `allowPrecisionLoss` could round) at 100 TB scale:
  * sum of ~1e12 rows × 1e5 values fits in decimal(38,2)'s 36 integer digits.
  */
object Exact {
  /** Money / quantity columns (2 decimal places in the data). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Rate columns like discount/tax (values in [0, 1.1]). */
  def rate(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact sum of a 2-dp double column, returned as double. */
  def sumExact(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact revenue term: extendedprice * (1 - discount). */
  def discPrice(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - rate(discount))

  /** Exact charge term: extendedprice * (1 - discount) * (1 + tax).
    * The rate product is cast to decimal(9,4) (exact: both rates have 2 dp)
    * to keep the final multiply well inside 38 digits.
    */
  def charge(price: Column, discount: Column, tax: Column): Column =
    dec2(price) * ((lit(1) - rate(discount)) * (lit(1) + rate(tax)))
      .cast(DecimalType(9, 4))
}
