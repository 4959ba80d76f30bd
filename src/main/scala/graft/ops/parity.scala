package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine (Spark vs DuckDB oracle) numeric-parity helpers — SURVEY §5.
  *
  * Doubles summed in different orders differ in the last bits, so every
  * money/quantity aggregate goes through an exact decimal sum and is cast
  * back to double at the end (the magnitudes involved fit in 2^53, so the
  * decimal→double conversion is exact and bit-identical across engines).
  */
object parity {

  /** Exact sum of a 2-decimal double column, returned as double. */
  def sumDec2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a 4-decimal product (e.g. price * (1-discount)). */
  def sumDec4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Portable 60-bit hash: first 15 hex chars of md5, as a bigint.
    * md5 hex strings are identical across engines; 15 hex chars keep the
    * value positive in a signed 64-bit integer.
    */
  def md5Long(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB spelling of [[md5Long]]. */
  def md5LongSql(expr: String): String = s"('0x'||substr(md5($expr),1,15))::BIGINT"

  /** Exact integer FLOOR division, matching DuckDB's `//` on negatives too.
    * Spark's `div` (and `/` + cast) truncate toward zero, so `-1 div 7 = 0`
    * while DuckDB's `-1 // 7 = -1` — divergent exactly when the dividend is
    * negative (pre-1970 timestamps, negative json k). `x - pmod(x, n)` is
    * exactly divisible by n and pmod is non-negative for a positive modulus,
    * so the quotient is the true floor; the double intermediate is exact for
    * |x| < 2^53 (day numbers, micros gaps, json k all qualify).
    */
  def floorDiv(c: Column, n: Long): Column =
    ((c.cast(LongType) - pmod(c.cast(LongType), lit(n))) / n).cast(LongType)
}
