package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String-valued change fields → typed columns.
  *
  * Re-expresses the reference's `normalizeValueType`
  * (`/root/reference/db/operations.go:143-216`): every field arrives as a
  * string; the target table's schema decides the type. Timestamps accept
  * either an integer (unix epoch seconds) or a parseable timestamp string —
  * the reference's `integerRegex` branch. Unknown types pass through
  * unchanged (the reference forwards them verbatim to the database).
  *
  * Pure `Column` expressions → whole-stage-codegen'd, zero shuffle.
  */
object TypeNormalizer {

  private val epochPattern = "^\\d+$"

  def normalize(c: Column, target: DataType): Column = target match {
    case StringType    => c
    case BooleanType   => c.cast(BooleanType)
    case TimestampType =>
      when(c.rlike(epochPattern), timestamp_seconds(c.cast(LongType)))
        .otherwise(c.cast(TimestampType))
    case DateType      => c.cast(DateType)
    case t @ (_: NumericType) => c.cast(t)
    case _             => c // reference: pass unknown types through unmodified
  }

  /** Normalize every string field of `df` named in `schema` to its target
    * type; columns absent from the schema are preserved as-is.
    */
  def normalizeAll(df: DataFrame, schema: StructType): DataFrame = {
    val bySchema = schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.columns.map { c =>
      bySchema.get(c) match {
        case Some(t) => normalize(col(c), t).as(c)
        case None    => col(c)
      }
    }.toIndexedSeq: _*)
  }
}
