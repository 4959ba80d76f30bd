package graft

import org.apache.spark.sql.types._

/** Whole-bank output-boundary audit (the permanent form of the r6
  * decimal incident, as r4's array ban is of the array incident).
  *
  * The driver's comparator reads the Spark result parquet DIRECTLY
  * (pandas/pyarrow) while the oracle side flows through DuckDB — cell
  * classes whose rendering differs between those readers hash-diverge
  * even when the values are identical. Two classes are known:
  *
  *   - array/map/struct cells (r4): pandas `sort_values` crashes or
  *     compares by object identity — emit concat_ws/scalar columns.
  *   - decimal128 cells (r6): rendered with trailing-zero/scale
  *     differences — aggregate exact, then cast to double at the output
  *     boundary (SURVEY §5).
  *
  * This spec pins EVERY query's result schema to the driver-comparable
  * scalar types, so the next such class can only enter the bank by
  * editing this file, not by slipping past the local gate.
  */
class OutputSchemaAuditSpec extends SparkSpecBase {

  private val comparable: PartialFunction[DataType, Unit] = {
    case _: StringType | _: LongType | _: IntegerType | _: DoubleType |
        _: FloatType | _: BooleanType | _: DateType | _: TimestampType |
        _: BinaryType | _: ShortType | _: ByteType =>
  }

  test("every query's output schema is driver-comparable scalars only") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sfDir).schema.fields.collect {
          case f if !comparable.isDefinedAt(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(bad.isEmpty,
      s"driver-incomparable output columns (cast decimals to double, " +
        s"flatten arrays — SURVEY §5):\n  ${bad.mkString("\n  ")}")
  }
}
