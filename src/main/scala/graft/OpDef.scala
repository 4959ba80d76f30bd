package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One SURVEY §2 inventory operator: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query used
  * by the driver's correctness gate.
  */
final case class OpDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object OpDef {
  def apply(oracleSql: String)(fn: (SparkSession, String) => DataFrame): OpDef =
    OpDef(fn, Some(oracleSql))

  def rowsOnly(fn: (SparkSession, String) => DataFrame): OpDef = OpDef(fn, None)
}
