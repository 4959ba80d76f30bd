package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented SURVEY §2 operator, with oracle when SQL-expressible. */
  def allDefs: Map[String, OpDef] =
    ops.Relational.defs ++ ops.AnalyticsR7.defs ++ ops.AnalyticsR8.defs ++
      ops.AnalyticsR8b.defs ++ ops.AnalyticsR8c.defs ++
      ops.AnalyticsR8d.defs ++ ops.AnalyticsR8e.defs ++
      ops.AnalyticsR8f.defs ++ ops.AnalyticsR8g.defs ++
      ops.AnalyticsR8h.defs ++ ops.AnalyticsR8i.defs ++
      ops.AnalyticsR8k.defs ++ ops.AnalyticsR8l.defs ++
      ops.RelationalR8.defs ++ ops.RelationalR8b.defs ++
      ops.RelationalR8c.defs ++
      ops.CdcQueries.defs ++
      ops.StreamQueries.defs ++ text.TextOps.defs ++ dedup.Dedup.defs ++
      ann.Ann.defs ++ multimodal.MediaColumns.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, OpDef(_, Some(sql))) => k -> sql }
}
