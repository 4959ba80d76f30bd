package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import java.io.File

/** Schema introspection over a parquet table directory — re-expresses the
  * reference's sink-side catalog probes (`/root/reference/db/operations.go:
  * 220-277`: table list, column types via a LIMIT-0 query, primary keys
  * ordered by position).
  *
  * The lake-native equivalents: directory listing, parquet footer schema
  * (no data read), and a pk convention (`<prefix>_<table>key` / declared
  * map) since parquet carries no key metadata.
  */
final class Catalog(dir: String, spark: SparkSession,
    declaredPks: Map[String, Seq[String]] = Catalog.defaultPks) {

  /** All table names (every `<name>.parquet` in the directory). */
  def tables(): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted.toSeq

  /** Column names and types from the parquet footer (no rows read — the
    * LIMIT-0 probe equivalent). Routed through [[graft.sources.Tables]] so
    * per-table quirks (events' TIMESTAMP(NANOS) column) resolve the same
    * way they do for queries.
    */
  def schemaOf(table: String): StructType =
    graft.sources.Tables(spark, dir, table).schema

  def columns(table: String): Seq[(String, String)] =
    schemaOf(table).fields.map(f => f.name -> f.dataType.simpleString).toSeq

  /** Primary key columns in declared order; falls back to the first column
    * (the TPC-H-ish convention in the test lake).
    */
  def primaryKeys(table: String): Seq[String] =
    declaredPks.getOrElse(table, schemaOf(table).fields.headOption.map(_.name).toSeq)

  def hasTable(table: String): Boolean = tables().contains(table)
}

object Catalog {
  val defaultPks: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "events"     -> Seq("event_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )
}
