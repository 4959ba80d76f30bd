package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic CDC change feed derived from the driver's `events` table.
  *
  * Models the reference's input (a per-block stream of table changes —
  * `/root/reference/pb/.../database.pb.go` TableChange): `block` is the
  * monotonically increasing block number, `pk` the changed row's key, `op`
  * one of INSERT/UPDATE/DELETE, and the field columns are nullable "field
  * present in this change?" values (`ops.go mergeData` merges them).
  *
  * Derivation rule (mirrored 1:1 in the oracle SQL CTE `changesSql`):
  *   - op: error→DELETE, signup→INSERT, else UPDATE
  *   - amount: always set (events.value)
  *   - kval:   set only on purchase/click (props JSON "k")
  *   - note:   always set (the event type)
  */
object Changes {

  def apply(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables(spark, dir, "events").select(
      col("event_id").as("block"),
      col("user_id").as("pk"),
      when(col("event_type") === "error", "DELETE")
        .when(col("event_type") === "signup", "INSERT")
        .otherwise("UPDATE")
        .as("op"),
      col("value").as("amount"),
      when(col("event_type").isin("purchase", "click"), k).as("kval"),
      col("event_type").as("note")
    )
  }

  /** Deterministic MULTI-table wire feed (the reference's actual input
    * shape — `DatabaseChanges` carries changes for many tables per block):
    *
    *   - table `accounts`  (pk = user_id): op per the single-table rule;
    *     field `amount` in every change, `note` only when the event is not
    *     a view (exercises per-FIELD merge — `ops.go mergeData` skips
    *     absent fields).
    *   - table `categories` (pk = event_type — a STRING pk): always UPDATE;
    *     `amount` = value, `note` = the acting user id.
    *
    * Fields ride as MAP<STRING,STRING> with absent keys = "not in change",
    * exactly the flattened protobuf TableChange.
    */
  def multiTable(spark: SparkSession, dir: String): DataFrame = {
    val amountS = col("value").cast(StringType)
    // ONE scan of events: each event explodes into its two tables' wire
    // rows (a union of two projections would scan the source twice — at
    // 100 TB the block stream is read once, exactly like the reference
    // decoding one DatabaseChanges payload into many TableChanges).
    val accounts = struct(
      lit("accounts").as("table"),
      col("user_id").cast(StringType).as("pk"),
      when(col("event_type") === "error", "DELETE")
        .when(col("event_type") === "signup", "INSERT")
        .otherwise("UPDATE").as("op"),
      when(col("event_type") =!= "view",
        map(lit("amount"), amountS, lit("note"), col("event_type")))
        .otherwise(map(lit("amount"), amountS)).as("fields"))
    val categories = struct(
      lit("categories").as("table"),
      col("event_type").as("pk"),
      lit("UPDATE").as("op"),
      map(lit("amount"), amountS,
        lit("note"), col("user_id").cast(StringType)).as("fields"))
    Tables(spark, dir, "events")
      .select(col("event_id").as("block"),
        explode(array(accounts, categories)).as("c"))
      .select(col("block"), col("c.table").as("table"), col("c.pk").as("pk"),
        col("c.op").as("op"), col("c.fields").as("fields"))
  }

  /** The per-table field schemas of the [[multiTable]] feed (what the sink's
    * catalog would introspect from the target tables).
    */
  val multiTableSchemas: Map[String, StructType] = Map(
    "accounts" -> StructType(Seq(
      StructField("amount", DoubleType), StructField("note", StringType))),
    "categories" -> StructType(Seq(
      StructField("amount", DoubleType), StructField("note", StringType)))
  )

  /** The same derivation as a DuckDB CTE body (prepend `WITH ch AS (...)`). */
  val changesSql: String =
    """SELECT event_id AS block, user_id AS pk,
      |  CASE WHEN event_type = 'error' THEN 'DELETE'
      |       WHEN event_type = 'signup' THEN 'INSERT'
      |       ELSE 'UPDATE' END AS op,
      |  value AS amount,
      |  CASE WHEN event_type IN ('purchase', 'click')
      |       THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS kval,
      |  event_type AS note
      |FROM events""".stripMargin
}
