package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Multi-table change routing — the reference's core loop shape.
  *
  * The reference dispatches each `TableChange` by `change.Table` across an
  * arbitrary set of target tables, each with its own schema and primary key
  * (`/root/reference/sinker/sinker.go:136-174` dispatch,
  * `db/ops.go:11-122` per-table pending-op maps). The wire model here is the
  * flattened protobuf shape
  * (`pb/substreams/sink/database/v1/database.pb.go` TableChange):
  *
  *   block BIGINT, [ordinal BIGINT,] table STRING, pk STRING, op STRING,
  *   fields MAP<STRING, STRING>
  *
  * where an absent map key means "field not in this change" (the merge
  * ignores it — `ops.go mergeData`), and every present value is a string
  * the TARGET table's schema types ([[TypeNormalizer]], the reference's
  * `normalizeValueType`).
  *
  * Scale shape: routing is a filter per table over one (cacheable) batch —
  * each collapse then shuffles only ITS table's changes on pk. No
  * driver-side state; table count is metadata-sized.
  */
object MultiTable {

  /** The field columns a routed table carries (its schema minus wire
    * columns).
    */
  def fieldCols(schema: StructType): Seq[String] = schema.fieldNames.toSeq

  /** One table's changes, widened from the fields map to typed columns:
    * `element_at` yields null for absent keys (= "not in change"), then
    * [[TypeNormalizer.normalizeAll]] applies the target schema.
    */
  def forTable(changes: DataFrame, table: String, schema: StructType): DataFrame = {
    val ord: Seq[Column] =
      if (changes.columns.contains("ordinal")) Seq(col("ordinal")) else Seq.empty
    val wide = changes
      .filter(col("table") === table)
      .select(Seq(col("block")) ++ ord ++ Seq(col("pk"), col("op")) ++
        fieldCols(schema).map(f => element_at(col("fields"), f).as(f)): _*)
    TypeNormalizer.normalizeAll(wide, schema)
  }

  /** Collapse a wire batch per table (reference in-batch op merge, run once
    * per target table). `schemas` maps table name → that table's FIELD
    * schema (pk excluded; it rides the wire `pk` column).
    */
  def collapseAll(changes: DataFrame,
      schemas: Map[String, StructType]): Map[String, DataFrame] =
    schemas.map { case (t, sch) =>
      t -> ChangeLoader.collapse(forTable(changes, t, sch), fieldCols(sch))
    }

  /** Apply each table's collapsed batch to its prior snapshot — the flush
    * fan-out of `db/flush.go:28-49`, one [[ChangeLoader.applyBatch]] per
    * table.
    */
  def applyAll(snapshots: Map[String, DataFrame], collapsed: Map[String, DataFrame],
      schemas: Map[String, StructType]): Map[String, DataFrame] =
    schemas.map { case (t, sch) =>
      t -> ChangeLoader.applyBatch(snapshots(t), collapsed(t), fieldCols(sch))
    }
}
