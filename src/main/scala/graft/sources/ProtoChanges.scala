package graft.sources

import graft.cdc.{Op, ProtoWire}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Wire-format ingestion adapter: a per-block `DatabaseChanges` protobuf
  * payload column → wire-model change rows.
  *
  * The reference decodes each `BlockScopedData`'s output into
  * `DatabaseChanges` and dispatches its `TableChanges`
  * (`/root/reference/sinker/sinker.go:96-140`); the gRPC transport is out
  * of scope (non-Spark), so the Spark-native seam is a DataFrame of
  * `(block BIGINT, payload BINARY)` — however those bytes arrived (Kafka,
  * files, a receiver) — flat-mapped through the hand-rolled
  * [[graft.cdc.ProtoWire]] decoder into exactly the shape
  * [[graft.cdc.MultiTable]] routes.
  *
  * Scale: decode is a narrow per-row flatMap (no shuffle); each payload
  * decodes once on whichever executor holds the block.
  */
object ProtoChanges {

  /** One decoded change, [[graft.cdc.MultiTable]]'s wire model. */
  final case class WireChange(
      block: Long,
      ordinal: Long,
      table: String,
      pk: String,
      op: String,
      fields: Map[String, String]
  )

  /** CREATE→INSERT per the reference's op dispatch; UNSET/unknown is kept
    * as a literal so [[graft.cdc.ChangeLoader.violations]]-style checks can
    * surface it instead of killing the job mid-scan (the reference aborts —
    * `sinker.go` errors on an unset op).
    */
  def opName(code: Int): String = code match {
    case ProtoWire.OpCode.Create => Op.Insert
    case ProtoWire.OpCode.Update => Op.Update
    case ProtoWire.OpCode.Delete => Op.Delete
    case _                       => "UNSET"
  }

  /** Decode `(block BIGINT, payload BINARY)` rows into wire-model changes
    * (`block, ordinal, table, pk, op, fields`). Field maps carry
    * `new_value` per name — last occurrence wins on duplicate names, the
    * reference's map-write order.
    */
  def decode(blocks: DataFrame): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val ds: Dataset[WireChange] = blocks
      .toDF("block", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (block, payload) =>
        ProtoWire.decodeDatabaseChanges(payload).map { tc =>
          WireChange(block, tc.ordinal, tc.table, tc.pk, opName(tc.operation),
            tc.fields.map(f => f.name -> f.newValue).toMap)
        }
      }
    ds.toDF()
  }
}
