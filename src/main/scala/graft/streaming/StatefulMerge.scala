package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change-row as carried on the stream (the [[graft.sources.Changes]]
  * schema, typed).
  */
final case class ChangeRow(
    block: Long,
    pk: Long,
    op: String,
    amount: Option[Double],
    kval: Option[Long],
    note: Option[String]
)

/** The live merged state of one pk (reference `db/ops.go` pending-op map
  * entry) and the emitted snapshot row.
  */
final case class PkState(
    pk: Long,
    lastBlock: Long,
    deleted: Boolean,
    amount: Option[Double],
    kval: Option[Long],
    note: Option[String]
)

/** SURVEY §2.1 #9 — the reference's in-memory per-pk op buffer as a
  * Structured Streaming state machine.
  *
  * `flatMapGroupsWithState` keys state by pk exactly as `db/ops.go` keys its
  * map by primary key; each micro-batch folds that pk's new changes (in
  * block order) into the state with the same merge rules (UPDATE merges
  * per-field last-writer-wins, DELETE tombstones, INSERT/UPDATE after
  * DELETE revives). State lives in the state store (RocksDB at scale),
  * partitioned by pk — never on the driver.
  */
object StatefulMerge {

  def mergeOne(st: PkState, c: ChangeRow): PkState =
    if (c.op == "DELETE")
      PkState(c.pk, c.block, deleted = true, None, None, None)
    else
      PkState(
        pk = c.pk,
        lastBlock = c.block,
        deleted = false,
        amount = c.amount.orElse(if (st.deleted) None else st.amount),
        kval = c.kval.orElse(if (st.deleted) None else st.kval),
        note = c.note.orElse(if (st.deleted) None else st.note)
      )

  val empty: PkState = PkState(-1L, -1L, deleted = false, None, None, None)

  def updateGroup(pk: Long, rows: Iterator[ChangeRow],
      state: GroupState[PkState]): Iterator[PkState] = {
    val prior = state.getOption.getOrElse(empty.copy(pk = pk))
    val next = rows.toSeq.sortBy(_.block).foldLeft(prior)(mergeOne)
    state.update(next)
    Iterator.single(next)
  }

  /** changes stream → stream of current per-pk snapshot rows. */
  def apply(changes: Dataset[ChangeRow])(implicit spark: SparkSession): Dataset[PkState] = {
    import spark.implicits._
    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateGroup)
  }
}
