package graft.streaming

import graft.cdc.{ChangeLoader, Cursor, CursorStore}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** SURVEY §2.1 #8 — the reference's sink loop (`sinker/sinker.go:96-190` +
  * `db/flush.go`) as a Structured Streaming `foreachBatch` sink.
  *
  * Per micro-batch (the flush unit — the reference flushes every N blocks;
  * here the trigger interval plays that role):
  *
  *   1. collapse the batch's changes per pk ([[ChangeLoader.collapse]] — the
  *      reference's in-batch op merge),
  *   2. read the prior snapshot, apply the collapsed ops
  *      ([[ChangeLoader.applyBatch]]), write the next snapshot version
  *      (write-once per batchId → replays overwrite the same path:
  *      idempotent),
  *   3. commit the cursor keyed by batchId ([[CursorStore.commit]] is a
  *      no-op on replay).
  *
  * Steps 2+3 give the reference's "ops + cursor in one transaction"
  * exactly-once guarantee under micro-batch replay.
  */
final class ChangeStreamSink(
    baseDir: String,
    moduleHash: String,
    fieldCols: Seq[String]
) {

  private def snapDir(batchId: Long) = s"$baseDir/snapshot_v$batchId"

  /** The newest committed snapshot (resolved through the cursor store). */
  def latestSnapshot(spark: SparkSession): Option[DataFrame] = {
    val store = new CursorStore(s"$baseDir/cursor", spark)
    store.readWithBatch(moduleHash).map { case (_, bid) =>
      spark.read.parquet(snapDir(bid))
    }
  }

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val t0 = System.currentTimeMillis()
      val spark = batch.sparkSession
      val store = new CursorStore(s"$baseDir/cursor", spark)
      val collapsed = ChangeLoader.collapse(batch, fieldCols)
      val prior = store.readWithBatch(moduleHash) match {
        case Some((_, bid)) => spark.read.parquet(snapDir(bid))
        case None =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            collapsed.drop("last_block", "deleted", "revived").schema)
      }
      val next = ChangeLoader.applyBatch(prior, collapsed, fieldCols)
      val tFlush = System.currentTimeMillis()
      next.write.mode(SaveMode.Overwrite).parquet(snapDir(batchId))
      val head = batch
        .agg(max("block"), count(lit(1)), countDistinct(col("pk"))).collect()(0)
      val maxBlock = if (head.isNullAt(0)) -1L else head.getLong(0)
      store.commit(Cursor(moduleHash, s"cursor:$maxBlock", maxBlock,
        s"block:$maxBlock"), batchId)
      new SinkStats(s"$baseDir/stats", spark).record(FlushStat(
        moduleHash, batchId, maxBlock, head.getLong(1), head.getLong(2),
        flushMillis = System.currentTimeMillis() - tFlush,
        wallMillis = math.max(1, System.currentTimeMillis() - t0)))
    }
  }

  /** Roll the sink back to an earlier committed batch (a chain-reorg /
    * BlockUndoSignal response). The reference refuses undo signals outright
    * (`sinker/sinker.go:176` errors on any undo); here versioned snapshots
    * make it a cursor re-commit — the snapshot written by `toBatchId`
    * becomes current again and later versions are ignored.
    */
  def rollbackTo(spark: SparkSession, toBatchId: Long, newBatchId: Long): Unit = {
    val store = new CursorStore(s"$baseDir/cursor", spark)
    val snap = spark.read.parquet(snapDir(toBatchId))
    // re-commit the old snapshot under the new batch id so the cursor log
    // stays append-only and resolves (by commit order) to the rolled-back
    // state
    snap.write.mode(SaveMode.Overwrite).parquet(snapDir(newBatchId))
    store.commit(Cursor(moduleHash, s"cursor:rollback:$toBatchId", toBatchId,
      s"rollback:$toBatchId"), newBatchId)
  }

  /** Attach to a streaming changes frame. */
  def start(changes: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .start()
}
