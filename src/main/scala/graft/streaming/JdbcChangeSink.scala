package graft.streaming

import graft.cdc.{ChangeLoader, Cursor, JdbcFlush}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming → external JDBC database, one transaction per
  * micro-batch — the reference's actual sink wiring
  * (`sinker/sinker.go` loop + `db/flush.go` transactional flush), with the
  * micro-batch as the flush interval.
  *
  * Per batch: collapse to pending ops ([[ChangeLoader.pendingOps]] — the
  * delta, never the snapshot), generate dialect statements, execute them
  * plus the cursor advance in ONE JDBC transaction ([[JdbcFlush.flush]]).
  * Replays are detected inside the transaction (stored batch_id) and
  * skipped: exactly-once into the target database.
  */
final class JdbcChangeSink(
    url: String,
    table: String,
    pkCol: String,
    moduleHash: String,
    fieldCols: Seq[String],
    typedInfo: Option[graft.cdc.JdbcTableInfo] = None,
    /** When set (typed sinks only), maintain an on-target rollup table in
      * the same flush transaction ([[graft.cdc.JdbcMv]]) — the streaming
      * twin of [[ChangeStreamSink]]'s lake-side `mv`.
      */
    mv: Option[graft.cdc.JdbcMv.MvSpec] = None
) {
  require(mv.isEmpty || typedInfo.nonEmpty,
    "on-target rollup maintenance needs the introspected (typed) sink")

  def processBatch(batch: DataFrame, batchId: Long): Boolean = {
    if (batch.isEmpty) return false
    val rows = JdbcFlush.collectPending(
      ChangeLoader.pendingOps(batch, fieldCols), fieldCols)
    val mx = batch.agg(max("block")).collect()(0).getLong(0)
    val cur = Cursor(moduleHash, s"cursor:$mx", mx, s"block:$mx")
    val t0 = System.nanoTime()
    val conn = JdbcFlush.connect(url)
    val flushed =
      try (typedInfo, mv) match {
        case (Some(info), Some(spec)) =>
          graft.cdc.JdbcMv.flushTypedWithMv(conn, info, rows, cur, batchId, spec)
        case (Some(info), None) => JdbcFlush.flushTyped(conn, info, rows, cur, batchId)
        case _ => JdbcFlush.flush(conn, table, pkCol, rows, cur, batchId)
      }
      finally conn.close()
    if (flushed)
      LiveSinkStats.of(moduleHash).recordFlush(rows.size.toLong, mx,
        System.nanoTime() - t0)
    flushed
  }

  def start(changes: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, id: Long) => { processBatch(b, id); () })
      .start()
}

object JdbcChangeSink {

  /** Build a sink whose pk and field columns come from the LIVE target
    * schema instead of hand-passed lists — the reference's `LoadTables`
    * flow (`db/db.go:82-130`: introspect columns+pk, default pk `id`),
    * with statements rendered through the introspected column types
    * ([[graft.cdc.JdbcFlush.typedStatements]]).
    */
  def introspected(url: String, table: String, moduleHash: String,
      mv: Option[graft.cdc.JdbcMv.MvSpec] = None): JdbcChangeSink = {
    val conn = JdbcFlush.connect(url)
    val info =
      try graft.cdc.JdbcCatalog.tableInfo(conn, table)
      finally conn.close()
    new JdbcChangeSink(url, table, info.pkCol, moduleHash, info.fieldCols,
      Some(info), mv)
  }
}
