package graft.cdc

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A stored stream cursor (reference `db/cursor.go` cursors table row). */
final case class Cursor(
    moduleHash: String,
    cursor: String,
    blockNum: Long,
    blockId: String
)

/** How to react when no cursor exists for the module hash but cursors exist
  * for OTHER hashes (the reference's `--on-module-hash-mistmatch`,
  * `sinker/sinker.go` + `db/cursor.go:95-137`).
  */
object MismatchMode {
  val Error = "error"
  val Warn = "warn"
  val Ignore = "ignore"
}

/** Parquet-backed cursor store with idempotent, batch-scoped commits.
  *
  * Re-expresses the reference's cursor table (`db/cursor.go:27-137`): one
  * logical row per output-module hash, atomically advanced with each flush.
  * Storage is an append-only parquet log under `path`; the current cursor is
  * the row with the highest (batchId, blockNum) per module — append + resolve
  * -on-read is the lake-native equivalent of the reference's UPDATE-in-txn,
  * and replaying a Structured Streaming batch (same batchId) is a no-op on
  * resolve, giving exactly-once cursor semantics under retries.
  *
  * The log is metadata (one tiny row per flush); [[compact]] bounds its
  * growth at production flush rates, and the admin surface
  * ([[allCursors]]/[[delete]]/[[deleteAll]]) mirrors the reference's
  * `GetAllCursors`/`DeleteCursor`/`DeleteAllCursors`
  * (`db/cursor.go:26-46,129-143`).
  */
final class CursorStore(path: String, spark: SparkSession) {

  import spark.implicits._

  private def log() =
    try Some(spark.read.parquet(path)) catch { case _: Throwable => None }

  /** Current cursor for the module hash, exact match only. */
  def read(moduleHash: String): Option[Cursor] = readWithBatch(moduleHash).map(_._1)

  /** Current cursor plus the micro-batch id that committed it. Resolution
    * is by commit order (batchId), not block height — a rollback commit
    * legitimately moves the block number backwards.
    */
  def readWithBatch(moduleHash: String): Option[(Cursor, Long)] =
    log().flatMap { df =>
      df.filter(col("moduleHash") === moduleHash)
        .orderBy(col("batchId").desc, col("blockNum").desc)
        .limit(1)
        .as[(String, String, Long, String, Long)]
        .collect()
        .headOption
        .map { case (m, c, b, id, bid) => (Cursor(m, c, b, id), bid) }
    }

  /** Newest cursor committed STRICTLY BEFORE `batchId`. The crash-replay-
    * safe prior resolution for a multi-step flush: a replayed batch whose
    * per-table commits partially landed must base itself on the PREVIOUS
    * batch's state, never on its own half-written one.
    */
  def readBatchBefore(moduleHash: String, batchId: Long): Option[(Cursor, Long)] =
    log().flatMap { df =>
      df.filter(col("moduleHash") === moduleHash && col("batchId") < batchId)
        .orderBy(col("batchId").desc, col("blockNum").desc)
        .limit(1)
        .as[(String, String, Long, String, Long)]
        .collect()
        .headOption
        .map { case (m, c, b, id, bid) => (Cursor(m, c, b, id), bid) }
    }

  /** The cursor row a specific micro-batch committed (rollback resolution). */
  def cursorAt(moduleHash: String, batchId: Long): Option[Cursor] =
    log().flatMap { df =>
      df.filter(col("moduleHash") === moduleHash && col("batchId") === batchId)
        .as[(String, String, Long, String, Long)]
        .collect()
        .headOption
        .map { case (m, c, b, id, _) => Cursor(m, c, b, id) }
    }

  /** Has this (moduleHash, batchId) already committed? The sink's replay
    * no-op check: a committed batch's snapshot + cursor are durable, so the
    * whole flush can be skipped.
    */
  def committed(moduleHash: String, batchId: Long): Boolean =
    log().exists { df =>
      !df.filter(col("moduleHash") === moduleHash && col("batchId") === batchId).isEmpty
    }

  /** Every batchId committed for the module (unordered). */
  def allBatches(moduleHash: String): Seq[Long] =
    log().map { df =>
      df.filter(col("moduleHash") === moduleHash)
        .select("batchId").as[Long].collect().toSeq
    }.getOrElse(Seq.empty)

  /** Highest batchId committed for the module (−1 when none). */
  def maxBatchId(moduleHash: String): Long =
    log().map { df =>
      df.filter(col("moduleHash") === moduleHash)
        .agg(max("batchId")).as[Option[Long]].collect().head.getOrElse(-1L)
    }.getOrElse(-1L)

  /** Reference `cursorAtHighestBlock` (db/cursor.go:48-104): on a
    * module-hash mismatch BOTH `warn` and `ignore` adopt the cursor at the
    * highest block across all hashes and use it as the starting point
    * (warn additionally logs; run.go's flag doc: "If 'warn' is used, it
    * does the same as 'ignore' but it will log a warning"); `error`
    * throws. r17 (ADVICE item 1): `ignore` previously started FRESH,
    * inverting the reference semantics. The candidate is the highest-block
    * cursor among each module's RESOLVED cursor (the reference scans
    * `GetAllCursors`), not the highest-block raw log row — an overwritten
    * old row must not win.
    */
  def readWithMismatch(moduleHash: String, mode: String): Option[Cursor] =
    read(moduleHash).orElse {
      // deterministic tie-break on moduleHash (the reference iterates a Go
      // map — unspecified; determinism is strictly safer)
      val other = allCursors().values.toSeq
        .sortBy(c => (-c.blockNum, c.moduleHash)).headOption
      (other, mode) match {
        case (None, _) => None
        case (Some(c), MismatchMode.Warn) =>
          System.err.println(
            s"warn: cursor module hash mismatch, continuing using cursor " +
              s"at highest block ${c.blockNum} (module ${c.moduleHash}, " +
              s"expected $moduleHash); silence with " +
              "--on-module-hash-mistmatch=ignore")
          Some(c)
        case (Some(c), MismatchMode.Ignore) => Some(c)
        case (Some(c), _) => throw new IllegalStateException(
          s"cursor exists for module ${c.moduleHash}, expected $moduleHash " +
            "(on-module-hash-mismatch=error)")
      }
    }

  /** Idempotent commit: appending the same (moduleHash, batchId) twice
    * leaves the resolved cursor unchanged (replay-safe).
    */
  def commit(c: Cursor, batchId: Long): Unit =
    if (!committed(c.moduleHash, batchId)) {
      Seq((c.moduleHash, c.cursor, c.blockNum, c.blockId, batchId))
        .toDF("moduleHash", "cursor", "blockNum", "blockId", "batchId")
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(path)
    }

  // ---- admin surface (reference db/cursor.go:26-46,129-143) --------------

  /** The resolved (current) cursor of every module — `GetAllCursors`. */
  def allCursors(): Map[String, Cursor] =
    log().map { df =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("moduleHash")
        .orderBy(col("batchId").desc, col("blockNum").desc)
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select("moduleHash", "cursor", "blockNum", "blockId")
        .as[(String, String, Long, String)]
        .collect()
        .map { case (m, c, b, id) => m -> Cursor(m, c, b, id) }
        .toMap
    }.getOrElse(Map.empty)

  /** Drop every cursor row of one module — `DeleteCursor`. Returns the
    * number of rows removed (the reference errors on not-found; callers can
    * check == 0).
    */
  def delete(moduleHash: String): Long =
    rewrite(keep = r => r._1 != moduleHash)

  /** Drop the whole store — `DeleteAllCursors`. */
  def deleteAll(): Long = rewrite(keep = _ => false)

  /** Bound log growth: keep only each module's newest `keepLast` commits.
    * The resolved cursor of every module is unchanged (resolution only ever
    * looks at the highest batchIds); older rows exist for audit/rollback, so
    * retention is the caller's policy.
    */
  def compact(keepLast: Int = 16): Long = {
    val rows = collectRows()
    val keep = rows.groupBy(_._1).valuesIterator
      .flatMap(_.sortBy(-_._5).take(keepLast)).toSeq
    writeRows(keep)
    (rows.size - keep.size).toLong
  }

  // The cursor log is metadata — a handful of tiny rows per module (bounded
  // by compact) — so admin rewrites stage through the driver; the data path
  // (commit/read) never does.
  private def collectRows(): Seq[(String, String, Long, String, Long)] =
    log().map(_.as[(String, String, Long, String, Long)].collect().toSeq)
      .getOrElse(Seq.empty)

  private def writeRows(rows: Seq[(String, String, Long, String, Long)]): Unit =
    rows.toDF("moduleHash", "cursor", "blockNum", "blockId", "batchId")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)

  private def rewrite(keep: ((String, String, Long, String, Long)) => Boolean): Long = {
    val rows = collectRows()
    val kept = rows.filter(keep)
    writeRows(kept)
    (rows.size - kept.size).toLong
  }
}
