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
  * the row with the highest (blockNum, batchId) per module — append + resolve
  * -on-read is the lake-native equivalent of the reference's UPDATE-in-txn,
  * and replaying a Structured Streaming batch (same batchId) is a no-op on
  * resolve, giving exactly-once cursor semantics under retries.
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

  /** Reference `cursorAtHighestBlock`: on a module-hash mismatch, `ignore`
    * starts fresh, `warn` adopts the cursor at the highest block across all
    * hashes, `error` throws.
    */
  def readWithMismatch(moduleHash: String, mode: String): Option[Cursor] =
    read(moduleHash).orElse {
      val other = log().flatMap { df =>
        df.orderBy(col("blockNum").desc, col("batchId").desc).limit(1)
          .as[(String, String, Long, String, Long)].collect().headOption
          .map { case (m, c, b, id, _) => Cursor(m, c, b, id) }
      }
      (other, mode) match {
        case (None, _)                    => None
        case (_, MismatchMode.Ignore)     => None
        case (Some(c), MismatchMode.Warn) => Some(c)
        case (Some(c), _) => throw new IllegalStateException(
          s"cursor exists for module ${c.moduleHash}, expected $moduleHash " +
            "(on-module-hash-mismatch=error)")
      }
    }

  /** Idempotent commit: appending the same (moduleHash, batchId) twice
    * leaves the resolved cursor unchanged (replay-safe).
    */
  def commit(c: Cursor, batchId: Long): Unit = {
    val committed = log().exists { df =>
      !df.filter(col("moduleHash") === c.moduleHash && col("batchId") === batchId).isEmpty
    }
    if (!committed) {
      Seq((c.moduleHash, c.cursor, c.blockNum, c.blockId, batchId))
        .toDF("moduleHash", "cursor", "blockNum", "blockId", "batchId")
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(path)
    }
  }
}
