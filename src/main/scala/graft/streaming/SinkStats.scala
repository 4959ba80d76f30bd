package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-flush sink statistics — the reference's progress metrics
  * (`/root/reference/sinker/stats.go`, `sinker/metrics.go`: blocks/sec,
  * entries flushed, flush duration) as an append-only parquet metrics log,
  * queryable with the same engine.
  */
final case class FlushStat(
    moduleHash: String,
    batchId: Long,
    maxBlock: Long,
    minBlock: Long,
    nOps: Long,
    nPks: Long,
    flushMillis: Long,
    wallMillis: Long
)

final class SinkStats(path: String, spark: SparkSession) {

  import spark.implicits._

  def record(stat: FlushStat): Unit =
    Seq(stat).toDF().coalesce(1).write.mode(SaveMode.Append).parquet(path)

  def log(): Option[DataFrame] =
    try Some(spark.read.parquet(path)) catch { case _: Throwable => None }

  /** The reference's headline rates, computed over the recorded flushes:
    * blocks/sec and entries/sec per module (wall time), plus mean flush
    * duration.
    */
  def rates(): Option[DataFrame] = log().map { df =>
    df.groupBy("moduleHash")
      .agg(
        max("maxBlock").as("head_block"),
        sum("nOps").as("entries"),
        count(lit(1)).as("flushes"),
        avg("flushMillis").as("avg_flush_ms"),
        (sum("nOps") * 1000.0 / sum("wallMillis")).as("entries_per_sec"),
        // blocks PROCESSED per second (head − start), not absolute head
        // height — a stream resuming at chain head ~20M must not report a
        // 20M-block flush.
        ((max("maxBlock") - min("minBlock")) * 1000.0 / sum("wallMillis"))
          .as("blocks_per_sec"))
  }
}
