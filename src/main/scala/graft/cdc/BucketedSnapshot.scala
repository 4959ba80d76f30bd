package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed snapshot storage — the 100 TB layout for the CDC apply loop.
  *
  * The flush join ([[ChangeLoader.applyBatch]]) is a full-outer join on pk
  * between the (huge) snapshot and the (small) collapsed batch. Stored flat,
  * every flush re-shuffles the entire snapshot; stored bucketed+sorted by
  * pk, the snapshot scan already satisfies the join's required partitioning
  * and ONLY the delta shuffles — per-flush cost drops from O(snapshot) to
  * O(batch) network. This is the lake equivalent of the reference target's
  * ORDER BY pk MergeTree layout.
  */
object BucketedSnapshot {

  /** Persist a snapshot bucketed+sorted by pk as a managed table. */
  def write(snapshot: DataFrame, table: String, buckets: Int): Unit =
    snapshot.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "pk")
      .sortBy("pk")
      .saveAsTable(table)

  /** Apply a collapsed batch against a bucketed snapshot table; the
    * resulting plan shuffles only the batch side.
    */
  def applyToTable(spark: SparkSession, table: String, collapsed: DataFrame,
      fieldCols: Seq[String]): DataFrame =
    ChangeLoader.applyBatch(spark.table(table), collapsed, fieldCols)
}
