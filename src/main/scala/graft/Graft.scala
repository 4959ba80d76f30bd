package graft

import graft.cdc.{Catalog, ChangeLoader, CursorStore, MultiTable}
import graft.sources.{Changes, Tables}
import graft.streaming.{ChangeStreamSink, MultiTableChangeSink}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library facade — what a user of the reference sink programs against
  * after switching to graft.
  *
  * One instance binds a session and a table directory (the "database");
  * every capability of the engine hangs off it: the reference's CDC
  * ingestion surface (change feed → collapse → snapshot apply → streaming
  * sink with exactly-once cursors), the analytic query bank, and the
  * training-data operators (dedup / ANN / text / multimodal).
  */
final class Graft(val spark: SparkSession, val dir: String) {

  graft.functions.GraftFunctions.register(spark)

  // ---- storage & schema -------------------------------------------------
  def table(name: String): DataFrame = Tables(spark, dir, name)
  def registerAllTables(): Unit = Tables.registerAll(spark, dir)
  lazy val catalog: Catalog = new Catalog(dir, spark)

  // ---- CDC surface (the reference's job) --------------------------------
  /** The per-block change feed (derived deterministically from `events`). */
  def changes(): DataFrame = Changes(spark, dir)

  def collapse(batch: DataFrame, fields: Seq[String]): DataFrame =
    ChangeLoader.collapse(batch, fields)

  def applyBatch(snapshot: DataFrame, collapsed: DataFrame, fields: Seq[String]): DataFrame =
    ChangeLoader.applyBatch(snapshot, collapsed, fields)

  def violations(batch: DataFrame): DataFrame = ChangeLoader.violations(batch)

  def cursorStore(path: String): CursorStore = new CursorStore(path, spark)

  def streamSink(baseDir: String, moduleHash: String, fields: Seq[String]): ChangeStreamSink =
    new ChangeStreamSink(baseDir, moduleHash, fields)

  /** The wire-shaped multi-table feed + the reference's full dispatch loop. */
  def multiTableChanges(): DataFrame = Changes.multiTable(spark, dir)

  def collapseAll(wire: DataFrame,
      schemas: Map[String, org.apache.spark.sql.types.StructType]): Map[String, DataFrame] =
    MultiTable.collapseAll(wire, schemas)

  def multiTableSink(baseDir: String, moduleHash: String,
      schemas: Map[String, org.apache.spark.sql.types.StructType]): MultiTableChangeSink =
    new MultiTableChangeSink(baseDir, moduleHash, schemas)

  // ---- query bank -------------------------------------------------------
  /** Run any SURVEY §2 operator by key (see `SparkEntry.queries`). */
  def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  def operators: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  // ---- ANN --------------------------------------------------------------
  def annBruteForce(): DataFrame = run("ann_bruteforce")
  def annLsh(k: Int = ann.Ann.K): DataFrame = ann.Ann.lshTopK(spark, dir, k)

  // ---- as-of join --------------------------------------------------------
  /** Union+window composition — no session extensions needed. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: org.apache.spark.sql.Column, rightTime: org.apache.spark.sql.Column,
      rightPayload: Seq[String], strict: Boolean = false): DataFrame =
    ops.AsofJoin.join(left, right, keys, leftTime, rightTime, rightPayload, strict)

  /** The custom Catalyst operator (logical node → strategy → merge exec):
    * SMJ-style distribution, O(1) look-behind state per partition.
    */
  def asofJoinOperator(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: org.apache.spark.sql.Column, rightTime: org.apache.spark.sql.Column,
      rightPayload: Seq[String], strict: Boolean = false): DataFrame =
    plans.AsofJoinPlan.asof(left, right, keys, leftTime, rightTime, rightPayload, strict)
}

object Graft {
  def apply(spark: SparkSession, dir: String): Graft = new Graft(spark, dir)
}
