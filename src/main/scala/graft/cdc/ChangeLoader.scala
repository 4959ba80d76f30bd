package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch change-set merge + snapshot apply — the distributed re-expression
  * of the reference's in-memory op buffer and flush
  * (`/root/reference/db/ops.go:11-122`, `db/flush.go:13-69`).
  *
  * The reference keeps a per-(table, pk) map of pending ops and mutates it
  * change-by-change; at 100 TB the equivalent is ONE shuffle of the batch by
  * pk (window merge), then ONE sort-merge full-outer join against the prior
  * snapshot. No driver-side state anywhere.
  */
object ChangeLoader {

  /** Collapse a batch to one row per pk, reproducing ops.go semantics:
    *
    *   - ops strictly after the pk's last DELETE survive; field values merge
    *     last-writer-wins per FIELD (`mergeData`), null = "not in change".
    *   - `deleted` = the pk's final op is DELETE (no later INSERT/UPDATE) —
    *     the collapsed op is a delete (`ops.go:49-57` delete replaces).
    *
    * Input needs `pk`, `block` (monotone within the batch) and the field
    * columns; output: pk, deleted, last_block, merged field columns.
    *
    * Ordering within a block: the substreams model allows several changes
    * for one pk in one block, disambiguated by the protobuf `ordinal`
    * (reference TableChange field 3). If the input carries an `ordinal`
    * column it participates in every ordering decision, making
    * last-writer-wins deterministic; without it, (pk, block) uniqueness is
    * a REQUIRED precondition of this API.
    */
  def collapse(changes: DataFrame, fieldCols: Seq[String]): DataFrame = {
    // seqKey: the total order of changes within a pk. Struct comparison is
    // lexicographic, so max/`>` over it behaves like (block[, ordinal]).
    val seqKey =
      if (changes.columns.contains("ordinal")) struct(col("block"), col("ordinal"))
      else struct(col("block"))
    val seqAsc: Seq[Column] =
      if (changes.columns.contains("ordinal")) Seq(col("block"), col("ordinal"))
      else Seq(col("block"))
    val byBlock = Window.partitionBy("pk").orderBy(seqAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lastDel = max(when(col("op") === Op.Delete, seqKey)).over(byBlock)
    val afterDel = changes
      .withColumn("_del_key", lastDel)
      .filter(col("op") =!= Op.Delete &&
        (col("_del_key").isNull || seqKey > col("_del_key")))
    // rank window OUTERMOST (r15): computed in its own step ABOVE the
    // fields window so the _rn = 1 filter sits directly on the rank's
    // Window node and InferWindowGroupLimit keeps a 1-row heap per pk —
    // mixed into one select, the last()-fields window planned on top and
    // blocked the rewrite (caught by PlanAuditSpec's mechanical sweep)
    // the passthrough ordering column rides under a RESERVED alias so a
    // caller whose fieldCols include a column literally named "ordinal"
    // can't collide with it (ADVICE r15: the raw name made the select
    // ambiguous and silently dropped the merged field)
    val rnOrder: Seq[Column] =
      if (changes.columns.contains("ordinal")) Seq(col("block").desc, col("_ord").desc)
      else Seq(col("block").desc)
    val merged = afterDel.select(
      Seq(col("pk"), col("block"),
        col("_del_key").isNotNull.as("revived")) ++
        (if (changes.columns.contains("ordinal")) Seq(col("ordinal").as("_ord")) else Nil) ++
        fieldCols.map(f => last(col(f), ignoreNulls = true).over(byBlock).as(f)): _*)
      .withColumn("_rn",
        row_number().over(Window.partitionBy("pk").orderBy(rnOrder: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .drop("_ord")
      .withColumnRenamed("block", "last_block")
      .withColumn("deleted", lit(false))
    // pks whose ONLY surviving state is a delete:
    val deletes = changes.groupBy("pk")
      .agg(max("block").as("last_block"),
        max(when(col("op") === Op.Delete, seqKey)).as("_del_key"),
        max(when(col("op") =!= Op.Delete, seqKey)).as("_live_key"))
      .filter(col("_del_key").isNotNull &&
        (col("_live_key").isNull || col("_live_key") < col("_del_key")))
      .select(Seq(col("pk"), col("last_block"), lit(true).as("deleted"),
        lit(false).as("revived")) ++
        fieldCols.map(f => lit(null).as(f)): _*)
    merged.select(outCols(fieldCols): _*).unionByName(deletes.select(outCols(fieldCols): _*))
  }

  private def outCols(fieldCols: Seq[String]): Seq[Column] =
    Seq(col("pk"), col("last_block"), col("deleted"), col("revived")) ++ fieldCols.map(col)

  /** [[collapse]] plus the reference's pending-op TYPE per pk
    * (`db/operations.go Operation`): what statement the flush executes.
    *
    *   - `DELETE`  — final state is a delete,
    *   - `INSERT`  — the pk's first surviving op is an INSERT (later UPDATEs
    *     merged into it — `ops.go:60-75` update-into-pending-insert),
    *   - `UPDATE`  — updates with no in-batch insert,
    *   - `REPLACE` — deleted then re-inserted within the batch (the lenient
    *     revive; executes as DELETE + INSERT).
    */
  def pendingOps(changes: DataFrame, fieldCols: Seq[String]): DataFrame = {
    val seqKey =
      if (changes.columns.contains("ordinal")) struct(col("block"), col("ordinal"))
      else struct(col("block"))
    val seqAsc: Seq[Column] =
      if (changes.columns.contains("ordinal")) Seq(col("block"), col("ordinal"))
      else Seq(col("block"))
    val byBlock = Window.partitionBy("pk").orderBy(seqAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val firstAlive = changes
      .withColumn("_del_key", max(when(col("op") === Op.Delete, seqKey)).over(byBlock))
      .filter(col("op") =!= Op.Delete &&
        (col("_del_key").isNull || seqKey > col("_del_key")))
      .withColumn("_rn", row_number().over(Window.partitionBy("pk").orderBy(seqAsc: _*)))
      .filter(col("_rn") === 1)
      .select(col("pk"), col("op").as("_first_op"))
    collapse(changes, fieldCols)
      .join(firstAlive, Seq("pk"), "left")
      .withColumn("sql_op",
        when(col("deleted"), Op.Delete)
          .when(col("revived"), "REPLACE")
          .when(col("_first_op") === Op.Insert, Op.Insert)
          .otherwise(Op.Update))
      .drop("_first_op")
  }

  /** Flag reference-loader rule violations in a batch instead of aborting
    * (`ops.go:29` duplicate INSERT, `ops.go:37-41` UPDATE after DELETE at
    * the same pk with no INSERT between).
    *
    * `insert_after_existing` reproduces the reference's full strictness:
    * `ops.go` Insert errors when ANY op is already pending for the pk —
    * including INSERT after DELETE/UPDATE, which `collapse` leniently treats
    * as a revive. Callers wanting reference-abort behavior check this feed.
    */
  def violations(changes: DataFrame): DataFrame = {
    val dupInsert = changes.filter(col("op") === Op.Insert)
      .groupBy("pk").agg(count(lit(1)).as("n"), max("block").as("block"))
      .filter(col("n") > 1)
      .select(col("pk"), col("block"), lit("duplicate_insert").as("rule"))
    val w = Window.partitionBy("pk").orderBy("block")
    val updAfterDel = changes
      .withColumn("_prev_op", lag("op", 1).over(w))
      .filter(col("op") === Op.Update && col("_prev_op") === Op.Delete)
      .select(col("pk"), col("block"), lit("update_after_delete").as("rule"))
    val insAfterAny = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("op") === Op.Insert && col("_rn") > 1)
      .select(col("pk"), col("block"), lit("insert_after_existing").as("rule"))
    dupInsert.unionByName(updAfterDel).unionByName(insAfterAny)
  }

  /** Apply a collapsed batch to the prior snapshot (the flush):
    * full-outer join on pk; deletes drop the row, merges coalesce per field
    * onto the prior values (UPDATE semantics), new pks insert. A `revived`
    * pk (deleted then re-written within the batch) takes ONLY the batch's
    * fields — the reference's DELETE wipes the prior row entirely.
    *
    * Both sides shuffle on pk — with bucketed snapshot storage this is a
    * co-located join at scale, and AQE handles skewed pks.
    */
  def applyBatch(snapshot: DataFrame, collapsed: DataFrame, fieldCols: Seq[String]): DataFrame = {
    val s = snapshot.select(col("pk").as("s_pk"),
      struct(fieldCols.map(col): _*).as("s_fields"))
    val c = collapsed.select(col("pk").as("c_pk"), col("deleted"), col("revived"),
      struct(fieldCols.map(col): _*).as("c_fields"))
    s.join(c, col("s_pk") === col("c_pk"), "full_outer")
      .filter(col("deleted").isNull || !col("deleted"))
      .select(
        Seq(coalesce(col("s_pk"), col("c_pk")).as("pk")) ++
          fieldCols.map(f =>
            when(col("revived"), col(s"c_fields.$f"))
              .otherwise(coalesce(col(s"c_fields.$f"), col(s"s_fields.$f"))).as(f)): _*)
  }
}
