package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental materialized-view maintenance over the sink's snapshot — the
  * ClickHouse pattern the reference's users layer on the target table (a
  * MATERIALIZED VIEW with a Summing/AggregatingMergeTree engine over the
  * sink table): a per-group (row count, sum) rollup kept current under
  * INSERT/UPDATE/DELETE.
  *
  * ClickHouse MVs only see inserted blocks, so last-state rollups there need
  * the `-State`/`argMax` machinery; a CDC sink knows the PRIOR row of every
  * changed pk, so the rollup can be maintained EXACTLY with ± delta algebra:
  *
  *   agg'(g) = agg(g) − Σ prior rows of touched pks in g
  *                    + Σ new   rows of touched pks in g
  *
  * Per flush the cost is O(batch ⋈ snapshot-by-pk) + O(groups touched): the
  * prior-row lookup is a pk semi-join that rides the sink's bucketed
  * snapshot (delta-only shuffle), and the agg state stays O(groups). The
  * base table is never re-aggregated — the point at 100 TB, where a rollup
  * recompute is a full scan per flush.
  *
  * Totals are exact decimals (the ops/parity.scala discipline), so
  * incremental maintenance is bit-identical to [[recompute]] — decimal
  * addition is associative, which double addition is not.
  *
  * State schema: `grp` (group key, the group column's type), `n_rows`
  * (live rows), `n_vals` (live rows with a non-null value — lets a reader
  * present SQL-null totals for all-null groups), `total` (decimal(38, s),
  * 0 when no values). Groups with `n_rows` 0 are dropped from the state.
  */
object MaterializedAgg {

  /** An MV definition: group by `groupCol`, maintain count + sum(`valueCol`)
    * with `scale` decimal places of exactness.
    */
  final case class MvDef(groupCol: String, valueCol: String, scale: Int = 2) {
    private[cdc] def dec(c: Column): Column = c.cast(DecimalType(18, scale))
    private[cdc] def acc: DecimalType = DecimalType(38, scale)
  }

  /** An empty agg-state frame; the group column's type is taken from `like`
    * (any frame carrying `mv.groupCol` — e.g. a collapsed batch).
    */
  def empty(like: DataFrame, mv: MvDef): DataFrame =
    like.sparkSession.createDataFrame(
      like.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("grp", like.schema(mv.groupCol).dataType),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_vals", LongType, nullable = false),
        StructField("total", mv.acc))))

  /** Full recompute from a live snapshot — the bootstrap and the spec's
    * equality witness. One aggregate scan of the snapshot (what [[merge]]
    * exists to avoid doing per flush).
    */
  def recompute(snapshot: DataFrame, mv: MvDef): DataFrame =
    snapshot.groupBy(col(mv.groupCol).as("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(mv.valueCol)).as("n_vals"),
        coalesce(sum(mv.dec(col(mv.valueCol))), lit(0)).cast(mv.acc).as("total"))

  /** One flush's delta-merge.
    *
    * @param agg          prior agg state ([[empty]] on first flush)
    * @param priorTouched PRIOR snapshot rows of the batch's pks (semi-join
    *                     the snapshot on pk — O(batch), never O(snapshot))
    * @param newTouched   the same pks' post-apply rows
    *                     ([[ChangeLoader.applyBatch]] of the collapsed batch
    *                     onto `priorTouched`; deleted pks already dropped)
    */
  def merge(agg: DataFrame, priorTouched: DataFrame, newTouched: DataFrame,
      mv: MvDef): DataFrame = {
    def signed(df: DataFrame, w: Long) = df.select(
      col(mv.groupCol).as("grp"), mv.dec(col(mv.valueCol)).as("v"), lit(w).as("w"))
    // negate-not-multiply keeps the decimal type untouched (a decimal×bigint
    // product would widen past precision 38 and fall out of exactness)
    val delta = signed(newTouched, 1L).unionByName(signed(priorTouched, -1L))
      .groupBy("grp")
      .agg(
        sum(col("w")).as("d_rows"),
        coalesce(sum(when(col("v").isNotNull, col("w")).otherwise(0L)), lit(0L)).as("d_vals"),
        coalesce(sum(when(col("w") === 1L, col("v")).otherwise(-col("v"))), lit(0))
          .cast(mv.acc).as("d_total"))
    val a = agg.select(col("grp").as("a_grp"), col("n_rows"), col("n_vals"), col("total"))
    val d = delta.select(col("grp").as("d_grp"), col("d_rows"), col("d_vals"), col("d_total"))
    // null-safe group equality: a null group key is a group like any other
    a.join(d, col("a_grp") <=> col("d_grp"), "full_outer")
      .select(
        coalesce(col("a_grp"), col("d_grp")).as("grp"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("n_vals"), lit(0L)) + coalesce(col("d_vals"), lit(0L))).as("n_vals"),
        (coalesce(col("total"), lit(0).cast(mv.acc)) +
          coalesce(col("d_total"), lit(0).cast(mv.acc))).cast(mv.acc).as("total"))
      .filter(col("n_rows") > 0)
  }

  /** Reader view: SQL-null total for a group whose live rows carry no
    * values (matching what a direct `SUM` would return).
    */
  def view(agg: DataFrame): DataFrame =
    agg.select(col("grp"), col("n_rows"),
      when(col("n_vals") > 0, col("total")).as("total"))
}
