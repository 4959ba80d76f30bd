package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, attach the payload of the right
  * row with the greatest `rightTime` ≤ / < `leftTime` within the same
  * partition keys.
  *
  * Spark has no ASOF JOIN operator; the classic distributed plan is the
  * union+window trick: tag both inputs, union them, and take
  * `last(right payload, ignoreNulls)` over a (keys)-partitioned window
  * ordered by (time, tag) — ONE shuffle on the partition keys, no join, no
  * row blowup, linear at any scale. Ties: right rows at the same instant
  * order before left rows iff `strict` is false (≤ semantics) and after iff
  * true (< semantics). Among MULTIPLE right rows sharing identical
  * (keys, time), the greatest payload struct wins — an explicit ordering on
  * the payload makes the result deterministic across runs (a bare
  * (time, tag) sort would leave the winner to partition luck).
  */
object AsofJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[String],
      strict: Boolean = false,
      payloadPrefix: String = "asof_"
  ): DataFrame = {
    // left rows tag 1, right rows tag 0; at equal times the (time, tag)
    // ordering decides ≤ vs < semantics.
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)
    val l = left
      .withColumn("_t", leftTime)
      .withColumn("_tag", lit(leftTag))
      .withColumn("_payload", lit(null).cast(
        right.select(rightPayload.map(col): _*)
          .selectExpr(s"struct(${rightPayload.mkString(",")}) s").schema("s").dataType))
    val r = right
      .select(keys.map(col) :+ rightTime.as("_t") :+
        struct(rightPayload.map(col): _*).as("_payload"): _*)
      .withColumn("_tag", lit(rightTag))
    // align columns: left keeps all its columns; right contributes only
    // keys + time + payload (left-only columns null).
    val leftCols = l.columns
    val rUnion = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(leftCols.map(col): _*)
    // `_payload` as the final sort key = deterministic winner among right
    // rows tied on (keys, time); left rows carry a null payload and are
    // already separated by `_tag`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_tag"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rUnion)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === leftTag && col("_payload").isNull)
    val out = rightPayload.foldLeft(matched) { (df, p) =>
      df.withColumn(s"$payloadPrefix$p", col(s"_asof.$p"))
    }
    out.drop("_t", "_tag", "_payload", "_asof")
  }
}
