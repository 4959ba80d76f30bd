package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, tenth batch (#191-#192) — attribution
  * and conversion analytics.
  */
object AnalyticsR8k {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val kProp = get_json_object(col("props"), "$.k").cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #191 first-touch attribution × conversion -------------------------
    // Per first-ever event type: how many users started there, and how
    // many of them ever purchased — the first-touch attribution table.
    // ONE user-keyed aggregate carries BOTH facts (argmin by exact
    // (µs, event_id) via a struct min — deterministic under ties — and a
    // conditional any); the attribution grain is a second ≤5-row
    // collapse. Integers + one divide → round(·,4).
    "first_touch_conversion" -> OpDef(
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_us(ts) AS us, event_id
        |  FROM events),
        |u AS (
        |  SELECT user_id,
        |    first(t ORDER BY us, event_id) AS first_type,
        |    MAX(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM e GROUP BY 1)
        |SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(conv) AS BIGINT) AS n_converted,
        |  round(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 4) AS cvr
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val u = tbl(s, dir, "events")
        .select(col("user_id"), col("event_type").as("t"),
          expr("unix_micros(ts)").as("us"), col("event_id"))
        .groupBy("user_id")
        .agg(
          min(struct(col("us"), col("event_id"), col("t")))
            .getField("t").as("first_type"),
          max(when(col("t") === "purchase", 1).otherwise(0)).as("conv"))
      u.groupBy("first_type")
        .agg(count(lit(1)).cast(LongType).as("n_users"),
          sum("conv").cast(LongType).as("n_converted"),
          round(sum("conv").cast(DoubleType) / count(lit(1)), 4).as("cvr"))
        .orderBy("first_type")
    },

    // ---- #192 conversion rate by k-decile ----------------------------------
    // P(event is a purchase | k-decile) — the score-band conversion curve
    // feature screens read next to cat_iv. ONE conditional partial agg to
    // the ≤10-row decile grain (agg_if discipline): one fact exchange,
    // zero windows, zero joins; one divide → round(·,4).
    "conversion_by_decile" -> OpDef(
      """WITH f AS (
        |  SELECT CAST(json_extract_string(props, 'k') AS BIGINT) // 10 AS b,
        |    event_type AS t
        |  FROM events
        |  WHERE json_extract_string(props, 'k') IS NOT NULL)
        |SELECT b AS decile, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(CASE WHEN t = 'purchase' THEN 1 END) AS BIGINT)
        |    AS n_purchase,
        |  round(CAST(COUNT(CASE WHEN t = 'purchase' THEN 1 END) AS DOUBLE)
        |    / COUNT(*), 4) AS purchase_rate
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      tbl(s, dir, "events")
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(parity.floorDiv(kProp, 10).as("b"),
          col("event_type").as("t"))
        .groupBy("b")
        .agg(count(lit(1)).cast(LongType).as("n"),
          count(when(col("t") === "purchase", 1)).cast(LongType)
            .as("n_purchase"),
          round(count(when(col("t") === "purchase", 1)).cast(DoubleType)
            / count(lit(1)), 4).as("purchase_rate"))
        .select(col("b").as("decile"), col("n"), col("n_purchase"),
          col("purchase_rate"))
        .orderBy("decile")
    }
  )
}
