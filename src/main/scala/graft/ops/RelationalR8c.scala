package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, coda batch (#200-#201) — single-table
  * rollup shapes closing the round: status revenue shares and the
  * events-per-user engagement histogram.
  */
object RelationalR8c {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  val defs: Map[String, OpDef] = Map(

    // ---- #200 order-status revenue rollup ----------------------------------
    // Count + exact decimal revenue + share per order status — the
    // simplest possible rollup, kept §5-clean: totals sum in
    // DECIMAL(18,2), the share divides doubles cast from exact decimals
    // over a 3-row grain window → round(·,4).
    "status_revenue_rollup" -> OpDef(
      """WITH g AS (
        |  SELECT o_orderstatus,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, n_orders,
        |  CAST(total AS DOUBLE) AS revenue,
        |  round(CAST(total AS DOUBLE) / CAST(SUM(total) OVER () AS DOUBLE), 4)
        |    AS share
        |FROM g ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast(LongType).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))
      g.select(col("o_orderstatus"), col("n_orders"),
          col("total").cast(DoubleType).as("revenue"),
          round(col("total").cast(DoubleType)
            / sum("total").over(Window.partitionBy()).cast(DoubleType), 4)
            .as("share"))
        .orderBy("o_orderstatus")
    },

    // ---- #201 events-per-user engagement histogram -------------------------
    // Users bucketed by power-of-two event count — active_days_hist's
    // volume twin (how heavy-tailed is per-user activity?). ONE user
    // collapse, bucket = bit LENGTH (log2_histogram discipline), share
    // over the ≤30-cell grain → round(·,4).
    "events_per_user_hist" -> OpDef(
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT CAST(length(printf('%b', k)) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(k) AS BIGINT) AS n_events
        |  FROM u GROUP BY 1)
        |SELECT bucket, n_users, n_events,
        |  round(CAST(n_users AS DOUBLE) / SUM(n_users) OVER (), 4) AS share
        |FROM g ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val u = tbl(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("k"))
      val g = u.groupBy(length(bin(col("k"))).cast(LongType).as("bucket"))
        .agg(count(lit(1)).cast(LongType).as("n_users"),
          sum("k").cast(LongType).as("n_events"))
      g.select(col("bucket"), col("n_users"), col("n_events"),
          round(col("n_users").cast(DoubleType)
            / sum("n_users").over(Window.partitionBy()), 4).as("share"))
        .orderBy("bucket")
    }
  )
}
