package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2/§2.3 round-8 additions, final batch (#196-#197) —
  * two-level entity statistics and the token-count corpus histogram.
  */
object AnalyticsR8l {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  val defs: Map[String, OpDef] = Map(

    // ---- #196 orders-per-customer distribution -----------------------------
    // The two-level entity rollup: orders collapse to the customer grain
    // (count + exact cents total per customer), then the DISTRIBUTION of
    // those per-customer counts is read exactly off the count grain with
    // nearest-rank selection — entity stats without ever sorting entity
    // rows. Both collapses + the rank windows are grain-sized; pure
    // integers end to end.
    "orders_per_customer_stats" -> OpDef(
      """WITH c AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |g AS (SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM c GROUP BY 1),
        |w AS (
        |  SELECT n_orders, cnt,
        |    SUM(cnt) OVER (ORDER BY n_orders) AS cum,
        |    SUM(cnt) OVER () AS n
        |  FROM g)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN n_orders END)
        |    AS BIGINT) AS p50_orders,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.90 * n) THEN n_orders END)
        |    AS BIGINT) AS p90_orders,
        |  CAST(MAX(n_orders) AS BIGINT) AS max_orders
        |FROM w""".stripMargin
    ) { (s, dir) =>
      val c = tbl(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      val g = c.groupBy("n_orders").agg(count(lit(1)).as("cnt"))
      val cum = Window.orderBy("n_orders")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = g
        .withColumn("cum", sum("cnt").over(cum))
        .withColumn("n", sum("cnt").over(Window.partitionBy()))
      def sel(q: Double): Column =
        min(when(col("cum") >= ceil(lit(q) * col("n")), col("n_orders")))
          .cast(LongType)
      w.agg(max("n").cast(LongType).as("n_customers"),
        sel(0.50).as("p50_orders"), sel(0.90).as("p90_orders"),
        max("n_orders").cast(LongType).as("max_orders"))
    },

    // ---- #197 tokens-per-doc histogram -------------------------------------
    // Corpus length structure in TOKENS (the unit curation budgets in),
    // bucketed by power of two — the log2_histogram discipline (bit
    // LENGTH, never floor(log2)) applied to the per-doc token count. The
    // token count is size(split) — a scan-riding scalar, no explode; ONE
    // collapse to the ≤20-cell bucket grain; share rides a grain window.
    "tokens_per_doc_hist" -> OpDef(
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
        |g AS (
        |  SELECT CAST(length(printf('%b', n_tok)) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM d WHERE n_tok > 0 GROUP BY 1)
        |SELECT bucket, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 4) AS share
        |FROM g ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val d = tbl(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .filter(col("n_tok") > 0)
      val g = d.groupBy(length(bin(col("n_tok"))).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast(LongType).as("n_tokens"))
      g.select(col("bucket"), col("n_docs").cast(LongType).as("n_docs"),
          col("n_tokens"),
          round(col("n_docs").cast(DoubleType)
            / sum("n_docs").over(Window.partitionBy()), 4).as("share"))
        .orderBy("bucket")
    }
  )
}
