package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, closing relational batch (#198-#199) —
  * the delivery-lag distribution and banded dimensional revenue.
  */
object RelationalR8b {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  val defs: Map[String, OpDef] = Map(

    // ---- #198 delivery-lag quantiles per priority --------------------------
    // Exact p50/p90 of ship-lag days (l_shipdate − o_orderdate) per order
    // priority — the fact⋈fact join feeding the bank's value-grain
    // quantile discipline: the join carries 2 pruned columns per side,
    // lags collapse to the (priority, lag-day) grain, and rank selection
    // rides per-priority grain windows. Integer day arithmetic end to
    // end.
    "delivery_lag_quantiles" -> OpDef(
      """WITH j AS (
        |  SELECT o.o_orderpriority AS pri,
        |    datediff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS lag_d
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |g AS (SELECT pri, lag_d, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM j GROUP BY 1, 2),
        |w AS (
        |  SELECT pri, lag_d, cnt,
        |    SUM(cnt) OVER (PARTITION BY pri ORDER BY lag_d) AS cum,
        |    SUM(cnt) OVER (PARTITION BY pri) AS n
        |  FROM g)
        |SELECT pri AS o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_lines,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN lag_d END) AS BIGINT)
        |    AS p50_lag_days,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.90 * n) THEN lag_d END) AS BIGINT)
        |    AS p90_lag_days
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
          col("o_orderdate"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val g = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("pri"),
          datediff(col("l_shipdate").cast(DateType),
            col("o_orderdate").cast(DateType)).cast(LongType).as("lag_d"))
        .groupBy("pri", "lag_d").agg(count(lit(1)).as("cnt"))
      val part = Window.partitionBy("pri")
      val w = g
        .withColumn("cum", sum("cnt").over(part.orderBy("lag_d")))
        .withColumn("n", sum("cnt").over(part))
      def sel(q: Double): Column =
        min(when(col("cum") >= ceil(lit(q) * col("n")), col("lag_d")))
          .cast(LongType)
      w.groupBy("pri").agg(max("n").cast(LongType).as("n_lines"),
          sel(0.50).as("p50_lag_days"), sel(0.90).as("p90_lag_days"))
        .select(col("pri").as("o_orderpriority"), col("n_lines"),
          col("p50_lag_days"), col("p90_lag_days"))
        .orderBy("o_orderpriority")
    },

    // ---- #199 banded revenue by brand --------------------------------------
    // Revenue per (p_brand, quantity band ≤10 / 11-25 / >25) — the
    // TPC-H-Q19-flavored banded dimensional rollup. The part dim projects
    // to (key, brand) and broadcasts; the band is a scan-riding integer
    // CASE; revenue sums EXACTLY in DECIMAL (§5), double at the boundary.
    "brand_band_revenue" -> OpDef(
      """WITH j AS (
        |  SELECT p.p_brand,
        |    CASE WHEN l.l_quantity <= 10 THEN 'a_low'
        |         WHEN l.l_quantity <= 25 THEN 'b_mid'
        |         ELSE 'c_high' END AS band,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT p_brand, band, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).as("rev"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .select(col("p_brand"),
          when(col("l_quantity") <= 10, "a_low")
            .when(col("l_quantity") <= 25, "b_mid")
            .otherwise("c_high").as("band"),
          col("rev"))
        .groupBy("p_brand", "band")
        .agg(count(lit(1)).cast(LongType).as("n_lines"),
          sum("rev").cast(DoubleType).as("revenue"))
        .orderBy("p_brand", "band")
    }
  )
}
