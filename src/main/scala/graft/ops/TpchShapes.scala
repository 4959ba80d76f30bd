package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 — TPC-H-flavored relational rollups (Q4/Q12/Q14 shapes,
  * banded dimensional rollups, CUBE). Shared discipline: dims project to
  * the join columns and broadcast, EXISTS is left_semi, revenue sums in
  * DECIMAL (§5) with double only at the final ratio -> round(.,4).
  * (Consolidated r9 from the r8 chronology files.)
  */
object TpchShapes {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val kProp = get_json_object(col("props"), "$.k").cast(LongType)
  private val centsL =
    (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
  private val big = DecimalType(38, 0)
  private val epochDay = datediff(col("ts").cast(DateType),
    to_date(lit("1970-01-01"))).cast(LongType)

  val defs: Map[String, OpDef] = Map(
    // ---- #152 CUBE aggregation ---------------------------------------------
    // The full 2-D OLAP cube over (returnflag, ship_year) — all four
    // grouping sets in ONE pass: Spark's Expand feeds the same partial
    // aggregate as a plain groupBy, so the cube costs one exchange of
    // (4 × grain) pre-aggregated rows, never four scans. Quantities sum
    // as DECIMAL(18,2) (exact) and cast to double only at the boundary;
    // NULL grouping cells take the 'ALL' sentinel so the driver comparator
    // never sees engine-specific null ordering.
    "cube_agg" -> OpDef(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(CAST(y AS VARCHAR), 'ALL') AS ship_year,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(2 * GROUPING(l_returnflag) + GROUPING(y) AS BIGINT) AS gid
        |FROM (SELECT l_returnflag,
        |        date_part('year', CAST(l_shipdate AS DATE)) AS y,
        |        l_quantity FROM lineitem)
        |GROUP BY CUBE(l_returnflag, y)
        |ORDER BY returnflag, ship_year""".stripMargin
    ) { (s, dir) =>
      tbl(s, dir, "lineitem")
        .select(col("l_returnflag"),
          year(col("l_shipdate").cast(DateType)).cast(LongType).as("y"),
          col("l_quantity"))
        .cube("l_returnflag", "y")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_qty"),
          (lit(2) * grouping(col("l_returnflag")) + grouping(col("y")))
            .cast(LongType).as("gid"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("y").cast(StringType), lit("ALL")).as("ship_year"),
          col("n"), col("sum_qty"), col("gid"))
        .orderBy("returnflag", "ship_year")
    },

    // ---- #193 TPC-H Q4 shape: priority count with EXISTS semi-join ---------
    // Orders per priority that have at least one line shipped > 60 days
    // after the order date — the EXISTS pattern. The semi-join keeps the
    // probe side at ONE row per qualifying order (never a row-multiplying
    // inner join + distinct); the date predicate rides the join condition
    // so non-qualifying lines never survive the build side. Exact integer
    // date arithmetic.
    "q4_priority_slowship" -> OpDef(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND datediff('day', CAST(o.o_orderdate AS DATE),
        |          CAST(l.l_shipdate AS DATE)) > 60)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            datediff(l("l_shipdate").cast(DateType),
              o("o_orderdate").cast(DateType)) > 60,
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast(LongType).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---- #194 TPC-H Q12 shape: priority-class counts per line status -------
    // Per l_linestatus: how many lines belong to URGENT/HIGH-priority
    // orders vs the rest — the join + dual conditional count. The
    // priority flag projects to ONE boolean BEFORE the join (column
    // pruning: the join carries 2 columns, not the orders row); both
    // counts ride ONE conditional partial agg.
    "q12_priority_class" -> OpDef(
      """SELECT l.l_linestatus,
        |  CAST(COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS BIGINT) AS high_line_count,
        |  CAST(COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hi"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linestatus"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(count(when(col("hi"), 1)).cast(LongType).as("high_line_count"),
          count(when(!col("hi"), 1)).cast(LongType).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // ---- #195 TPC-H Q14 shape: promo revenue share -------------------------
    // Revenue share of ECONOMY-type parts — the broadcast-dim conditional
    // revenue ratio. The part dim projects to (key, flag) and broadcasts
    // (constant-size at any fact scale); revenue = price·(1−disc) sums
    // EXACTLY in DECIMAL (the §5 rule: a double fold here hash-diverges),
    // double only at the final ratio → round(·,4).
    "q14_promo_share" -> OpDef(
      """SELECT
        |  round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
        |      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
        |    AS promo_share_pct,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin
    ) { (s, dir) =>
      val p = tbl(s, dir, "part")
        .select(col("p_partkey"), (col("p_type") === "ECONOMY").as("promo"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_partkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .as("rev"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("promo"), col("rev"))).cast(DoubleType)
            / sum(col("rev")).cast(DoubleType), 4).as("promo_share_pct"),
          count(lit(1)).cast(LongType).as("n_lines"))
    },

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
    },

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
    }
  )
}
