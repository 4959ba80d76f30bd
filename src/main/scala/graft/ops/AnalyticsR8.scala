package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 extensions — frame-window / OLAP-grouping /
  * rank-statistic / monitoring analytics, in the bank's established scale
  * shapes (grain collapses, bounded frames, exact-integer arithmetic with
  * the §5 double-at-the-boundary rule).
  *
  * Reference surface exercised (semantics, not implementation): CUBE /
  * GROUPING the synced store exposes alongside ROLLUP (#19), RANGE-frame
  * sliding aggregates, kendallTau rank correlation, medianExact with a
  * distribution-free confidence interval, and the trailing-window z-score
  * anomaly screen monitoring stacks run over flush rollups.
  */
object AnalyticsR8 {

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

    // ---- #153 RANGE-frame sliding sum --------------------------------------
    // Trailing-7-day spend per user at EVERY event row — the sliding
    // aggregate shape that at 100 TB must be a bounded RANGE frame riding
    // ONE hashpartitioning(user_id) exchange, never a self-join on a date
    // band (which re-shuffles the fact table ~7×). Peers on the same day
    // share one frame, so the result is row-order independent; cents stay
    // exact integers end to end.
    "range_window_sum" -> OpDef(
      """WITH f AS (
        |  SELECT event_id, user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events)
        |SELECT event_id, user_id, CAST(ed AS BIGINT) AS ed,
        |  CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ed
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trail7_cents
        |FROM f ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ed").rangeBetween(-6, 0)
      tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), epochDay.as("ed"),
          centsL.as("c"))
        .withColumn("trail7_cents", sum("c").over(w).cast(LongType))
        .drop("c")
        .orderBy("event_id")
    },

    // ---- #154 Kendall rank correlation (tau-b) ------------------------------
    // Exact tau-b between the k-decile and day-of-week — the rank
    // correlation that, unlike Spearman, is well-defined under heavy ties.
    // Facts collapse ONCE to the ≤70-cell (x, y) contingency grain, then
    // the grain PIVOTS on the 7 known dow values (≤10 rows × 7 columns) so
    // concordant/discordant pair counts become 2-D dominance sums over
    // per-column cumulative windows — ONE lineage, ONE fact scan, ZERO
    // joins (the naive per-statistic branching re-scans the corpus 5×,
    // and even a cell self-join re-scans it twice). Products accumulate in
    // DECIMAL(38,0)/HUGEINT (cell counts are corpus-scale, their products
    // overflow int64 on the 100 TB path); ONE IEEE expression at the end
    // → round(·,4).
    "kendall_tau" -> OpDef(
      """WITH f AS (
        |  SELECT CAST(json_extract_string(props, 'k') AS BIGINT) // 10 AS x,
        |    date_part('dow', CAST(ts AS DATE)) AS y
        |  FROM events),
        |g AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM f
        |      WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT
        |    COALESCE(SUM(CASE WHEN b.x > a.x AND b.y > a.y
        |        THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS conc,
        |    COALESCE(SUM(CASE WHEN b.x > a.x AND b.y < a.y
        |        THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS disc
        |  FROM g a, g b),
        |m AS (
        |  SELECT CAST(SUM(c) AS HUGEINT) AS n,
        |    (SELECT SUM(CAST(rc AS HUGEINT) * (rc - 1))
        |     FROM (SELECT SUM(c) AS rc FROM g GROUP BY x)) AS tx,
        |    (SELECT SUM(CAST(cc AS HUGEINT) * (cc - 1))
        |     FROM (SELECT SUM(c) AS cc FROM g GROUP BY y)) AS ty
        |  FROM g)
        |SELECT CAST(m.n AS BIGINT) AS n_total,
        |  round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
        |    / sqrt((CAST(m.n AS DOUBLE) * (CAST(m.n AS DOUBLE) - 1) / 2
        |            - CAST(tx AS DOUBLE) / 2)
        |         * (CAST(m.n AS DOUBLE) * (CAST(m.n AS DOUBLE) - 1) / 2
        |            - CAST(ty AS DOUBLE) / 2)), 4) AS tau_b
        |FROM p, m""".stripMargin
    ) { (s, dir) =>
      val dows = 0 to 6
      val piv = tbl(s, dir, "events")
        .select((kProp / 10).cast(LongType).as("x"),
          (dayofweek(col("ts").cast(DateType)) - 1).cast(LongType).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
        .groupBy("x").pivot("y", dows.map(i => Long.box(i.toLong)))
        .agg(count(lit(1)))
      def cAt(i: Int): Column = coalesce(col(s"$i"), lit(0L)).cast(big)
      val wCum = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      // after(x, y') = Σ_{x'>x} c(x', y') — column total minus inclusive cum
      val withAfter = dows.foldLeft(piv) { (d, i) =>
        d.withColumn(s"tot_$i", sum(cAt(i)).over(wAll))
          .withColumn(s"after_$i", col(s"tot_$i") - sum(cAt(i)).over(wCum))
      }
      def afterRange(p: Int => Boolean): Column =
        dows.filter(p).map(i => col(s"after_$i"))
          .reduceOption(_ + _).getOrElse(lit(0L).cast(big))
      val concRow = dows.map(y =>
        cAt(y) * afterRange(_ > y)).reduce(_ + _)
      val discRow = dows.map(y =>
        cAt(y) * afterRange(_ < y)).reduce(_ + _)
      val rowC = dows.map(cAt).reduce(_ + _)
      val aggCols: Seq[Column] = Seq(
        sum(rowC).as("n"),
        sum(concRow).as("conc"),
        sum(discRow).as("disc"),
        sum(rowC * (rowC - 1)).as("tx")) ++
        dows.map(i => max(col(s"tot_$i")).as(s"cc_$i"))
      val agg = withAfter.agg(aggCols.head, aggCols.tail: _*)
      val nD = col("n").cast(DoubleType)
      val n0 = nD * (nD - 1) / 2
      val ty = dows.map(i => col(s"cc_$i") * (col(s"cc_$i") - 1))
        .reduce(_ + _).cast(DoubleType)
      agg.select(col("n").cast(LongType).as("n_total"),
        round((col("conc").cast(DoubleType) - col("disc").cast(DoubleType))
          / sqrt((n0 - col("tx").cast(DoubleType) / 2) * (n0 - ty / 2)), 4)
          .as("tau_b"))
    },

    // ---- #155 exact median with distribution-free CI ------------------------
    // medianExact plus the rank-based (order-statistic) 95% confidence
    // interval: the CI bounds are INTEGER ranks l = max(1, ⌊(n−1.96√n)/2⌋),
    // u = min(n, ⌈1+(n+1.96√n)/2⌉) — n is exact, √n is one scalar IEEE op
    // identical on both engines, and selection is the bank's grain-window
    // rank lookup (mad_exact discipline): facts collapse to the (type,
    // cents) value grain, rank selection rides the grain windows. No float
    // leaves the rank domain, so output cells are exact integer cents.
    "median_ci" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |g AS (SELECT t, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT t, c, cnt,
        |    SUM(cnt) OVER (PARTITION BY t ORDER BY c) AS cum,
        |    SUM(cnt) OVER (PARTITION BY t) AS n
        |  FROM g),
        |r AS (
        |  SELECT t, c, cum, n,
        |    GREATEST(CAST(1 AS BIGINT),
        |      CAST(floor((n - 1.96 * sqrt(n)) / 2) AS BIGINT)) AS lo_r,
        |    LEAST(n, CAST(ceil(1 + (n + 1.96 * sqrt(n)) / 2) AS BIGINT)) AS hi_r
        |  FROM w)
        |SELECT t AS event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  MIN(CASE WHEN 2 * cum >= n THEN c END) AS median_c,
        |  MIN(CASE WHEN cum >= lo_r THEN c END) AS ci_lo_c,
        |  MIN(CASE WHEN cum >= hi_r THEN c END) AS ci_hi_c
        |FROM r GROUP BY t ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .groupBy("t", "c").agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy("t").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = g
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("n", sum("cnt").over(Window.partitionBy("t")))
      val loR = greatest(lit(1L),
        floor((col("n") - lit(1.96) * sqrt(col("n"))) / 2).cast(LongType))
      val hiR = least(col("n"),
        ceil(lit(1) + (col("n") + lit(1.96) * sqrt(col("n"))) / 2)
          .cast(LongType))
      val r = w.withColumn("lo_r", loR).withColumn("hi_r", hiR)
      r.groupBy("t").agg(max("n").cast(LongType).as("n"),
        min(when(lit(2) * col("cum") >= col("n"), col("c"))).as("median_c"),
        min(when(col("cum") >= col("lo_r"), col("c"))).as("ci_lo_c"),
        min(when(col("cum") >= col("hi_r"), col("c"))).as("ci_hi_c"))
        .select(col("t").as("event_type"), col("n"), col("median_c"),
          col("ci_lo_c"), col("ci_hi_c"))
        .orderBy("event_type")
    },

    // ---- #156 trailing-window z-score anomaly screen ------------------------
    // The monitoring-stack anomaly pass: per (type, day) the daily cents
    // total, z-scored against its own trailing 7-day ROWS frame. Facts
    // collapse ONCE to the day grain (the volume-proportional step); the
    // frame statistics then ride windows over GRAIN rows (≤ calendar days
    // per type — bounded by time, not data). Σs² accumulates in
    // DECIMAL(38,0)/HUGEINT (daily totals are corpus-scale; their squares
    // overflow int64 at 100 TB), variance/z is ONE identical IEEE
    // expression both sides → round(·,4); a zero-variance frame yields
    // NULL z on both engines.
    "anomaly_zscore" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |g AS (SELECT t, CAST(d AS BIGINT) AS d, CAST(SUM(c) AS BIGINT) AS s
        |      FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT t, d, s,
        |    CAST(SUM(s) OVER tw AS BIGINT) AS sw,
        |    CAST(SUM(CAST(s AS HUGEINT) * s) OVER tw AS DOUBLE) AS sww,
        |    CAST(COUNT(*) OVER tw AS BIGINT) AS k
        |  FROM g
        |  WINDOW tw AS (PARTITION BY t ORDER BY d
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT t AS event_type, d, s,
        |  round(CASE WHEN sww - CAST(sw AS DOUBLE) * sw / k > 0 THEN
        |    (s - CAST(sw AS DOUBLE) / k)
        |    / sqrt((sww - CAST(sw AS DOUBLE) * sw / k) / (k - 1)) END, 4) AS z
        |FROM w WHERE k = 7 ORDER BY t, d""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), epochDay.as("d"), centsL.as("c"))
        .groupBy("t", "d").agg(sum("c").cast(LongType).as("s"))
      val tw = Window.partitionBy("t").orderBy("d").rowsBetween(-6, 0)
      val w = g
        .withColumn("sw", sum("s").over(tw).cast(LongType))
        .withColumn("sww",
          sum(col("s").cast(big) * col("s")).over(tw).cast(DoubleType))
        .withColumn("k", count(lit(1)).over(tw).cast(LongType))
      val swD = col("sw").cast(DoubleType)
      val varN = col("sww") - swD * col("sw") / col("k")
      val z = when(varN > 0,
        (col("s") - swD / col("k")) / sqrt(varN / (col("k") - 1)))
      w.filter(col("k") === 7)
        .select(col("t").as("event_type"), col("d"), col("s"),
          round(z, 4).as("z"))
        .orderBy("event_type", "d")
    }
  )
}
