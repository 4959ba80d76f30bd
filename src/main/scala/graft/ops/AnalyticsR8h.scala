package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, seventh batch (#184-#186) — behavioral
  * entropy, engagement histogram, and revenue concentration. Same
  * discipline: one fact collapse, grain windows / clamp arithmetic,
  * exact integers to the boundary, ONE IEEE chain → round(·,4).
  */
object AnalyticsR8h {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val big = DecimalType(38, 0)
  private val centsL =
    (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
  private val epochDay = datediff(col("ts").cast(DateType),
    to_date(lit("1970-01-01"))).cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #184 Markov conditional entropy -----------------------------------
    // H(next | prev) per prev_type over the user-stream transition matrix
    // (#169's information-theoretic summary): how predictable is the next
    // event given the current one? The lag rides ONE
    // hashpartitioning(user_id) exchange; pairs collapse to the ≤25-cell
    // grain; the margin is a grain window; the ≤5-term ln fold per prev →
    // round(·,4) clamp (entropy_agg discipline).
    "markov_entropy" -> OpDef(
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_us(ts) AS us, event_id
        |  FROM events),
        |l AS (
        |  SELECT t AS cur, lag(t) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |c AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT prev, n,
        |    CAST(SUM(n) OVER (PARTITION BY prev) AS BIGINT) AS np
        |  FROM c)
        |SELECT prev AS prev_type, CAST(MAX(np) AS BIGINT) AS n_pairs,
        |  round(SUM(-(CAST(n AS DOUBLE) / np) * ln(CAST(n AS DOUBLE) / np)),
        |    4) AS h_cond
        |FROM w GROUP BY prev ORDER BY prev""".stripMargin
    ) { (s, dir) =>
      val lagW = Window.partitionBy("user_id").orderBy("us", "event_id")
      val l = tbl(s, dir, "events")
        .select(col("user_id"), col("event_type").as("cur"),
          expr("unix_micros(ts)").as("us"), col("event_id"))
        .withColumn("prev", lag(col("cur"), 1).over(lagW))
        .filter(col("prev").isNotNull)
      val c = l.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
      val w = c.withColumn("np",
        sum("n").over(Window.partitionBy("prev")).cast(LongType))
      val p = col("n").cast(DoubleType) / col("np")
      w.groupBy("prev").agg(
          max("np").cast(LongType).as("n_pairs"),
          round(sum(-p * log(p)), 4).as("h_cond"))
        .select(col("prev").as("prev_type"), col("n_pairs"), col("h_cond"))
        .orderBy("prev_type")
    },

    // ---- #185 active-days engagement histogram -----------------------------
    // How many users were active exactly k distinct days? The engagement
    // frequency histogram behind DAU/MAU-style stickiness. ONE user-keyed
    // aggregate builds the distinct day count (calendar-bounded), the
    // histogram is a second ≤calendar-sized collapse, and the share rides
    // a grain window. Pure integers + one divide → round(·,4).
    "active_days_hist" -> OpDef(
      """WITH dd AS (
        |  SELECT user_id, CAST(COUNT(DISTINCT
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS BIGINT)
        |    AS k
        |  FROM events GROUP BY 1),
        |g AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_users FROM dd GROUP BY 1)
        |SELECT k AS n_days_active, n_users,
        |  round(CAST(n_users AS DOUBLE) / SUM(n_users) OVER (), 4) AS share
        |FROM g ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      // size(array_distinct(collect_list)) = ONE user exchange; a
      // countDistinct agg would plan the (user, d) pre-distinct as a
      // second exchange. The list is calendar-bounded per user.
      val dd = tbl(s, dir, "events")
        .select(col("user_id"), epochDay.as("d"))
        .groupBy("user_id")
        .agg(size(array_distinct(collect_list("d"))).cast(LongType).as("k"))
      val g = dd.groupBy("k").agg(count(lit(1)).as("n_users"))
      g.select(col("k").cast(LongType).as("n_days_active"),
          col("n_users").cast(LongType).as("n_users"),
          round(col("n_users").cast(DoubleType)
            / sum("n_users").over(Window.partitionBy()), 4).as("share"))
        .orderBy("n_days_active")
    },

    // ---- #186 revenue concentration (Pareto / 80-20 curve) -----------------
    // Share of total revenue carried by the top 1% / 5% / 10% of users by
    // spend — THE concentration read-out next to gini_inequality. User
    // totals collapse on ONE user exchange (exact cents); the top-p%
    // multisets are selected on the (user-total cents) VALUE GRAIN with
    // clamp arithmetic (hill_tail discipline — user rows never sort);
    // all three cuts ride the SAME grain windows. The grain is
    // CapacityPins-audited (distinct 2-dp user totals). Products in
    // DECIMAL(38,0)/HUGEINT; one divide per row → round(·,4).
    "revenue_concentration" -> OpDef(
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |g AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY 1),
        |w AS (
        |  SELECT c, cnt,
        |    COALESCE(SUM(cnt) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above,
        |    CAST(SUM(cnt) OVER () AS BIGINT) AS nu,
        |    CAST(SUM(CAST(c AS HUGEINT) * cnt) OVER () AS DOUBLE) AS tot
        |  FROM g),
        |p AS (
        |  SELECT * FROM (VALUES (1), (5), (10)) AS v(pct)),
        |s AS (
        |  SELECT p.pct, w.nu, w.tot,
        |    GREATEST(0, LEAST(w.cnt,
        |      CAST(ceil(p.pct * w.nu / 100.0) AS BIGINT) - w.above)) AS take,
        |    w.c
        |  FROM w CROSS JOIN p)
        |SELECT CAST(pct AS BIGINT) AS pct,
        |  CAST(SUM(take) AS BIGINT) AS n_users_top,
        |  round(CAST(SUM(CAST(c AS HUGEINT) * take) AS DOUBLE) / MAX(tot), 4)
        |    AS revenue_share
        |FROM s GROUP BY pct ORDER BY pct""".stripMargin
    ) { (s, dir) =>
      val u = tbl(s, dir, "events")
        .select(col("user_id"), centsL.as("c"))
        .groupBy("user_id").agg(sum("c").cast(LongType).as("c"))
      val g = u.groupBy("c").agg(count(lit(1)).as("cnt"))
      val desc = Window.orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val all = Window.partitionBy()
      val w = g
        .withColumn("above", coalesce(sum("cnt").over(desc), lit(0L)))
        .withColumn("nu", sum("cnt").over(all).cast(LongType))
        .withColumn("tot",
          sum(col("c").cast(big) * col("cnt")).over(all).cast(DoubleType))
      val pcts = Seq(1, 5, 10)
      val stacked = w.select(col("c"), col("cnt"), col("above"), col("nu"),
          col("tot"), explode(array(pcts.map(p => lit(p)): _*)).as("pct"))
        .withColumn("take",
          greatest(lit(0L), least(col("cnt"),
            ceil(col("pct") * col("nu") / lit(100.0)).cast(LongType)
              - col("above"))))
      stacked.groupBy("pct").agg(
          sum("take").cast(LongType).as("n_users_top"),
          round(sum(col("c").cast(big) * col("take")).cast(DoubleType)
            / max("tot"), 4).as("revenue_share"))
        .select(col("pct").cast(LongType).as("pct"), col("n_users_top"),
          col("revenue_share"))
        .orderBy("pct")
    }
  )
}
