package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, sixth batch (#181-#183) — dispersion,
  * retention-curve, and gap-survival analytics. Same discipline: one fact
  * collapse, grain windows / conditional partial aggs, exact integers to
  * the boundary, ONE IEEE chain → round(·,4).
  */
object AnalyticsR8g {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val big = DecimalType(38, 0)
  private val epochDay = datediff(col("ts").cast(DateType),
    to_date(lit("1970-01-01"))).cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #181 burstiness (Fano factor / index of dispersion) ---------------
    // Per type: is daily volume Poisson-like (Fano ≈ 1) or bursty
    // (Fano ≫ 1)? Facts collapse ONCE to the day grain; the population
    // variance comes from exact DECIMAL(38,0)/HUGEINT power sums over
    // grain rows (calendar-bounded); Fano = var/mean and CV are ONE IEEE
    // chain → round(·,4).
    "burstiness" -> OpDef(
      """WITH g AS (
        |  SELECT event_type AS t,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(n AS HUGEINT)) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(n AS HUGEINT) * n) AS DOUBLE) AS q
        |  FROM g GROUP BY 1)
        |SELECT t AS event_type, k AS n_days,
        |  round(s / k, 4) AS mean_daily,
        |  round((q / k - (s / k) * (s / k)) / (s / k), 4) AS fano,
        |  round(sqrt(q / k - (s / k) * (s / k)) / (s / k), 4) AS cv
        |FROM m ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), epochDay.as("d"))
        .groupBy("t", "d").agg(count(lit(1)).as("n"))
      val m = g.groupBy("t").agg(
        count(lit(1)).cast(LongType).as("k"),
        sum(col("n").cast(big)).cast(DoubleType).as("s"),
        sum(col("n").cast(big) * col("n")).cast(DoubleType).as("q"))
      val mean = col("s") / col("k")
      val varP = col("q") / col("k") - mean * mean
      m.select(col("t").as("event_type"), col("k").as("n_days"),
        round(mean, 4).as("mean_daily"),
        round(varP / mean, 4).as("fano"),
        round(sqrt(varP) / mean, 4).as("cv"))
        .orderBy("event_type")
    },

    // ---- #182 day-offset retention curve -----------------------------------
    // curve(o) = share of all users active o days after their own first
    // day — the cohortless retention curve (cohort_retention's (cohort ×
    // offset) matrix folded to its marginal). The user_newness shape: the
    // distinct day set AND the first day come from ONE user-keyed
    // aggregate (single exchange, calendar-bounded list) and offsets
    // explode from grain rows. The population size needs NO second pass:
    // every user is active at offset 0, so total ≡ n_active(0) — read by
    // a window over the ≤calendar-sized offset grain. One scan, zero
    // joins. Integers + one divide → round(·,4).
    "retention_curve" -> OpDef(
      """WITH dd AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |f AS (
        |  SELECT user_id, d - MIN(d) OVER (PARTITION BY user_id) AS o
        |  FROM dd),
        |g AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1)
        |SELECT CAST(o AS BIGINT) AS day_offset, n AS n_active,
        |  round(CAST(n AS DOUBLE)
        |    / MAX(CASE WHEN o = 0 THEN n END) OVER (), 4) AS retention
        |FROM g ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val byUser = tbl(s, dir, "events")
        .select(col("user_id"), epochDay.as("d"))
        .groupBy("user_id")
        .agg(array_distinct(collect_list("d")).as("days"))
      val g = byUser
        .select(explode(col("days")).as("d"),
          array_min(col("days")).as("first_d"))
        .select((col("d") - col("first_d")).as("o"))
        .groupBy("o").agg(count(lit(1)).as("n"))
      val total = max(when(col("o") === 0, col("n")))
        .over(Window.partitionBy())
      g.select(col("o").cast(LongType).as("day_offset"),
          col("n").cast(LongType).as("n_active"),
          round(col("n").cast(DoubleType) / total, 4).as("retention"))
        .orderBy("day_offset")
    },

    // ---- #183 inter-event gap survival function ----------------------------
    // S(h) = P(gap > h) per type at the five standard horizons (1 min,
    // 5 min, 30 min, 1 h, 6 h) — the tail view of interarrival_quantiles
    // and the direct input to timeout/session-gap tuning. The lag rides
    // ONE hashpartitioning(user_id) exchange; ALL horizons ride ONE
    // conditional partial agg (value_cdf_probes discipline) and stack by
    // inline explode. Exact integer µs comparisons; one divide →
    // round(·,4).
    "gap_survival" -> OpDef(
      """WITH e AS (
        |  SELECT event_type AS t, user_id, epoch_us(ts) AS us, event_id
        |  FROM events),
        |l AS (
        |  SELECT t, us - lag(us) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |  FROM e),
        |f AS (SELECT t, gap_us FROM l WHERE gap_us IS NOT NULL),
        |m AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(CASE WHEN gap_us > 60000000 THEN 1 END) AS BIGINT) AS gt_60,
        |    CAST(COUNT(CASE WHEN gap_us > 300000000 THEN 1 END) AS BIGINT) AS gt_300,
        |    CAST(COUNT(CASE WHEN gap_us > 1800000000 THEN 1 END) AS BIGINT) AS gt_1800,
        |    CAST(COUNT(CASE WHEN gap_us > 3600000000 THEN 1 END) AS BIGINT) AS gt_3600,
        |    CAST(COUNT(CASE WHEN gap_us > 21600000000 THEN 1 END) AS BIGINT) AS gt_21600
        |  FROM f GROUP BY 1),
        |u AS (
        |  SELECT t, n, 60 AS horizon_s, gt_60 AS n_gt FROM m
        |  UNION ALL SELECT t, n, 300, gt_300 FROM m
        |  UNION ALL SELECT t, n, 1800, gt_1800 FROM m
        |  UNION ALL SELECT t, n, 3600, gt_3600 FROM m
        |  UNION ALL SELECT t, n, 21600, gt_21600 FROM m)
        |SELECT t AS event_type, CAST(horizon_s AS BIGINT) AS horizon_s, n_gt,
        |  round(CAST(n_gt AS DOUBLE) / n, 4) AS survival
        |FROM u ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val horizons = Seq(60L, 300L, 1800L, 3600L, 21600L)
      val lagW = Window.partitionBy("user_id").orderBy("us", "event_id")
      val f = tbl(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id"),
          expr("unix_micros(ts)").as("us"), col("event_id"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(lagW))
        .filter(col("gap_us").isNotNull)
      val m = f.groupBy("t")
        .agg(count(lit(1)).as("n"),
          horizons.map(h =>
            count(when(col("gap_us") > h * 1000000L, 1)).as(s"gt_$h")): _*)
      m.select(col("t"), col("n"), explode(array(horizons.map(h =>
          struct(lit(h).as("horizon_s"), col(s"gt_$h").as("n_gt"))): _*)).as("p"))
        .select(col("t").as("event_type"),
          col("p.horizon_s").cast(LongType).as("horizon_s"),
          col("p.n_gt").cast(LongType).as("n_gt"),
          round(col("p.n_gt").cast(DoubleType) / col("n"), 4).as("survival"))
        .orderBy("event_type", "horizon_s")
    }
  )
}
