package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, fifth batch (#178-#180) — seasonality
  * factors, user-newness decomposition, and the Hill tail-index estimator.
  * Same discipline throughout: one fact collapse, grain windows, exact
  * integers to the boundary, ONE IEEE chain → round(·,4).
  */
object AnalyticsR8f {

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

    // ---- #178 day-of-week seasonality factors ------------------------------
    // factor(t, dow) = mean(cents | t, dow) / mean(cents | t) — the
    // multiplicative weekday profile behind seasonal baselines (the
    // deseasonalization twin of hour_profile's count shares). ONE collapse
    // to the ≤35-cell (type, dow) grain; the type margin rides a grain
    // window; both means are exact-integer ratios, the factor is ONE
    // IEEE chain → round(·,4).
    "dow_seasonality" -> OpDef(
      """WITH g AS (
        |  SELECT event_type AS t, date_part('dow', CAST(ts AS DATE)) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT t, CAST(dow AS BIGINT) AS dow, n, s,
        |    CAST(SUM(n) OVER (PARTITION BY t) AS BIGINT) AS nt,
        |    CAST(SUM(CAST(s AS HUGEINT)) OVER (PARTITION BY t) AS BIGINT) AS st
        |  FROM g)
        |SELECT t AS event_type, dow, n,
        |  round((CAST(s AS DOUBLE) / n)
        |    / (CAST(st AS DOUBLE) / nt), 4) AS factor
        |FROM w ORDER BY t, dow""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"),
          (dayofweek(col("ts").cast(DateType)) - 1).cast(LongType).as("dow"))
        .agg(count(lit(1)).as("n"), sum(centsL).cast(LongType).as("s"))
      val tp = Window.partitionBy("t")
      val w = g
        .withColumn("nt", sum("n").over(tp).cast(LongType))
        .withColumn("st", sum(col("s").cast(big)).over(tp).cast(LongType))
      w.select(col("t").as("event_type"), col("dow"), col("n"),
        round((col("s").cast(DoubleType) / col("n"))
          / (col("st").cast(DoubleType) / col("nt")), 4).as("factor"))
        .orderBy("event_type", "dow")
    },

    // ---- #179 new-vs-returning user decomposition --------------------------
    // Per day: active users, first-seen-today users, returning users, and
    // the new-user share — the growth-accounting pass every product
    // dashboard leads with. Facts collapse to the distinct (user, day)
    // grain; each user's first day is a min window on the SAME
    // hashpartitioning(user) clustering; the day collapse is the only
    // second exchange. Pure integers + one divide → round(·,4).
    "user_newness" -> OpDef(
      """WITH dd AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |f AS (
        |  SELECT user_id, d,
        |    MIN(d) OVER (PARTITION BY user_id) AS first_d
        |  FROM dd)
        |SELECT CAST(d AS BIGINT) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS active_users,
        |  CAST(COUNT(CASE WHEN d = first_d THEN 1 END) AS BIGINT) AS new_users,
        |  CAST(COUNT(CASE WHEN d > first_d THEN 1 END) AS BIGINT)
        |    AS returning_users,
        |  round(CAST(COUNT(CASE WHEN d = first_d THEN 1 END) AS DOUBLE)
        |    / COUNT(*), 4) AS new_ratio
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      // ONE user exchange: per-user distinct day set + first day come from
      // the same groupBy (a (user,day)-keyed distinct + user-keyed window
      // would exchange twice); the day list is calendar-bounded per user.
      val byUser = tbl(s, dir, "events")
        .select(col("user_id"), epochDay.as("d"))
        .groupBy("user_id")
        .agg(array_distinct(collect_list("d")).as("days"))
      val f = byUser.select(explode(col("days")).as("d"),
        array_min(col("days")).as("first_d"))
      f.groupBy("d").agg(
        count(lit(1)).cast(LongType).as("active_users"),
        count(when(col("d") === col("first_d"), 1)).cast(LongType)
          .as("new_users"),
        count(when(col("d") > col("first_d"), 1)).cast(LongType)
          .as("returning_users"),
        round(count(when(col("d") === col("first_d"), 1)).cast(DoubleType)
          / count(lit(1)), 4).as("new_ratio"))
        .orderBy("d")
    },

    // ---- #180 Hill tail-index estimator ------------------------------------
    // α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1-ish)) over the k = 100 largest cents
    // per type — the standard power-law tail-heaviness estimator (is this
    // type's spend distribution Pareto-like?). The top-k multiset is
    // selected on the (type, cents) VALUE GRAIN with clamp arithmetic
    // (trimmed_mean discipline, from the top): each grain row contributes
    // min(cnt, k − cumAbove) copies — facts never sort, rank windows ride
    // per-type grain partitions. x_ref = the k-th largest (nearest-rank).
    // The ≤k-term ln fold → round(·,4) clamp.
    "hill_tail" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
        |g AS (SELECT t, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT t, c, cnt,
        |    COALESCE(SUM(cnt) OVER (PARTITION BY t ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above,
        |    SUM(cnt) OVER (PARTITION BY t) AS n
        |  FROM g),
        |sel AS (
        |  SELECT t, c,
        |    GREATEST(0, LEAST(cnt, 100 - above)) AS take,
        |    COALESCE(MAX(CASE WHEN above + cnt >= 100 THEN c END)
        |      OVER (PARTITION BY t), MIN(c) OVER (PARTITION BY t)) AS x_ref,
        |    n
        |  FROM w)
        |SELECT t AS event_type, CAST(SUM(take) AS BIGINT) AS k_eff,
        |  CAST(MAX(x_ref) AS BIGINT) AS x_ref_c,
        |  round(SUM(take) / NULLIF(SUM(take * ln(CAST(c AS DOUBLE) / x_ref)), 0),
        |    4) AS hill_alpha
        |FROM sel WHERE take > 0 GROUP BY t ORDER BY t""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .filter(col("c") > 0)
        .groupBy("t", "c").agg(count(lit(1)).as("cnt"))
      val desc = Window.partitionBy("t").orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val tp = Window.partitionBy("t")
      val w = g
        .withColumn("above", coalesce(sum("cnt").over(desc), lit(0L)))
        .withColumn("n", sum("cnt").over(tp))
      val sel = w
        .withColumn("take",
          greatest(lit(0L), least(col("cnt"), lit(100L) - col("above"))))
        .withColumn("x_ref",
          // the k-th largest = the LARGEST c whose inclusive from-the-top
          // cumulative reaches k (every later row also qualifies — min
          // would pick the distribution's smallest value). A type with
          // FEWER than k=100 grain rows has no such c; k=min(100,n) then
          // selects everything and the k-th largest is the minimum — the
          // COALESCE fallback (without it, x_ref is NULL and hill_alpha
          // silently NULLs while k_eff still reports the clamped count)
          coalesce(max(when(col("above") + col("cnt") >= 100, col("c"))).over(tp),
            min("c").over(tp)))
      sel.filter(col("take") > 0)
        .groupBy("t").agg(
          sum("take").cast(LongType).as("k_eff"),
          max("x_ref").cast(LongType).as("x_ref_c"),
          sum(col("take") * log(col("c").cast(DoubleType) / col("x_ref")))
            .as("lnsum"))
        .select(col("t").as("event_type"), col("k_eff"), col("x_ref_c"),
          // NULLIF guard: a single-distinct-value group folds ln(1)=0 —
          // NULL (both engines) beats an engine-dependent div-by-zero
          round(when(col("lnsum") =!= 0.0,
            col("k_eff").cast(DoubleType) / col("lnsum")), 4).as("hill_alpha"))
        .orderBy("event_type")
    }
  )
}
