package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2/§2.3 round-8 additions, third batch (#170-#173) — one-pass
  * multi-feature moments, exact windowed medians, Theil inequality, and
  * corpus length profiling. Same discipline: one collapse, grain windows,
  * exact integers to the boundary, ONE IEEE chain → round(·,4).
  */
object AnalyticsR8d {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val big = DecimalType(38, 0)
  private val kProp = get_json_object(col("props"), "$.k").cast(LongType)
  private val centsL =
    (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
  private val epochDay = datediff(col("ts").cast(DateType),
    to_date(lit("1970-01-01"))).cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #170 pairwise covariance/correlation matrix -----------------------
    // All three feature pairs of (value-cents, k-prop, hour-of-day) from
    // ONE partial-agg exchange carrying 10 exact scalars (n + 3 sums + 3
    // squares + 3 cross products, DECIMAL(38,0)/HUGEINT — cross products
    // of corpus-scale sums overflow int64 at 100 TB). The naive
    // per-pair corr() rescans the fact 3×; this is the diagnose-vs-reread
    // trade the moment bank already makes (linreg_fit_stats discipline).
    // Population cov/corr are ONE IEEE chain on the 1-row result,
    // stacked to 3 pair rows by an inline explode → round(·,4).
    "cov_corr_matrix" -> OpDef(
      """WITH f AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    CAST(json_extract_string(props, 'k') AS BIGINT) AS k,
        |    date_part('hour', ts) AS h
        |  FROM events
        |  WHERE json_extract_string(props, 'k') IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(v AS HUGEINT)) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(k AS HUGEINT)) AS DOUBLE) AS sk,
        |    CAST(SUM(CAST(h AS HUGEINT)) AS DOUBLE) AS sh,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS svv,
        |    CAST(SUM(CAST(k AS HUGEINT) * k) AS DOUBLE) AS skk,
        |    CAST(SUM(CAST(h AS HUGEINT) * h) AS DOUBLE) AS shh,
        |    CAST(SUM(CAST(v AS HUGEINT) * k) AS DOUBLE) AS svk,
        |    CAST(SUM(CAST(v AS HUGEINT) * h) AS DOUBLE) AS svh,
        |    CAST(SUM(CAST(k AS HUGEINT) * h) AS DOUBLE) AS skh
        |  FROM f),
        |u AS (
        |  SELECT 'k_h' AS pair, n, sk AS sx, sh AS sy, skk AS sxx,
        |    shh AS syy, skh AS sxy FROM m
        |  UNION ALL SELECT 'v_h', n, sv, sh, svv, shh, svh FROM m
        |  UNION ALL SELECT 'v_k', n, sv, sk, svv, skk, svk FROM m)
        |SELECT pair, n,
        |  round((sxy - sx * sy / n) / n, 4) AS cov_pop,
        |  round(CASE WHEN (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
        |    THEN (sxy - sx * sy / n)
        |      / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) END, 4)
        |    AS corr
        |FROM u ORDER BY pair""".stripMargin
    ) { (s, dir) =>
      val f = tbl(s, dir, "events")
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(centsL.as("v"), kProp.as("k"),
          hour(col("ts")).cast(LongType).as("h"))
      def sd(c: Column): Column = sum(c.cast(big)).cast(DoubleType)
      val m = f.agg(count(lit(1)).cast(LongType).as("n"),
        sd(col("v")).as("sv"), sd(col("k")).as("sk"), sd(col("h")).as("sh"),
        sum(col("v").cast(big) * col("v")).cast(DoubleType).as("svv"),
        sum(col("k").cast(big) * col("k")).cast(DoubleType).as("skk"),
        sum(col("h").cast(big) * col("h")).cast(DoubleType).as("shh"),
        sum(col("v").cast(big) * col("k")).cast(DoubleType).as("svk"),
        sum(col("v").cast(big) * col("h")).cast(DoubleType).as("svh"),
        sum(col("k").cast(big) * col("h")).cast(DoubleType).as("skh"))
      val u = m.select(explode(array(
          struct(lit("k_h").as("pair"), col("n"), col("sk").as("sx"),
            col("sh").as("sy"), col("skk").as("sxx"), col("shh").as("syy"),
            col("skh").as("sxy")),
          struct(lit("v_h").as("pair"), col("n"), col("sv").as("sx"),
            col("sh").as("sy"), col("svv").as("sxx"), col("shh").as("syy"),
            col("svh").as("sxy")),
          struct(lit("v_k").as("pair"), col("n"), col("sv").as("sx"),
            col("sk").as("sy"), col("svv").as("sxx"), col("skk").as("syy"),
            col("svk").as("sxy")))).as("p"))
        .select(col("p.*"))
      val nD = col("n").cast(DoubleType)
      val (vx, vy) = (col("sxx") - col("sx") * col("sx") / nD,
        col("syy") - col("sy") * col("sy") / nD)
      val cxy = col("sxy") - col("sx") * col("sy") / nD
      u.select(col("pair"), col("n"),
        round(cxy / nD, 4).as("cov_pop"),
        round(when(vx > 0 && vy > 0, cxy / sqrt(vx * vy)), 4).as("corr"))
        .orderBy("pair")
    },

    // ---- #171 trailing-7-day exact moving median ---------------------------
    // Exact lower-median of each type's daily cents totals over a trailing
    // 7-row frame — the robust twin of anomaly_zscore's mean/σ screen.
    // Facts collapse ONCE to the day grain; the frame median is
    // sort_array(collect_list) over ≤7 BIGINTs per grain row (constant
    // work, rides the same hashpartitioning(t) window exchange).
    // Integer cents end to end — no float, no clamp.
    "moving_median_7d" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |g AS (SELECT t, CAST(d AS BIGINT) AS d, CAST(SUM(c) AS BIGINT) AS s
        |      FROM f GROUP BY 1, 2)
        |SELECT t AS event_type, d, s,
        |  CAST(quantile_disc(s, 0.5) OVER (PARTITION BY t ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS med7
        |FROM g ORDER BY t, d""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), epochDay.as("d"), centsL.as("c"))
        .groupBy("t", "d").agg(sum("c").cast(LongType).as("s"))
      val tw = Window.partitionBy("t").orderBy("d").rowsBetween(-6, 0)
      val arr = sort_array(collect_list("s").over(tw))
      g.withColumn("med7",
          element_at(arr, ((size(arr) + 1) / 2).cast(IntegerType))
            .cast(LongType))
        .select(col("t").as("event_type"), col("d"), col("s"), col("med7"))
        .orderBy("event_type", "d")
    },

    // ---- #172 Theil T inequality index -------------------------------------
    // T = (1/n) Σ (x/μ) ln(x/μ) per type over positive cents — the
    // decomposable inequality index next to gini_inequality (#158).
    // Facts collapse to the (type, cents) value grain; the fold weights
    // each grain row by its count, so the ln fold runs over GRAIN rows
    // (≤49k), not facts; μ is an exact-integer ratio evaluated once in
    // double — identical IEEE both engines; round(·,4) clamp.
    "theil_index" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
        |g AS (SELECT t, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM f GROUP BY 1, 2),
        |m AS (
        |  SELECT t, c, cnt,
        |    CAST(SUM(CAST(cnt AS HUGEINT)) OVER (PARTITION BY t) AS BIGINT)
        |      AS n,
        |    CAST(SUM(CAST(c AS HUGEINT) * cnt) OVER (PARTITION BY t)
        |      AS DOUBLE) AS sx
        |  FROM g)
        |SELECT t AS event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  round(SUM(cnt * (c / (sx / n)) * ln(c / (sx / n))) / MAX(n), 4)
        |    AS theil_t
        |FROM m GROUP BY t ORDER BY t""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .filter(col("c") > 0)
        .groupBy("t", "c").agg(count(lit(1)).as("cnt"))
      val tp = Window.partitionBy("t")
      val m = g
        .withColumn("n", sum(col("cnt").cast(big)).over(tp).cast(LongType))
        .withColumn("sx",
          sum(col("c").cast(big) * col("cnt")).over(tp).cast(DoubleType))
      val mu = col("sx") / col("n")
      val ratio = col("c") / mu
      m.groupBy("t").agg(max("n").cast(LongType).as("n"),
        round(sum(col("cnt") * ratio * log(ratio)) / max("n"), 4)
          .as("theil_t"))
        .select(col("t").as("event_type"), col("n"), col("theil_t"))
        .orderBy("event_type")
    },

    // ---- #173 document length profile --------------------------------------
    // Per (lang, source): doc count, total chars, exact p50/p90 of the
    // n_chars distribution — the corpus shape profile curation dashboards
    // lead with. The length grain collapse and BOTH rank windows ride one
    // hashpartitioning(lang, source) clustering; nearest-rank selection
    // (mad_exact discipline); pure integers.
    "doc_length_stats" -> OpDef(
      """WITH g AS (
        |  SELECT lang, source, n_chars AS len,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT lang, source, len, cnt,
        |    SUM(cnt) OVER (PARTITION BY lang, source ORDER BY len) AS cum,
        |    SUM(cnt) OVER (PARTITION BY lang, source) AS n,
        |    SUM(CAST(len AS HUGEINT) * cnt)
        |      OVER (PARTITION BY lang, source) AS tot
        |  FROM g)
        |SELECT lang, source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  CAST(MAX(tot) AS BIGINT) AS total_chars,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN len END) AS BIGINT)
        |    AS p50_len,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.90 * n) THEN len END) AS BIGINT)
        |    AS p90_len
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "documents")
        .groupBy(col("lang"), col("source"), col("n_chars").as("len"))
        .agg(count(lit(1)).as("cnt"))
      val part = Window.partitionBy("lang", "source")
      val cumW = part.orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = g
        .withColumn("cum", sum("cnt").over(cumW))
        .withColumn("n", sum("cnt").over(part))
        .withColumn("tot",
          sum(col("len").cast(big) * col("cnt")).over(part))
      def sel(q: Double): Column =
        min(when(col("cum") >= ceil(lit(q) * col("n")), col("len")))
          .cast(LongType)
      w.groupBy("lang", "source").agg(
        max("n").cast(LongType).as("n_docs"),
        max("tot").cast(LongType).as("total_chars"),
        sel(0.50).as("p50_len"), sel(0.90).as("p90_len"))
        .orderBy("lang", "source")
    }
  )
}
