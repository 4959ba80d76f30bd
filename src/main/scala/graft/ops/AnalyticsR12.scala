package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftSession, OpDef}
import graft.sources.Tables

/** SURVEY §2 #286-#289 — r12 additions: risk-adjusted rolling series,
  * variance-homogeneity testing, forecast-skill scoring, and cross-source
  * vocabulary overlap.
  *
  * Same parity discipline as the rest of the bank (SURVEY §5): every
  * accumulated amount folds in exact decimals; doubles appear only in a
  * final IEEE chain that is spelled identically on both engines;
  * order-dependent float folds get a `round(·, k)` clamp at the output
  * boundary only.
  */
object AnalyticsR12 {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  /** Integer epoch-day of the event timestamp (exact on both engines). */
  private val epochDay =
    datediff(col("ts").cast(DateType), to_date(lit("1970-01-01")))
      .cast(LongType)

  private val epochDaySql =
    "datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"

  val defs: Map[String, OpDef] = Map(
    // ---- #286 trailing-7-day rolling Sharpe per instrument ----------------
    // The risk read-out a market sink keeps live over #262's bars: daily
    // net flow per event_type, then mean/σ of the trailing 7-day window,
    // sharpe = mean/σ. The daily grain collapses FIRST (one exchange on
    // (type, day) with map-side partials, exact DECIMAL(18,2) flows and
    // DECIMAL x² cells); the RANGE frame then rides the ≤ |types|×|days|
    // cell grain — a bounded RANGE window on an integer day key, NEVER a
    // self-join on a date inequality, so the 100 TB plan is one cell-grain
    // exchange regardless of event count. Moments stay decimal inside the
    // frame; the mean/var/sqrt chain is one identical IEEE sequence on both
    // engines → round(·, 4). Windows with < 3 days or zero variance drop
    // under the same exact predicates.
    "rolling_sharpe" -> OpDef(
      s"""WITH daily AS (
         |  SELECT event_type AS t, $epochDaySql AS d,
         |    SUM(CAST("value" AS DECIMAL(18,2))) AS v
         |  FROM events GROUP BY 1, 2),
         |cells AS (SELECT t, d, v, v * v AS v2 FROM daily),
         |win AS (
         |  SELECT t, d,
         |    CAST(COUNT(*) OVER w AS BIGINT) AS n_days,
         |    SUM(v) OVER w AS s, SUM(v2) OVER w AS q
         |  FROM cells
         |  WINDOW w AS (PARTITION BY t ORDER BY d
         |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
         |st AS (
         |  SELECT t, d, n_days, CAST(s AS DOUBLE) AS sd, CAST(q AS DOUBLE) AS qd
         |  FROM win WHERE n_days >= 3),
         |v AS (
         |  SELECT t, d, n_days, sd,
         |    (qd - sd * sd / n_days) / (n_days - 1) AS var
         |  FROM st)
         |SELECT t AS event_type, d AS day, n_days,
         |  round((sd / n_days) / sqrt(var), 4) AS sharpe
         |FROM v WHERE var > 0
         |ORDER BY event_type, day""".stripMargin
    ) { (s, dir) =>
      val daily = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"), epochDay.as("d"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("v"))
        .withColumn("v2", col("v") * col("v"))
      val w = Window.partitionBy("t").orderBy("d").rangeBetween(-6, 0)
      daily
        .withColumn("n_days", count(lit(1)).over(w).cast(LongType))
        .withColumn("s", sum("v").over(w))
        .withColumn("q", sum("v2").over(w))
        .filter(col("n_days") >= 3)
        .withColumn("sd", col("s").cast(DoubleType))
        .withColumn("qd", col("q").cast(DoubleType))
        .withColumn("var",
          (col("qd") - col("sd") * col("sd") / col("n_days"))
            / (col("n_days") - 1))
        .filter(col("var") > 0)
        .select(col("t").as("event_type"), col("d").as("day"), col("n_days"),
          round((col("sd") / col("n_days")) / sqrt(col("var")), 4)
            .as("sharpe"))
        .orderBy("event_type", "day")
    },

    // ---- #287 Brown–Forsythe variance-homogeneity test --------------------
    // Levene's test with median centers (the robust form): are the value
    // spreads equal across event types? z_ij = |x_ij − median_j|, W =
    // ((N−k)/(k−1)) · BSS(z)/WSS(z). The per-type EXACT lower median comes
    // from the mad_exact selection move (2-dp value grain + cumulative-count
    // window — one grain exchange, one t-window); the k-row median table
    // then broadcast-joins back onto the raw scan (k = |types|, a constant
    // at any corpus scale), so z folds per ROW with no second fact shuffle
    // beyond the final t-grain moment collapse. All of n/Σz/Σz² are exact
    // decimals; the F chain is the anova_f IEEE sequence → round(·, 4).
    "levene_test" -> OpDef(
      """WITH g AS (
        |  SELECT event_type AS t, CAST("value" AS DECIMAL(18,2)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cw AS (
        |  SELECT t, v, c,
        |    SUM(c) OVER (PARTITION BY t ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY t) AS n
        |  FROM g),
        |med AS (
        |  SELECT t, MIN(v) AS med FROM cw WHERE 2 * cum >= n GROUP BY t),
        |z AS (
        |  SELECT e.event_type AS t,
        |    abs(CAST(e."value" AS DECIMAL(18,2)) - m.med) AS z
        |  FROM events e JOIN med m ON e.event_type = m.t),
        |zg AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS ng,
        |    SUM(z) AS sz, SUM(z * z) AS qz
        |  FROM z GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(sz) AS DOUBLE) AS s, CAST(SUM(qz) AS DOUBLE) AS q,
        |    SUM(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / ng) AS a
        |  FROM zg)
        |SELECT k, n,
        |  round(((a - s * s / n) / (k - 1)) / ((q - a) / (n - k)), 4)
        |    AS w_stat
        |FROM m""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"),
          col("value").cast(DecimalType(18, 2)).as("v"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("t").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("t")
      val med = g
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
        .filter(lit(2) * col("cum") >= col("n"))
        .groupBy("t").agg(min("v").as("med"))
      val z = tbl(s, dir, "events")
        .join(broadcast(med), col("event_type") === col("t"))
        .select(col("t"),
          abs(col("value").cast(DecimalType(18, 2)) - col("med")).as("z"))
      val zg = z.groupBy("t")
        .agg(count(lit(1)).as("ng"), sum("z").as("sz"),
          sum(col("z") * col("z")).as("qz"))
      val m = zg.agg(
        count(lit(1)).as("k"), sum("ng").as("n"),
        sum("sz").cast(DoubleType).as("s"),
        sum("qz").cast(DoubleType).as("q"),
        sum(col("sz").cast(DoubleType) * col("sz").cast(DoubleType)
          / col("ng")).as("a"))
      val k = col("k"); val n = col("n"); val a = col("a")
      m.select(k, n,
        round(((a - col("s") * col("s") / n) / (k - 1))
          / ((col("q") - a) / (n - k)), 4).as("w_stat"))
    },

    // ---- #288 seasonal-naive forecast skill per instrument ----------------
    // How forecastable is each type's daily flow? Score the week-ago
    // seasonal-naive forecast (ŷ_t = y_{t−7 days}) against the yesterday
    // naive (ŷ_t = y_{t−1 day}) on exactly the days where BOTH exist at
    // their true calendar gaps: MAE and RMSE of the seasonal forecast, and
    // MASE = MAE_seasonal / MAE_naive1 (< 1 ⇒ weekly seasonality carries
    // real signal). Daily grain collapse (one exchange), then row-lags on
    // the cell grain with the lagged DAY re-checked (a gap-aware lag: ROWS
    // lag + calendar guard, no self-join); errors fold as exact decimals so
    // MAE and MASE are each ONE double divide chain — no rounding clamp
    // needed beyond round(·, 6) at output; RMSE's sqrt is the only libm
    // step.
    "seasonal_error" -> OpDef(
      s"""WITH daily AS (
         |  SELECT event_type AS t, $epochDaySql AS d,
         |    SUM(CAST("value" AS DECIMAL(18,2))) AS v
         |  FROM events GROUP BY 1, 2),
         |lagd AS (
         |  SELECT t, d, v,
         |    lag(v, 7) OVER w AS y7, lag(d, 7) OVER w AS d7,
         |    lag(v, 1) OVER w AS y1, lag(d, 1) OVER w AS d1
         |  FROM daily WINDOW w AS (PARTITION BY t ORDER BY d)),
         |ev AS (
         |  SELECT t, abs(v - y7) AS e7, (v - y7) * (v - y7) AS sq7,
         |    abs(v - y1) AS e1
         |  FROM lagd WHERE d - d7 = 7 AND d - d1 = 1),
         |ag AS (
         |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_eval,
         |    CAST(SUM(e7) AS DOUBLE) AS se7, CAST(SUM(sq7) AS DOUBLE) AS sq,
         |    CAST(SUM(e1) AS DOUBLE) AS se1
         |  FROM ev GROUP BY 1)
         |SELECT t AS event_type, n_eval,
         |  round(se7 / n_eval, 6) AS mae,
         |  round(sqrt(sq / n_eval), 6) AS rmse,
         |  CASE WHEN se1 > 0 THEN round((se7 / n_eval) / (se1 / n_eval), 6)
         |       END AS mase
         |FROM ag ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val daily = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"), epochDay.as("d"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("v"))
      val w = Window.partitionBy("t").orderBy("d")
      val ev = daily
        .withColumn("y7", lag("v", 7).over(w))
        .withColumn("d7", lag("d", 7).over(w))
        .withColumn("y1", lag("v", 1).over(w))
        .withColumn("d1", lag("d", 1).over(w))
        .filter(col("d") - col("d7") === 7 && col("d") - col("d1") === 1)
        .select(col("t"), abs(col("v") - col("y7")).as("e7"),
          ((col("v") - col("y7")) * (col("v") - col("y7"))).as("sq7"),
          abs(col("v") - col("y1")).as("e1"))
      ev.groupBy("t")
        .agg(count(lit(1)).cast(LongType).as("n_eval"),
          sum("e7").cast(DoubleType).as("se7"),
          sum("sq7").cast(DoubleType).as("sq"),
          sum("e1").cast(DoubleType).as("se1"))
        .select(col("t").as("event_type"), col("n_eval"),
          round(col("se7") / col("n_eval"), 6).as("mae"),
          round(sqrt(col("sq") / col("n_eval")), 6).as("rmse"),
          when(col("se1") > 0,
            round((col("se7") / col("n_eval")) / (col("se1") / col("n_eval")),
              6)).as("mase"))
        .orderBy("event_type")
    },

    // ---- #290 Wald–Wolfowitz runs test on daily up/down moves -------------
    // Is each type's daily flow a random walk, or does it trend/mean-revert?
    // Signs of consecutive-day deltas (zeros and calendar gaps excluded —
    // the delta must be a TRUE 1-day move), runs counted as sign changes
    // over the FILTERED sequence, then the classical z against the
    // random-arrangement null. Daily grain collapse (one exchange) → two
    // cell-grain window passes on the SAME (t, day) ordering (lag for the
    // delta, lag for the previous sign — no new exchange) → per-type
    // integer collapse. Everything is exact integers until the final
    // μ/σ/z chain → round(·, 4).
    "runs_test" -> OpDef(
      s"""WITH daily AS (
         |  SELECT event_type AS t, $epochDaySql AS d,
         |    SUM(CAST("value" AS DECIMAL(18,2))) AS v
         |  FROM events GROUP BY 1, 2),
         |mv AS (
         |  SELECT t, d, v - lag(v) OVER w AS dv, d - lag(d) OVER w AS gap
         |  FROM daily WINDOW w AS (PARTITION BY t ORDER BY d)),
         |sg AS (
         |  SELECT t, d, CASE WHEN dv > 0 THEN 1 ELSE -1 END AS s
         |  FROM mv WHERE gap = 1 AND dv <> 0),
         |runs AS (
         |  SELECT t, s,
         |    CASE WHEN lag(s) OVER (PARTITION BY t ORDER BY d) IS DISTINCT
         |         FROM s THEN 1 ELSE 0 END AS new_run
         |  FROM sg),
         |ag AS (
         |  SELECT t,
         |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dn,
         |    CAST(SUM(new_run) AS BIGINT) AS n_runs
         |  FROM runs GROUP BY 1),
         |st AS (
         |  SELECT t, n_up, n_dn, n_runs,
         |    2.0 * n_up * n_dn / (n_up + n_dn) + 1 AS mu,
         |    2.0 * n_up * n_dn * (2.0 * n_up * n_dn - n_up - n_dn)
         |      / ((n_up + n_dn) * (n_up + n_dn) * (n_up + n_dn - 1.0)) AS var
         |  FROM ag WHERE n_up > 0 AND n_dn > 0 AND n_up + n_dn > 1)
         |SELECT t AS event_type, n_up, n_dn, n_runs,
         |  round((n_runs - mu) / sqrt(var), 4) AS z
         |FROM st WHERE var > 0 ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val daily = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"), epochDay.as("d"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("v"))
      val w = Window.partitionBy("t").orderBy("d")
      val sg = daily
        .withColumn("dv", col("v") - lag("v", 1).over(w))
        .withColumn("gap", col("d") - lag("d", 1).over(w))
        .filter(col("gap") === 1 && col("dv") =!= 0)
        .select(col("t"), col("d"),
          when(col("dv") > 0, lit(1)).otherwise(lit(-1)).as("s"))
      val ag = sg
        .withColumn("new_run",
          when(not(lag("s", 1).over(w) <=> col("s")), lit(1)).otherwise(lit(0)))
        .groupBy("t")
        .agg(sum(when(col("s") === 1, 1).otherwise(0)).cast(LongType)
          .as("n_up"),
          sum(when(col("s") === -1, 1).otherwise(0)).cast(LongType)
            .as("n_dn"),
          sum("new_run").cast(LongType).as("n_runs"))
        .filter(col("n_up") > 0 && col("n_dn") > 0
          && col("n_up") + col("n_dn") > 1)
      val nUp = col("n_up"); val nDn = col("n_dn")
      val mu = lit(2.0) * nUp * nDn / (nUp + nDn) + 1
      val vr = (lit(2.0) * nUp * nDn * (lit(2.0) * nUp * nDn - nUp - nDn)
        / ((nUp + nDn) * (nUp + nDn) * (nUp + nDn - lit(1.0))))
      ag.withColumn("mu", mu).withColumn("var", vr)
        .filter(col("var") > 0)
        .select(col("t").as("event_type"), nUp, nDn, col("n_runs"),
          round((col("n_runs") - col("mu")) / sqrt(col("var")), 4).as("z"))
        .orderBy("event_type")
    },

    // ---- #291 Theil–Sen robust trend slope --------------------------------
    // The median of all pairwise day-slopes of the daily flow — the robust
    // trend line an outlier day can't drag. The pair join runs on the
    // CELL grain (≤ |types| × days² pairs — calendar-bounded, never
    // corpus-quadratic; the same documented regime as interval_overlap's
    // aggregate form), each slope is ONE IEEE divide of exact-decimal
    // numerator by integer day gap (identical bits both engines, so
    // GROUPING BY the double is sound), and the lower median comes from
    // the mad_exact cumulative-count selection — picked, not interpolated,
    // so the output needs NO rounding clamp at all.
    "theil_sen_trend" -> OpDef(
      s"""WITH daily AS (
         |  SELECT event_type AS t, $epochDaySql AS d,
         |    SUM(CAST("value" AS DECIMAL(18,2))) AS v
         |  FROM events GROUP BY 1, 2),
         |pr AS (
         |  SELECT a.t, CAST(b.v - a.v AS DOUBLE) / (b.d - a.d) AS slope
         |  FROM daily a JOIN daily b ON a.t = b.t AND b.d > a.d),
         |g AS (
         |  SELECT t, slope, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM pr GROUP BY 1, 2),
         |cw AS (
         |  SELECT t, slope, c,
         |    SUM(c) OVER (PARTITION BY t ORDER BY slope) AS cum,
         |    SUM(c) OVER (PARTITION BY t) AS n
         |  FROM g)
         |SELECT t AS event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
         |  MIN(slope) AS sen_slope
         |FROM cw WHERE 2 * cum >= n GROUP BY t ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val daily = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"), epochDay.as("d"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("v"))
      val a = daily.select(col("t"), col("d").as("da"), col("v").as("va"))
      val b = daily.select(col("t").as("tb"), col("d").as("db"),
        col("v").as("vb"))
      val pr = a.join(b, col("t") === col("tb") && col("db") > col("da"))
        .select(col("t"),
          ((col("vb") - col("va")).cast(DoubleType) / (col("db") - col("da")))
            .as("slope"))
      val g = pr.groupBy("t", "slope").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("t").orderBy("slope")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("t")
      g.withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
        .filter(lit(2) * col("cum") >= col("n"))
        .groupBy("t")
        .agg(max("n").cast(LongType).as("n_pairs"), min("slope").as("sen_slope"))
        .select(col("t").as("event_type"), col("n_pairs"), col("sen_slope"))
        .orderBy("event_type")
    },

    // ---- #292 Mann–Kendall trend test -------------------------------------
    // The non-parametric companion of #291: S = Σ_{i<j} sign(v_j − v_i)
    // over the daily series, tie-corrected variance, the ±1-continuity z.
    // Same bounded cell-grain pair join as #291 (sign compares exact
    // decimals — no float enters until the z chain); the tie spectrum
    // folds from a (t, v) grain count. Integers throughout; the final
    // var/18, sqrt, divide chain is identical IEEE → round(·, 4); tau is
    // S over the exact pair count.
    "mann_kendall_trend" -> OpDef(
      s"""WITH daily AS (
         |  SELECT event_type AS t, $epochDaySql AS d,
         |    SUM(CAST("value" AS DECIMAL(18,2))) AS v
         |  FROM events GROUP BY 1, 2),
         |sgn AS (
         |  SELECT a.t,
         |    CAST(SUM(CASE WHEN b.v > a.v THEN 1
         |                  WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM daily a JOIN daily b ON a.t = b.t AND b.d > a.d
         |  GROUP BY 1),
         |nn AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1),
         |ties AS (
         |  SELECT t, CAST(COALESCE(SUM(tt * (tt - 1) * (2 * tt + 5)), 0)
         |    AS BIGINT) AS tcorr
         |  FROM (SELECT t, v, CAST(COUNT(*) AS BIGINT) AS tt
         |        FROM daily GROUP BY 1, 2) g
         |  WHERE tt > 1 GROUP BY 1),
         |st AS (
         |  SELECT s.t, s.s, s.n_pairs, nn.n,
         |    (nn.n * (nn.n - 1) * (2 * nn.n + 5)
         |      - COALESCE(ties.tcorr, 0)) / 18.0 AS var
         |  FROM sgn s JOIN nn ON nn.t = s.t
         |  LEFT JOIN ties ON ties.t = s.t)
         |SELECT t AS event_type, n, s, n_pairs,
         |  round(CAST(s AS DOUBLE) / n_pairs, 4) AS tau,
         |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var)
         |             WHEN s < 0 THEN (s + 1) / sqrt(var)
         |             ELSE 0.0 END, 4) AS z
         |FROM st WHERE var > 0 ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val daily = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"), epochDay.as("d"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("v"))
      val a = daily.select(col("t"), col("d").as("da"), col("v").as("va"))
      val b = daily.select(col("t").as("tb"), col("d").as("db"),
        col("v").as("vb"))
      val sgn = a.join(b, col("t") === col("tb") && col("db") > col("da"))
        .groupBy("t")
        .agg(sum(when(col("vb") > col("va"), 1)
          .when(col("vb") < col("va"), -1).otherwise(0)).cast(LongType)
          .as("s"),
          count(lit(1)).cast(LongType).as("n_pairs"))
      val nn = daily.groupBy("t").agg(count(lit(1)).cast(LongType).as("n"))
      val ties = daily.groupBy("t", "v").agg(count(lit(1)).cast(LongType)
        .as("tt"))
        .filter(col("tt") > 1)
        .groupBy("t")
        .agg(coalesce(sum(col("tt") * (col("tt") - 1)
          * (lit(2) * col("tt") + 5)), lit(0L)).cast(LongType).as("tcorr"))
      val st = sgn.join(broadcast(nn), Seq("t"))
        .join(broadcast(ties), Seq("t"), "left")
        .withColumn("var",
          (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
            - coalesce(col("tcorr"), lit(0L))) / lit(18.0))
        .filter(col("var") > 0)
      st.select(col("t").as("event_type"), col("n"), col("s"), col("n_pairs"),
        round(col("s").cast(DoubleType) / col("n_pairs"), 4).as("tau"),
        round(when(col("s") > 0, (col("s") - 1) / sqrt(col("var")))
          .when(col("s") < 0, (col("s") + 1) / sqrt(col("var")))
          .otherwise(lit(0.0)), 4).as("z"))
        .orderBy("event_type")
    },

    // ---- #289 cross-source vocabulary overlap (corpus mixing audit) -------
    // Pairwise token-vocabulary Jaccard between document sources — the
    // audit behind mixture decisions: sources with near-disjoint vocab
    // can't share a tokenizer budget; near-identical vocab hints at
    // cross-source duplication (#274's lexical shadow). The corpus
    // collapses to the DISTINCT (source, token) grain first (one exchange,
    // O(vocab × sources) rows regardless of corpus size); per-source vocab
    // sizes fold from that grain; the pair join is on TOKEN where each
    // token contributes C(sources_with_it, 2) ≤ C(|S|, 2) pairs — bounded
    // by the constant source count, so intersection counting is
    // vocab-linear. Integer counts end in ONE double divide → round(·, 6).
    "vocab_jaccard_sources" -> OpDef(
      """WITH toks AS (
        |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vt AS (SELECT source, tok FROM toks WHERE tok <> ''),
        |vs AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab
        |  FROM vt GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM vt a JOIN vt b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b, va.n_vocab AS vocab_a, vb.n_vocab AS vocab_b,
        |  i.n_common,
        |  round(CAST(i.n_common AS DOUBLE)
        |        / (va.n_vocab + vb.n_vocab - i.n_common), 6) AS jaccard
        |FROM inter i
        |JOIN vs va ON va.source = i.src_a
        |JOIN vs vb ON vb.source = i.src_b
        |ORDER BY src_a, src_b""".stripMargin
    ) { (s, dir) =>
      val vt = tbl(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
      val vs = vt.groupBy("source").agg(count(lit(1)).cast(LongType).as("n_vocab"))
      val a = vt.select(col("source").as("src_a"), col("tok"))
      val b = vt.select(col("source").as("src_b"), col("tok"))
      val inter = a.join(b, Seq("tok"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).cast(LongType).as("n_common"))
      inter
        .join(broadcast(vs).withColumnRenamed("source", "src_a")
          .withColumnRenamed("n_vocab", "vocab_a"), Seq("src_a"))
        .join(broadcast(vs).withColumnRenamed("source", "src_b")
          .withColumnRenamed("n_vocab", "vocab_b"), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
          col("n_common"),
          round(col("n_common").cast(DoubleType)
            / (col("vocab_a") + col("vocab_b") - col("n_common")), 6)
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    }
  )
}
