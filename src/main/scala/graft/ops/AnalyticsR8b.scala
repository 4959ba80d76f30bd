package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2/§2.3 round-8 additions (#157-#164) — series diagnostics,
  * inequality/association coefficients, corpus profiling, and lexical
  * quality signals, in the bank's established scale shapes: facts collapse
  * ONCE to a bounded grain, windows and folds ride grain rows, integer
  * arithmetic stays exact (DECIMAL(38,0)/HUGEINT) until ONE IEEE
  * expression at the boundary → round(·,4).
  *
  * Reference surface exercised (semantics, not implementation): the
  * autocorrelation / mean-family / contingency aggregate combinators a
  * synced analytics store exposes, plus the corpus-health profiling
  * passes (column profile, TTR, shingle novelty) an LLM-data curation
  * pipeline runs next to dedup.
  */
object AnalyticsR8b {

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

    // ---- #157 lag-k autocorrelation of the daily series --------------------
    // Pearson r between the per-type daily cents total and its own lag at
    // k ∈ {1,2,3,7} — the seasonality/persistence diagnostic monitoring
    // stacks run over flush rollups. Facts collapse ONCE to the day grain;
    // ALL four lags ride ONE hashpartitioning(t) window exchange and stack
    // into (k, pair) rows with an inline explode (grain rows only — never
    // a per-k rescan, never a self-join on day-k). Moments accumulate in
    // DECIMAL(38,0)/HUGEINT (daily totals are corpus-scale, their products
    // overflow int64 at 100 TB); ONE IEEE expression → round(·,4); a
    // zero-variance side yields NULL on both engines.
    "autocorr_daily" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |g AS (SELECT t, d, CAST(SUM(c) AS BIGINT) AS s FROM f GROUP BY 1, 2),
        |l AS (
        |  SELECT t, s, lag(s, 1) OVER w AS l1, lag(s, 2) OVER w AS l2,
        |    lag(s, 3) OVER w AS l3, lag(s, 7) OVER w AS l7
        |  FROM g WINDOW w AS (PARTITION BY t ORDER BY d)),
        |u AS (
        |  SELECT t, 1 AS k, s, l1 AS sl FROM l
        |  UNION ALL SELECT t, 2, s, l2 FROM l
        |  UNION ALL SELECT t, 3, s, l3 FROM l
        |  UNION ALL SELECT t, 7, s, l7 FROM l),
        |m AS (
        |  SELECT t, k, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(s AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(sl AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(s AS HUGEINT) * s) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(sl AS HUGEINT) * sl) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(s AS HUGEINT) * sl) AS DOUBLE) AS sxy
        |  FROM u WHERE sl IS NOT NULL GROUP BY 1, 2)
        |SELECT t AS event_type, CAST(k AS BIGINT) AS k, n AS n_pairs,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (n * sxy - sx * sy)
        |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 4)
        |    AS autocorr
        |FROM m ORDER BY event_type, k""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), epochDay.as("d"), centsL.as("c"))
        .groupBy("t", "d").agg(sum("c").cast(LongType).as("s"))
      val w = Window.partitionBy("t").orderBy("d")
      val lags = Seq(1, 2, 3, 7)
      val l = g.select(col("t") +: col("s") +:
        lags.map(k => lag(col("s"), k).over(w).as(s"l$k")): _*)
      val u = l
        .select(col("t"), col("s"), explode(array(lags.map(k =>
          struct(lit(k.toLong).as("k"), col(s"l$k").as("sl"))): _*)).as("p"))
        .select(col("t"), col("p.k").as("k"), col("s"), col("p.sl").as("sl"))
        .filter(col("sl").isNotNull)
      val m = u.groupBy("t", "k").agg(
        count(lit(1)).as("n"),
        sum(col("s").cast(big)).cast(DoubleType).as("sx"),
        sum(col("sl").cast(big)).cast(DoubleType).as("sy"),
        sum(col("s").cast(big) * col("s")).cast(DoubleType).as("sxx"),
        sum(col("sl").cast(big) * col("sl")).cast(DoubleType).as("syy"),
        sum(col("s").cast(big) * col("sl")).cast(DoubleType).as("sxy"))
      val nD = col("n").cast(DoubleType)
      val vx = nD * col("sxx") - col("sx") * col("sx")
      val vy = nD * col("syy") - col("sy") * col("sy")
      val r = when(vx > 0 && vy > 0,
        (nD * col("sxy") - col("sx") * col("sy")) / sqrt(vx * vy))
      m.select(col("t").as("event_type"), col("k"),
        col("n").cast(LongType).as("n_pairs"), round(r, 4).as("autocorr"))
        .orderBy("event_type", "k")
    },

    // ---- #158 exact Gini coefficient ---------------------------------------
    // Per-type Gini over positive cents — the concentration/inequality
    // metric, EXACT at any SF: facts collapse to the (type, cents) value
    // grain, and Σᵢⱼ|xᵢ−xⱼ| becomes pure integer arithmetic on the grain's
    // exclusive prefix sums (each grain row × all strictly-smaller mass:
    // n·(c·cumN − cumS); within-row pairs differ by 0). One fact exchange;
    // windows ride grain rows partitioned BY TYPE (never partition-less);
    // products in DECIMAL(38,0)/HUGEINT; ONE double divide → round(·,4).
    "gini_inequality" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
        |g AS (SELECT t, c, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT t, c, n,
        |    COALESCE(SUM(CAST(n AS HUGEINT)) OVER pw, 0) AS cum_n,
        |    COALESCE(SUM(CAST(c AS HUGEINT) * n) OVER pw, 0) AS cum_s
        |  FROM g
        |  WINDOW pw AS (PARTITION BY t ORDER BY c
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |a AS (
        |  SELECT t, CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(CAST(c AS HUGEINT) * n) AS DOUBLE) AS sum_x,
        |    CAST(SUM(CAST(n AS HUGEINT) * (CAST(c AS HUGEINT) * cum_n - cum_s))
        |      AS DOUBLE) AS sum_abs
        |  FROM w GROUP BY 1)
        |SELECT t AS event_type, n_total,
        |  round(sum_abs / (CAST(n_total AS DOUBLE) * sum_x), 4) AS gini
        |FROM a ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .filter(col("c") > 0)
        .groupBy("t", "c").agg(count(lit(1)).as("n"))
      val pw = Window.partitionBy("t").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
      val zero = lit(0).cast(big)
      val w = g
        .withColumn("cum_n", coalesce(sum(col("n").cast(big)).over(pw), zero))
        .withColumn("cum_s",
          coalesce(sum(col("c").cast(big) * col("n")).over(pw), zero))
      val a = w.groupBy("t").agg(
        sum("n").cast(LongType).as("n_total"),
        sum(col("c").cast(big) * col("n")).cast(DoubleType).as("sum_x"),
        sum(col("n").cast(big) *
          (col("c").cast(big) * col("cum_n") - col("cum_s")))
          .cast(DoubleType).as("sum_abs"))
      a.select(col("t").as("event_type"), col("n_total"),
        round(col("sum_abs") /
          (col("n_total").cast(DoubleType) * col("sum_x")), 4).as("gini"))
        .orderBy("event_type")
    },

    // ---- #159 one-pass column profile --------------------------------------
    // The data-quality profiling pass every ingest runs first: per column
    // of `events` — row count, null count, exact distinct count — in ONE
    // scan. Spark plans the 6 distinct aggregates as a single Expand (×7
    // over the scan) feeding one partial agg: one fact exchange total,
    // versus the naive 6 per-column scans. Output stacks to rows with an
    // inline explode of the 1-row aggregate (no extra pass). Counts only
    // — no value cells — so parity is engine-trivial.
    "profile_columns" -> OpDef(
      """SELECT 'event_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
        |UNION ALL SELECT 'event_type', COUNT(*),
        |  COUNT(*) - COUNT(event_type), COUNT(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'props', COUNT(*),
        |  COUNT(*) - COUNT(props), COUNT(DISTINCT props) FROM events
        |UNION ALL SELECT 'ts', COUNT(*),
        |  COUNT(*) - COUNT(ts), COUNT(DISTINCT ts) FROM events
        |UNION ALL SELECT 'user_id', COUNT(*),
        |  COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id) FROM events
        |UNION ALL SELECT 'value', COUNT(*),
        |  COUNT(*) - COUNT(value), COUNT(DISTINCT value) FROM events
        |ORDER BY col_name""".stripMargin
    ) { (s, dir) =>
      val cols = Seq("event_id", "event_type", "props", "ts", "user_id", "value")
      val a = tbl(s, dir, "events").agg(
        count(lit(1)).as("nr"),
        cols.flatMap(c => Seq(count(col(c)).as(s"cnt_$c"),
          countDistinct(col(c)).as(s"dst_$c"))): _*)
      a.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col("nr").as("n_rows"),
            (col("nr") - col(s"cnt_$c")).as("n_null"),
            col(s"dst_$c").as("n_distinct"))): _*)).as("p"))
        .select(col("p.col_name"), col("p.n_rows").cast(LongType).as("n_rows"),
          col("p.n_null").cast(LongType).as("n_null"),
          col("p.n_distinct").cast(LongType).as("n_distinct"))
        .orderBy("col_name")
    },

    // ---- #160 type-token ratio (lexical diversity) -------------------------
    // Per-doc TTR + hapax-legomena ratio — the lexical-diversity quality
    // signal curation pipelines cut on next to doc_repetition. The doc_id
    // filter prunes the fact side BEFORE the explode; tokens collapse to
    // the (doc, tok) grain then fold per doc — two grain collapses on one
    // scan, zero joins. Ratios are single IEEE divides of exact integers
    // → round(·,4).
    "text_ttr" -> OpDef(
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 200),
        |g AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM w GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 4) AS ttr,
        |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS hapax_ratio
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      g.groupBy("doc_id").agg(
        sum("c").cast(LongType).as("n_tok"),
        count(lit(1)).cast(LongType).as("n_types"),
        round(count(lit(1)).cast(DoubleType) / sum("c"), 4).as("ttr"),
        round(sum(when(col("c") === 1, 1).otherwise(0)).cast(DoubleType)
          / count(lit(1)), 4).as("hapax_ratio"))
        .orderBy("doc_id")
    },

    // ---- #161 shingle novelty (inter-doc duplication profile) --------------
    // Per-doc fraction of its distinct word-3-gram shingles that appear in
    // ANY other doc (document frequency ≥ 2) — the corpus-level boilerplate
    // profile that tells a curation run how much near-dup mass dedup will
    // find BEFORE paying for pair generation. Shingles are hashed ONCE
    // (the dedup bank's h32 discipline); df is a count over the
    // hash-partitioned shingle grain — window, not join; the per-doc fold
    // is a second grain collapse. Two exchanges total, both on distinct
    // (doc, h) rows, never on raw text.
    "shingle_novelty" -> OpDef(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(0, len(ws) - 3),
        |    i -> ('0x' || substr(md5(ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |      ws[i+3]), 1, 8))::BIGINT))) AS h
        |  FROM w WHERE len(ws) >= 3),
        |d AS (
        |  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS df FROM g)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS shared_frac
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val e = graft.dedup.Dedup.gramRows(tbl(s, dir, "documents"), 3)
      val d = e.withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      d.groupBy("doc_id").agg(
        count(lit(1)).cast(LongType).as("n_shingles"),
        round(sum(when(col("df") >= 2, 1).otherwise(0)).cast(DoubleType)
          / count(lit(1)), 4).as("shared_frac"))
        .orderBy("doc_id")
    },

    // ---- #162 contingency coefficients -------------------------------------
    // Pearson's C and Tschuprow's T on the same ≤50-cell (event_type ×
    // k-decile) contingency grain as cramers_v (#119) — the remaining CH
    // association-combinator pair. One fact collapse; margins ride window
    // sums over grain rows; χ² and both coefficients are ONE IEEE chain on
    // the 1-row result → round(·,4).
    "contingency_coef" -> OpDef(
      """WITH c AS (
        |  SELECT event_type AS t,
        |    CAST(json_extract_string(props, 'k') AS BIGINT) // 10 AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE json_extract_string(props, 'k') IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT t, b, n,
        |    SUM(n) OVER (PARTITION BY t) AS rm,
        |    SUM(n) OVER (PARTITION BY b) AS cm,
        |    SUM(n) OVER () AS tot
        |  FROM c),
        |x AS (
        |  SELECT CAST(MAX(tot) AS BIGINT) AS n_total,
        |    CAST(COUNT(DISTINCT t) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_cols,
        |    SUM((n - CAST(rm AS DOUBLE) * cm / tot)
        |        * (n - CAST(rm AS DOUBLE) * cm / tot)
        |        / (CAST(rm AS DOUBLE) * cm / tot)) AS chi2
        |  FROM m)
        |SELECT n_total, round(chi2, 4) AS chi2,
        |  round(sqrt(chi2 / (chi2 + n_total)), 4) AS contingency_c,
        |  round(sqrt(chi2 / (n_total *
        |    sqrt(CAST((n_rows - 1) * (n_cols - 1) AS DOUBLE)))), 4)
        |    AS tschuprow_t
        |FROM x""".stripMargin
    ) { (s, dir) =>
      // rows with missing k are EXCLUDED (matching cov_corr_matrix /
      // rank_corr_matrix): a NULL decile would be counted as a χ² cell
      // while COUNT(DISTINCT b) excludes NULL, understating n_cols in
      // Tschuprow's normalizer — engine-consistent but statistically wrong
      val c = tbl(s, dir, "events")
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .groupBy(col("event_type").as("t"),
          parity.floorDiv(
            get_json_object(col("props"), "$.k").cast(LongType), 10).as("b"))
        .agg(count(lit(1)).as("n"))
      val m = c
        .withColumn("rm", sum("n").over(Window.partitionBy("t")))
        .withColumn("cm", sum("n").over(Window.partitionBy("b")))
        .withColumn("tot", sum("n").over(Window.partitionBy()))
      val e = col("rm").cast(DoubleType) * col("cm") / col("tot")
      val x = m.agg(
        max("tot").cast(LongType).as("n_total"),
        countDistinct("t").cast(LongType).as("n_rows"),
        countDistinct("b").cast(LongType).as("n_cols"),
        sum((col("n") - e) * (col("n") - e) / e).as("chi2"))
      x.select(col("n_total"), round(col("chi2"), 4).as("chi2"),
        round(sqrt(col("chi2") / (col("chi2") + col("n_total"))), 4)
          .as("contingency_c"),
        round(sqrt(col("chi2") / (col("n_total") *
          sqrt(((col("n_rows") - 1) * (col("n_cols") - 1))
            .cast(DoubleType)))), 4).as("tschuprow_t"))
    },

    // ---- #163 mean family (arithmetic / geometric / harmonic) --------------
    // The CH avg/geometricMean/harmonicMean combinator family per type over
    // positive values: ONE partial-agg exchange carries n, Σcents (exact
    // decimal), Σln v and Σ1/v (per-term IEEE identical on both engines;
    // the fold is order-dependent → round(·,4) clamp, the bank's ln-fold
    // discipline).
    "mean_family" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0)
        |SELECT t AS event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) / 100 / COUNT(*), 4)
        |    AS mean_a,
        |  round(exp(SUM(ln(CAST(c AS DOUBLE) / 100)) / COUNT(*)), 4) AS mean_g,
        |  round(COUNT(*) / SUM(1.0 / (CAST(c AS DOUBLE) / 100)), 4) AS mean_h
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val vD = col("c").cast(DoubleType) / 100
      tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .filter(col("c") > 0)
        .groupBy("t").agg(
          count(lit(1)).cast(LongType).as("n"),
          round(sum(col("c").cast(big)).cast(DoubleType) / 100
            / count(lit(1)), 4).as("mean_a"),
          round(exp(sum(log(vD)) / count(lit(1))), 4).as("mean_g"),
          round(count(lit(1)) / sum(lit(1.0) / vD), 4).as("mean_h"))
        .select(col("t").as("event_type"), col("n"), col("mean_a"),
          col("mean_g"), col("mean_h"))
        .orderBy("event_type")
    },

    // ---- #164 inter-arrival time quantiles ---------------------------------
    // Exact p50/p90/p99 of the per-user inter-event gap (seconds),
    // attributed to the later event's type — the latency-distribution
    // twin of sessionize: the lag rides ONE hashpartitioning(user_id)
    // exchange, gaps collapse to the (type, gap-second) value grain, and
    // rank selection rides per-type grain windows (mad_exact discipline —
    // never partition-less). Gap arithmetic is exact integer µs → integer
    // `div` seconds (IEEE-free, engine-identical); ranks are nearest-rank
    // integers.
    "interarrival_quantiles" -> OpDef(
      """WITH e AS (
        |  SELECT event_type AS t, user_id, epoch_us(ts) AS us, event_id
        |  FROM events),
        |l AS (
        |  SELECT t, us - lag(us) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |  FROM e),
        |f AS (SELECT t, gap_us // 1000000 AS gs FROM l WHERE gap_us IS NOT NULL),
        |g AS (SELECT t, gs, CAST(COUNT(*) AS BIGINT) AS cnt FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT t, gs, cnt,
        |    SUM(cnt) OVER (PARTITION BY t ORDER BY gs) AS cum,
        |    SUM(cnt) OVER (PARTITION BY t) AS n
        |  FROM g)
        |SELECT t AS event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN gs END) AS BIGINT)
        |    AS p50_s,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.90 * n) THEN gs END) AS BIGINT)
        |    AS p90_s,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.99 * n) THEN gs END) AS BIGINT)
        |    AS p99_s
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val lagW = Window.partitionBy("user_id").orderBy("us", "event_id")
      val l = tbl(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id"),
          expr("unix_micros(ts)").as("us"), col("event_id"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(lagW))
        .filter(col("gap_us").isNotNull)
        .select(col("t"), parity.floorDiv(col("gap_us"), 1000000L).as("gs"))
      val g = l.groupBy("t", "gs").agg(count(lit(1)).as("cnt"))
      val cumW = Window.partitionBy("t").orderBy("gs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = g
        .withColumn("cum", sum("cnt").over(cumW))
        .withColumn("n", sum("cnt").over(Window.partitionBy("t")))
      def sel(q: Double): Column =
        min(when(col("cum") >= ceil(lit(q) * col("n")), col("gs")))
          .cast(LongType)
      w.groupBy("t").agg(max("n").cast(LongType).as("n_gaps"),
        sel(0.50).as("p50_s"), sel(0.90).as("p90_s"), sel(0.99).as("p99_s"))
        .select(col("t").as("event_type"), col("n_gaps"), col("p50_s"),
          col("p90_s"), col("p99_s"))
        .orderBy("event_type")
    }
  )
}
