package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2/§2.3 round-8 additions, eighth batch (#187-#188) — the
  * Spearman rank-correlation matrix and the per-source duplication-rate
  * profile.
  */
object AnalyticsR8i {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val big = DecimalType(38, 0)
  private val kProp = get_json_object(col("props"), "$.k").cast(LongType)
  private val centsL =
    (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #187 Spearman rank-correlation matrix -----------------------------
    // All three pairwise Spearman ρ of (value-cents, k-prop, hour) in ONE
    // fact pass — the monotone-dependence twin of cov_corr_matrix (#170).
    // Each feature's average-tie-rank map is built on its own bounded
    // grain (2-dp values / 100 k-buckets / 24 hours) and BROADCAST back
    // (the spearman_corr discipline: fact rows never shuffle). The trick
    // that makes the whole thing EXACT at any scale: double-ranks
    // ir = 2·offset + cnt + 1 are INTEGERS, ρ is scale-invariant
    // (corr(2x,2y) = corr(x,y)), so every moment is an exact
    // DECIMAL(38,0)/HUGEINT sum — no float fold anywhere, ONE IEEE chain
    // on the 1-row result → round(·,4).
    "rank_corr_matrix" -> OpDef(
      """WITH f AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    CAST(json_extract_string(props, 'k') AS BIGINT) AS k,
        |    date_part('hour', ts) AS h
        |  FROM events
        |  WHERE json_extract_string(props, 'k') IS NOT NULL),
        |gv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1),
        |rv AS (
        |  SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
        |    AS rx
        |  FROM gv),
        |gk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1),
        |rk AS (
        |  SELECT k, 2 * COALESCE(SUM(c) OVER (ORDER BY k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
        |    AS ry
        |  FROM gk),
        |gh AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1),
        |rh AS (
        |  SELECT h, 2 * COALESCE(SUM(c) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
        |    AS rz
        |  FROM gh),
        |j AS (
        |  SELECT CAST(rx AS HUGEINT) AS x, CAST(ry AS HUGEINT) AS y,
        |    CAST(rz AS HUGEINT) AS z
        |  FROM f JOIN rv USING (v) JOIN rk USING (k) JOIN rh USING (h)),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(z) AS DOUBLE) AS sz,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy,
        |    CAST(SUM(z * z) AS DOUBLE) AS szz,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * z) AS DOUBLE) AS sxz,
        |    CAST(SUM(y * z) AS DOUBLE) AS syz
        |  FROM j),
        |u AS (
        |  SELECT 'k_h' AS pair, n, sy AS sa, sz AS sb, syy AS saa,
        |    szz AS sbb, syz AS sab FROM m
        |  UNION ALL SELECT 'v_h', n, sx, sz, sxx, szz, sxz FROM m
        |  UNION ALL SELECT 'v_k', n, sx, sy, sxx, syy, sxy FROM m)
        |SELECT pair, n,
        |  round(CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
        |    THEN (n * sab - sa * sb)
        |      / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) END, 4)
        |    AS spearman_rho
        |FROM u ORDER BY pair""".stripMargin
    ) { (s, dir) =>
      val f = tbl(s, dir, "events")
        .filter(get_json_object(col("props"), "$.k").isNotNull)
        .select(centsL.as("v"), kProp.as("k"),
          hour(col("ts")).cast(LongType).as("h"))
      // double-rank map on a bounded grain: ir = 2·offset + cnt + 1
      def rankMap(colName: String, out: String): DataFrame = {
        val excl = Window.orderBy(colName)
          .rowsBetween(Window.unboundedPreceding, -1)
        f.groupBy(colName).agg(count(lit(1)).as("c"))
          .withColumn(out,
            lit(2) * coalesce(sum("c").over(excl), lit(0L)) + col("c") + 1)
          .drop("c")
      }
      val j = f
        .join(broadcast(rankMap("v", "rx")), "v")
        .join(broadcast(rankMap("k", "ry")), "k")
        .join(broadcast(rankMap("h", "rz")), "h")
      def sd(c: Column): Column = sum(c.cast(big)).cast(DoubleType)
      val m = j.agg(count(lit(1)).cast(LongType).as("n"),
        sd(col("rx")).as("sx"), sd(col("ry")).as("sy"), sd(col("rz")).as("sz"),
        sum(col("rx").cast(big) * col("rx")).cast(DoubleType).as("sxx"),
        sum(col("ry").cast(big) * col("ry")).cast(DoubleType).as("syy"),
        sum(col("rz").cast(big) * col("rz")).cast(DoubleType).as("szz"),
        sum(col("rx").cast(big) * col("ry")).cast(DoubleType).as("sxy"),
        sum(col("rx").cast(big) * col("rz")).cast(DoubleType).as("sxz"),
        sum(col("ry").cast(big) * col("rz")).cast(DoubleType).as("syz"))
      val u = m.select(explode(array(
          struct(lit("k_h").as("pair"), col("n"), col("sy").as("sa"),
            col("sz").as("sb"), col("syy").as("saa"), col("szz").as("sbb"),
            col("syz").as("sab")),
          struct(lit("v_h").as("pair"), col("n"), col("sx").as("sa"),
            col("sz").as("sb"), col("sxx").as("saa"), col("szz").as("sbb"),
            col("sxz").as("sab")),
          struct(lit("v_k").as("pair"), col("n"), col("sx").as("sa"),
            col("sy").as("sb"), col("sxx").as("saa"), col("syy").as("sbb"),
            col("sxy").as("sab")))).as("p"))
        .select(col("p.*"))
      val nD = col("n").cast(DoubleType)
      val (va, vb) = (nD * col("saa") - col("sa") * col("sa"),
        nD * col("sbb") - col("sb") * col("sb"))
      val rho = when(va > 0 && vb > 0,
        (nD * col("sab") - col("sa") * col("sb")) / sqrt(va * vb))
      u.select(col("pair"), col("n"), round(rho, 4).as("spearman_rho"))
        .orderBy("pair")
    },

    // ---- #190 week-over-week revenue change --------------------------------
    // Per type per 7-day bucket: exact cents total and the WoW % change —
    // the trend read-out monitoring dashboards lead with. Facts collapse
    // ONCE to the week grain (day div 7 — pure integer bucketing, no
    // calendar-library week numbering whose ISO edge rules differ across
    // engines); the lag rides a per-type grain window; the % change is
    // one divide → round(·,4), NULL for each type's first week.
    "week_over_week" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |g AS (SELECT t, CAST(wk AS BIGINT) AS wk, CAST(SUM(c) AS BIGINT) AS s
        |      FROM f GROUP BY 1, 2),
        |l AS (
        |  SELECT t, wk, s,
        |    lag(s) OVER (PARTITION BY t ORDER BY wk) AS prev
        |  FROM g)
        |SELECT t AS event_type, wk, s AS week_cents,
        |  round((CAST(s AS DOUBLE) - prev) / prev, 4) AS wow_pct
        |FROM l ORDER BY t, wk""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"),
          parity.floorDiv(
            datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")), 7)
            .as("wk"),
          centsL.as("c"))
        .groupBy("t", "wk").agg(sum("c").cast(LongType).as("s"))
      val prev = lag(col("s"), 1).over(Window.partitionBy("t").orderBy("wk"))
      g.withColumn("prev", prev)
        .select(col("t").as("event_type"), col("wk"),
          col("s").as("week_cents"),
          round((col("s").cast(DoubleType) - col("prev")) / col("prev"), 4)
            .as("wow_pct"))
        .orderBy("event_type", "wk")
    },

    // ---- #188 duplication rate by source -----------------------------------
    // Per (source): docs, exact-distinct texts (16-byte md5 keys — the
    // dedup_exact discipline: digests shuffle, never text bodies), and
    // the duplicate rate — the per-feed quality read-out a curation run
    // uses to decide WHERE dedup budget goes. Two-phase distinct (the
    // canonical scale shape for unbounded per-group domains) + one
    // divide → round(·,4).
    "dup_rate_by_source" -> OpDef(
      """WITH d AS (
        |  SELECT source, md5(text) AS h FROM documents),
        |g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs, n_unique,
        |  round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) AS dup_rate
        |FROM g ORDER BY source""".stripMargin
    ) { (s, dir) =>
      tbl(s, dir, "documents")
        .select(col("source"), md5(col("text")).as("h"))
        .groupBy("source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          countDistinct("h").cast(LongType).as("n_unique"))
        .select(col("source"), col("n_docs"), col("n_unique"),
          round(lit(1.0) - col("n_unique").cast(DoubleType) / col("n_docs"), 4)
            .as("dup_rate"))
        .orderBy("source")
    }
  )
}
