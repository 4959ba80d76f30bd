package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, fourth batch (#174-#176) — logarithmic
  * histograms, fixed-probe CDF, and diurnal profiling. All three are
  * single-collapse partial-agg shapes with pure integer cells — the
  * cheapest class in the bank, exact at any SF.
  */
object AnalyticsR8e {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val centsL =
    (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #174 log2 (power-of-two) histogram --------------------------------
    // The CH-style log-scale value histogram: cents bucketed by BIT LENGTH
    // (bucket b covers [2^(b-1), 2^b)) per type. The bucket is the length
    // of the binary string — pure integer string arithmetic, engine-exact
    // (never floor(log2(x)), whose IEEE rounding at exact powers of two
    // is library-dependent). ONE collapse to the ≤40-cell (type, bucket)
    // grain; share is one divide over a grain window → round(·,4).
    "log2_histogram" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
        |g AS (
        |  SELECT t, CAST(length(printf('%b', c)) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sum_c
        |  FROM f GROUP BY 1, 2)
        |SELECT t AS event_type, bucket, n, sum_c,
        |  round(CAST(n AS DOUBLE)
        |    / SUM(n) OVER (PARTITION BY t), 4) AS share
        |FROM g ORDER BY t, bucket""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .filter(col("c") > 0)
        .groupBy(col("t"), length(bin(col("c"))).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("c").cast(LongType).as("sum_c"))
      g.withColumn("share",
          round(col("n").cast(DoubleType)
            / sum("n").over(Window.partitionBy("t")), 4))
        .select(col("t").as("event_type"), col("bucket"), col("n"),
          col("sum_c"), col("share"))
        .orderBy("event_type", "bucket")
    },

    // ---- #175 CDF at fixed probe thresholds --------------------------------
    // F(x) = P(value ≤ x) per type at the five standard report thresholds
    // — the fixed-probe empirical CDF a dashboard queries instead of full
    // quantiles. ALL five probes ride ONE conditional partial agg (the
    // agg_if / -If combinator discipline): one fact exchange, zero
    // windows, zero joins; stacked to probe rows by an inline explode of
    // the 5-cell aggregate. Exact integer counts; one divide → round(·,4).
    "value_cdf_probes" -> OpDef(
      """WITH f AS (
        |  SELECT event_type AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |m AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(CASE WHEN c <= 1000 THEN 1 END) AS BIGINT) AS le_1000,
        |    CAST(COUNT(CASE WHEN c <= 2500 THEN 1 END) AS BIGINT) AS le_2500,
        |    CAST(COUNT(CASE WHEN c <= 5000 THEN 1 END) AS BIGINT) AS le_5000,
        |    CAST(COUNT(CASE WHEN c <= 7500 THEN 1 END) AS BIGINT) AS le_7500,
        |    CAST(COUNT(CASE WHEN c <= 9000 THEN 1 END) AS BIGINT) AS le_9000
        |  FROM f GROUP BY 1),
        |u AS (
        |  SELECT t, n, 1000 AS probe_c, le_1000 AS n_le FROM m
        |  UNION ALL SELECT t, n, 2500, le_2500 FROM m
        |  UNION ALL SELECT t, n, 5000, le_5000 FROM m
        |  UNION ALL SELECT t, n, 7500, le_7500 FROM m
        |  UNION ALL SELECT t, n, 9000, le_9000 FROM m)
        |SELECT t AS event_type, CAST(probe_c AS BIGINT) AS probe_c, n_le,
        |  round(CAST(n_le AS DOUBLE) / n, 4) AS cdf
        |FROM u ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val probes = Seq(1000L, 2500L, 5000L, 7500L, 9000L)
      val m = tbl(s, dir, "events")
        .select(col("event_type").as("t"), centsL.as("c"))
        .groupBy("t")
        .agg(count(lit(1)).as("n"),
          probes.map(p =>
            count(when(col("c") <= p, 1)).as(s"le_$p")): _*)
      m.select(col("t"), col("n"), explode(array(probes.map(p =>
          struct(lit(p).as("probe_c"), col(s"le_$p").as("n_le"))): _*)).as("p"))
        .select(col("t").as("event_type"),
          col("p.probe_c").cast(LongType).as("probe_c"),
          col("p.n_le").cast(LongType).as("n_le"),
          round(col("p.n_le").cast(DoubleType) / col("n"), 4).as("cdf"))
        .orderBy("event_type", "probe_c")
    },

    // ---- #176 diurnal profile ----------------------------------------------
    // Per (type, hour-of-day): event count, share of the type's volume,
    // and a peak flag — the 24-cell daily-rhythm profile behind alerting
    // baselines. ONE collapse to the ≤120-cell grain; share and peak ride
    // grain windows (argmax by (n, hour) tie-break so the flag is
    // engine-stable); exact integers, one divide → round(·,4).
    "hour_profile" -> OpDef(
      """WITH g AS (
        |  SELECT event_type AS t, date_part('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT t, CAST(h AS BIGINT) AS h, n,
        |    CAST(SUM(n) OVER (PARTITION BY t) AS BIGINT) AS nt,
        |    row_number() OVER (PARTITION BY t ORDER BY n DESC, h) AS rk
        |  FROM g)
        |SELECT t AS event_type, h, n,
        |  round(CAST(n AS DOUBLE) / nt, 4) AS share,
        |  CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_peak
        |FROM w ORDER BY t, h""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"),
          hour(col("ts")).cast(LongType).as("h"))
        .agg(count(lit(1)).as("n"))
      val tp = Window.partitionBy("t")
      val w = g
        .withColumn("nt", sum("n").over(tp).cast(LongType))
        .withColumn("rk", row_number().over(
          tp.orderBy(col("n").desc, col("h"))))
      w.select(col("t").as("event_type"), col("h"), col("n"),
        round(col("n").cast(DoubleType) / col("nt"), 4).as("share"),
        when(col("rk") === 1, 1L).otherwise(0L).as("is_peak"))
        .orderBy("event_type", "h")
    }
  )
}
