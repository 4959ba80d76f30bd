package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, second batch (#165-#169) — divergence /
  * effect-size / streak / overlap / transition analytics. Same scale
  * discipline as the rest of the bank: one fact collapse to a bounded
  * grain, windows over grain rows, exact integer arithmetic to the
  * boundary, ONE IEEE chain → round(·,4).
  */
object AnalyticsR8c {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val big = DecimalType(38, 0)
  private val kProp = get_json_object(col("props"), "$.k").cast(LongType)
  private val epochDay = datediff(col("ts").cast(DateType),
    to_date(lit("1970-01-01"))).cast(LongType)

  val defs: Map[String, OpDef] = Map(

    // ---- #165 KL divergence per segment ------------------------------------
    // KL(P_t ‖ Q): each type's k-decile distribution against the corpus
    // marginal — the asymmetric sibling of js_divergence (#145), the
    // plain relative-entropy drift monitor. Identical shape: ONE collapse
    // to the ≤50-cell (type, decile) grain, margins ride grain windows,
    // ≤10-term ln fold per type → round(·,4) clamp. Cells absent from a
    // segment contribute 0 (plug-in estimator) identically on both
    // engines; q > 0 wherever p > 0 by construction (the marginal
    // dominates every segment).
    "kl_divergence" -> OpDef(
      """WITH c AS (
        |  SELECT event_type AS t,
        |    CAST(json_extract_string(props, 'k') AS BIGINT) // 10 AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT t, b, n,
        |    CAST(SUM(n) OVER (PARTITION BY t) AS BIGINT) AS nt,
        |    CAST(SUM(n) OVER (PARTITION BY b) AS BIGINT) AS nb,
        |    CAST(SUM(n) OVER () AS BIGINT) AS tot
        |  FROM c),
        |d AS (
        |  SELECT t,
        |    CAST(n AS DOUBLE) / nt AS p, CAST(nb AS DOUBLE) / tot AS q
        |  FROM m)
        |SELECT t AS event_type, round(SUM(p * ln(p / q)), 4) AS kl
        |FROM d GROUP BY t ORDER BY t""".stripMargin
    ) { (s, dir) =>
      val c = tbl(s, dir, "events")
        .groupBy(col("event_type").as("t"),
          parity.floorDiv(kProp, 10).as("b"))
        .agg(count(lit(1)).as("n"))
      val m = c
        .withColumn("nt", sum("n").over(Window.partitionBy("t")))
        .withColumn("nb", sum("n").over(Window.partitionBy("b")))
        .withColumn("tot", sum("n").over(Window.partitionBy()))
      val p = col("n").cast(DoubleType) / col("nt")
      val q = col("nb").cast(DoubleType) / col("tot")
      m.select(col("t"), (p * log(p / q)).as("term"))
        .groupBy("t").agg(round(sum("term"), 4).as("kl"))
        .select(col("t").as("event_type"), col("kl"))
        .orderBy("event_type")
    },

    // ---- #166 Cliff's delta (ordinal effect size) --------------------------
    // δ = (#{x>y} − #{x<y}) / (nx·ny) for click-vs-view values — the
    // effect-size companion to mannwhitney_utest (#111), exact: both
    // dominance counts ride the SAME collapsed 2-dp value grain and its
    // exclusive prefix windows (the grain-window discipline, pinned by
    // ValueGrainCap). Products in DECIMAL(38,0)/HUGEINT; ONE double
    // divide → round(·,4).
    "cliffs_delta" -> OpDef(
      """WITH vals AS (
        |  SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    event_type = 'click' AS isx
        |  FROM events WHERE event_type IN ('click', 'view')),
        |cnt AS (
        |  SELECT v, CAST(COUNT(*) FILTER (WHERE isx) AS BIGINT) AS cx,
        |    CAST(COUNT(*) FILTER (WHERE NOT isx) AS BIGINT) AS cy
        |  FROM vals GROUP BY v),
        |rk AS (
        |  SELECT cx, cy,
        |    COALESCE(SUM(cy) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cyb,
        |    CAST(SUM(cy) OVER () AS HUGEINT) AS ny
        |  FROM cnt),
        |m AS (
        |  SELECT CAST(SUM(cx) AS BIGINT) AS nx, CAST(MAX(ny) AS BIGINT) AS ny,
        |    CAST(SUM(CAST(cx AS HUGEINT) * cyb) AS BIGINT) AS n_gt,
        |    CAST(SUM(CAST(cx AS HUGEINT) * (ny - cyb - cy)) AS BIGINT) AS n_lt
        |  FROM rk)
        |SELECT nx AS n_click, ny AS n_view, n_gt, n_lt,
        |  round(CAST(n_gt - n_lt AS DOUBLE)
        |    / (CAST(nx AS DOUBLE) * ny), 4) AS delta
        |FROM m""".stripMargin
    ) { (s, dir) =>
      val cnt = tbl(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("value").cast(DecimalType(18, 2)).as("v"),
          (col("event_type") === "click").as("isx"))
        .groupBy("v")
        .agg(count(when(col("isx"), 1)).as("cx"),
          count(when(!col("isx"), 1)).as("cy"))
      val excl = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val rk = cnt
        .withColumn("cyb",
          coalesce(sum(col("cy").cast(big)).over(excl), lit(0).cast(big)))
        .withColumn("ny",
          sum(col("cy").cast(big)).over(Window.partitionBy()))
      val m = rk.agg(
        sum("cx").cast(LongType).as("nx"),
        max("ny").cast(LongType).as("ny"),
        sum(col("cx").cast(big) * col("cyb")).cast(LongType).as("n_gt"),
        sum(col("cx").cast(big) * (col("ny") - col("cyb") - col("cy")))
          .cast(LongType).as("n_lt"))
      m.select(col("nx").as("n_click"), col("ny").as("n_view"),
        col("n_gt"), col("n_lt"),
        round((col("n_gt") - col("n_lt")).cast(DoubleType)
          / (col("nx").cast(DoubleType) * col("ny")), 4).as("delta"))
    },

    // ---- #167 longest consecutive-day streak per user ----------------------
    // The CH maxConsecutive / gaps-and-islands pass: per user, the longest
    // run of consecutive active days plus the island count. Facts collapse
    // to the distinct (user, day) grain; the island id is the classic
    // d − row_number fold; BOTH windows and BOTH collapses ride one
    // hashpartitioning(user_id) clustering. Pure integer arithmetic —
    // exact, order-independent.
    "max_streak" -> OpDef(
      """WITH dd AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |r AS (
        |  SELECT user_id, d,
        |    d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
        |  FROM dd),
        |g AS (SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS len
        |      FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val dd = tbl(s, dir, "events")
        .select(col("user_id"), epochDay.as("d")).distinct()
      val r = dd.withColumn("isl", col("d") - row_number().over(
        Window.partitionBy("user_id").orderBy("d")))
      r.groupBy("user_id", "isl").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").cast(LongType).as("max_streak"),
          count(lit(1)).cast(LongType).as("n_islands"))
        .orderBy("user_id")
    },

    // ---- #168 audience overlap (pairwise Jaccard of user sets) -------------
    // |U_a ∩ U_b| / |U_a ∪ U_b| for every event-type pair — the audience
    // cross-over matrix. Facts collapse ONCE to the distinct (type, user)
    // grain; the pair intersection is a hash self-join of the GRAIN on
    // user (each user contributes its type pairs — never a fact-row
    // join); per-type sizes come from the same grain and broadcast onto
    // the ≤10 pair rows. Exact integers; one divide → round(·,4).
    "audience_overlap" -> OpDef(
      """WITH g AS (
        |  SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        |c AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
        |p AS (
        |  SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM g a JOIN g b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT ta AS type_a, tb AS type_b, n_common,
        |  ca.n AS n_a, cb.n AS n_b,
        |  round(CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common), 4)
        |    AS jaccard
        |FROM p JOIN c ca ON ca.t = p.ta JOIN c cb ON cb.t = p.tb
        |ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      // the grain feeds BOTH join sides and both count lookups — cached so
      // the fact table is scanned ONCE, not 4× (CacheRegistry discipline:
      // production callers release via Graft.releaseCaches())
      val g = graft.CacheRegistry.track(tbl(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val c = g.groupBy("t").agg(count(lit(1)).as("n"))
      val p = g.as("a").join(g.as("b"),
          col("a.u") === col("b.u") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
        .agg(count(lit(1)).as("n_common"))
      p.join(broadcast(c.select(col("t").as("ta"), col("n").as("n_a"))), "ta")
        .join(broadcast(c.select(col("t").as("tb"), col("n").as("n_b"))), "tb")
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("n_common").cast(LongType).as("n_common"),
          col("n_a").cast(LongType).as("n_a"),
          col("n_b").cast(LongType).as("n_b"),
          round(col("n_common").cast(DoubleType)
            / (col("n_a") + col("n_b") - col("n_common")), 4).as("jaccard"))
        .orderBy("type_a", "type_b")
    },

    // ---- #169 event-type transition matrix ---------------------------------
    // P(next_type | prev_type) over each user's time-ordered stream — the
    // first-order Markov structure of user behavior (the events twin of
    // bigram_condprob). The lag rides ONE hashpartitioning(user_id)
    // exchange; pairs collapse to the ≤25-cell (prev, next) grain; the
    // margin is a window over grain rows; P is one exact-integer divide
    // → round(·,4).
    "type_transitions" -> OpDef(
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
        |  SELECT prev, cur, n,
        |    CAST(SUM(n) OVER (PARTITION BY prev) AS BIGINT) AS np
        |  FROM c)
        |SELECT prev AS prev_type, cur AS next_type, n,
        |  round(CAST(n AS DOUBLE) / np, 4) AS p_trans
        |FROM w ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val lagW = Window.partitionBy("user_id").orderBy("us", "event_id")
      val l = tbl(s, dir, "events")
        .select(col("user_id"), col("event_type").as("cur"),
          expr("unix_micros(ts)").as("us"), col("event_id"))
        .withColumn("prev", lag(col("cur"), 1).over(lagW))
        .filter(col("prev").isNotNull)
      val c = l.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
      c.withColumn("np",
          sum("n").over(Window.partitionBy("prev")).cast(LongType))
        .select(col("prev").as("prev_type"), col("cur").as("next_type"),
          col("n"),
          round(col("n").cast(DoubleType) / col("np"), 4).as("p_trans"))
        .orderBy("prev_type", "next_type")
    }
  )
}
