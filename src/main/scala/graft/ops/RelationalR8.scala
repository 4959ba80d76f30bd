package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 round-8 additions, TPC-H-classic batch (#193-#195) — the
  * Q4 / Q12 / Q14 query shapes adapted to this schema, deepening the
  * relational bank beyond q1/q3/q5. All three are the canonical
  * join-then-conditional-aggregate patterns whose 100 TB plans hinge on
  * join-side pruning and conditional partial aggs.
  */
object RelationalR8 {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  val defs: Map[String, OpDef] = Map(

    // ---- #193 TPC-H Q4 shape: priority count with EXISTS semi-join ---------
    // Orders per priority that have at least one line shipped > 60 days
    // after the order date — the EXISTS pattern. The semi-join keeps the
    // probe side at ONE row per qualifying order (never a row-multiplying
    // inner join + distinct); the date predicate rides the join condition
    // so non-qualifying lines never survive the build side. Exact integer
    // date arithmetic.
    "q4_priority_slowship" -> OpDef(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND datediff('day', CAST(o.o_orderdate AS DATE),
        |          CAST(l.l_shipdate AS DATE)) > 60)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            datediff(l("l_shipdate").cast(DateType),
              o("o_orderdate").cast(DateType)) > 60,
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast(LongType).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---- #194 TPC-H Q12 shape: priority-class counts per line status -------
    // Per l_linestatus: how many lines belong to URGENT/HIGH-priority
    // orders vs the rest — the join + dual conditional count. The
    // priority flag projects to ONE boolean BEFORE the join (column
    // pruning: the join carries 2 columns, not the orders row); both
    // counts ride ONE conditional partial agg.
    "q12_priority_class" -> OpDef(
      """SELECT l.l_linestatus,
        |  CAST(COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS BIGINT) AS high_line_count,
        |  CAST(COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hi"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linestatus"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(count(when(col("hi"), 1)).cast(LongType).as("high_line_count"),
          count(when(!col("hi"), 1)).cast(LongType).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // ---- #195 TPC-H Q14 shape: promo revenue share -------------------------
    // Revenue share of ECONOMY-type parts — the broadcast-dim conditional
    // revenue ratio. The part dim projects to (key, flag) and broadcasts
    // (constant-size at any fact scale); revenue = price·(1−disc) sums
    // EXACTLY in DECIMAL (the §5 rule: a double fold here hash-diverges),
    // double only at the final ratio → round(·,4).
    "q14_promo_share" -> OpDef(
      """SELECT
        |  round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
        |      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
        |    AS promo_share_pct,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin
    ) { (s, dir) =>
      val p = tbl(s, dir, "part")
        .select(col("p_partkey"), (col("p_type") === "ECONOMY").as("promo"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_partkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .as("rev"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("promo"), col("rev"))).cast(DoubleType)
            / sum(col("rev")).cast(DoubleType), 4).as("promo_share_pct"),
          count(lit(1)).cast(LongType).as("n_lines"))
    }
  )
}
