package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic point-in-interval (range) join — the inequality join Spark's
  * planner can only execute as a broadcast-nested-loop / cartesian product,
  * rewritten as the scalable bucketed equi-join:
  *
  *   - every interval explodes into the coarse buckets it overlaps
  *     (`sequence(lo div w, hi div w)` — O(span / width) rows per interval),
  *   - every point maps to its single bucket,
  *   - a hash equi-join on the bucket id meets each point with exactly the
  *     intervals sharing its bucket, and the exact `lo ≤ p ≤ hi` predicate
  *     filters the remaining false bucket-mates.
  *
  * Shuffle volume is O(points + intervals × span/width) — tunable by
  * `width` (best ≈ the median interval span, one bucket row per interval) —
  * instead of the nested-loop's O(points × intervals) comparisons. This is
  * the composition-first answer (SURVEY §4) to the range-join optimization
  * native engines special-case; at a 100 TB fact side AQE additionally
  * splits skewed buckets.
  */
object RangeJoin {

  /** Join `points` to every interval containing the point, over a LONG
    * domain (callers map dates/timestamps to day/second numbers first).
    * Column names must be disjoint; both frames keep all their columns.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val ib = intervals.withColumn("_bucket",
      explode(sequence(expr(s"$loCol div $width"), expr(s"$hiCol div $width"))))
    val pb = points.withColumn("_bucket", expr(s"$pointCol div $width"))
    pb.join(ib, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Interval-overlap join (`loL ≤ hiR && loR ≤ hiL`): both sides explode
    * into their covered buckets, overlapping intervals necessarily share at
    * least one bucket, and the exact predicate filters bucket-mates that
    * merely straddle. A pair sharing SEVERAL buckets would surface once per
    * shared bucket; instead of a full-row distinct (an extra shuffle +
    * exact-dedup of the entire join output — the dominant exchange at scale
    * for wide intervals) each pair is emitted in exactly ONE bucket: the
    * bucket of `greatest(loL, loR)`, the overlap's start, which both sides
    * necessarily cover. A codegen filter riding the join — zero extra
    * shuffle, identical result.
    */
  def intervalOverlap(left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String, width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def exploded(df: DataFrame, lo: String, hi: String) = df.withColumn("_bucket",
      explode(sequence(expr(s"$lo div $width"), expr(s"$hi div $width"))))
    exploded(left, loL, hiL).join(exploded(right, loR, hiR), Seq("_bucket"))
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("_bucket") === expr(s"greatest($loL, $loR) div $width"))
      .drop("_bucket")
  }
}
