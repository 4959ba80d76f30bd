package graft

import graft.cdc.{ChangeLoader, MaterializedAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property: incremental rollup maintenance commutes with flush batching —
  * for ANY op sequence and ANY batch split, folding each batch into the agg
  * state with [[MaterializedAgg.merge]] lands on exactly
  * [[MaterializedAgg.recompute]] of the final snapshot. Exact decimal
  * totals are what make this hold bit-for-bit (double sums would drift with
  * the fold order). Covers deletes, revives, group migration, null groups
  * and null values via the seeded-random feed.
  */
class MaterializedAggPropertySpec extends SparkSpecBase {

  private val fields = Seq("amount", "kval", "note")
  private val mv = MaterializedAgg.MvDef("note", "amount")

  private def randomFeed(rnd: Random): Seq[(Long, Long, String, Option[Double], Option[Long], Option[String])] = {
    val n = 8 + rnd.nextInt(30)
    (0 until n).map { i =>
      val pk = 1L + rnd.nextInt(5)
      val op = rnd.nextInt(9) match {
        case x if x < 2 => "INSERT"
        case x if x < 7 => "UPDATE"
        case _          => "DELETE"
      }
      def opt[A](v: => A): Option[A] = if (rnd.nextBoolean()) Some(v) else None
      if (op == "DELETE") (i.toLong, pk, op, None, None, None)
      else (i.toLong, pk, op,
        opt(rnd.nextInt(100) / 4.0), opt(rnd.nextInt(10).toLong),
        opt(Seq("g1", "g2", "g3")(rnd.nextInt(3)))) // group col; None = null group
    }
  }

  private def toDf(rows: Seq[(Long, Long, String, Option[Double], Option[Long], Option[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("block", "pk", "op", "amount", "kval", "note")
  }

  test("per-batch delta maintenance equals recompute for random feeds and splits") {
    val rnd = new Random(7)
    for (_ <- 1 to 8) {
      val rows = randomFeed(rnd)
      val whole = toDf(rows)
      val cut1 = rnd.nextInt(rows.size).toLong
      val cut2 = cut1 + rnd.nextInt(rows.size - cut1.toInt).toLong
      val batches = Seq(
        whole.filter(col("block") <= cut1),
        whole.filter(col("block") > cut1 && col("block") <= cut2),
        whole.filter(col("block") > cut2))
      val emptySnap = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        whole.select(col("pk"), col("amount"), col("kval"), col("note")).schema)
      var snap = emptySnap
      var agg = MaterializedAgg.empty(whole, mv)
      for (b <- batches if !b.isEmpty) {
        val collapsed = ChangeLoader.collapse(b, fields)
        val touched = collapsed.select("pk")
        val priorTouched = snap.join(touched, Seq("pk"), "left_semi")
        val newTouched = ChangeLoader.applyBatch(priorTouched, collapsed, fields)
        agg = MaterializedAgg.merge(agg, priorTouched, newTouched, mv)
        snap = ChangeLoader.applyBatch(snap, collapsed, fields)
      }
      val got = agg.collect().map(_.toSeq).toSet
      val exp = MaterializedAgg.recompute(snap, mv).collect().map(_.toSeq).toSet
      assert(got == exp, s"feed=${rows.take(6)}... cuts=($cut1,$cut2)")
    }
  }
}
