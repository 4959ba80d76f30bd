package graft

import graft.cdc.ChangeLoader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property: flush composition is associative — applying a change feed in
  * ANY batch split yields the same snapshot as one-shot collapse+apply.
  * This is the invariant the reference's every-N-blocks flush relies on
  * (`db/flush.go`), checked over seeded-random op sequences and split
  * points (including 3-way splits and empty batches).
  */
class ChangeLoaderPropertySpec extends SparkSpecBase {

  private val fields = Seq("amount", "kval", "note")

  private def randomFeed(rnd: Random): Seq[(Long, Long, String, Option[Double], Option[Long], Option[String])] = {
    val n = 5 + rnd.nextInt(36)
    (0 until n).map { i =>
      val pk = 1L + rnd.nextInt(6)
      val op = rnd.nextInt(9) match {
        case x if x < 2 => "INSERT"
        case x if x < 7 => "UPDATE"
        case _          => "DELETE"
      }
      def opt[A](v: => A): Option[A] = if (rnd.nextBoolean()) Some(v) else None
      if (op == "DELETE") (i.toLong, pk, op, None, None, None)
      else (i.toLong, pk, op,
        opt(rnd.nextInt(100).toDouble), opt(rnd.nextInt(10).toLong),
        opt(Seq("a", "b", "c")(rnd.nextInt(3))))
    }
  }

  private def toDf(rows: Seq[(Long, Long, String, Option[Double], Option[Long], Option[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("block", "pk", "op", "amount", "kval", "note")
  }

  private def emptySnap(ch: DataFrame): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      ch.select(col("pk"), col("amount"), col("kval"), col("note")).schema)

  private def snapshotOf(whole: DataFrame, cuts: Seq[Long]): Set[Seq[Any]] = {
    val bounds = (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2).toSeq
    bounds.foldLeft(emptySnap(whole)) { case (snap, Seq(lo, hi)) =>
      val batch = whole.filter(col("block") >= lo && col("block") < hi)
      ChangeLoader.applyBatch(snap, ChangeLoader.collapse(batch, fields), fields)
    }.collect().map(_.toSeq).toSet
  }

  test("flush composition is associative for random feeds and splits") {
    val rnd = new Random(42)
    for (trial <- 1 to 15) {
      val rows = randomFeed(rnd)
      val df = toDf(rows)
      val n = rows.size.toLong
      val oneShot = snapshotOf(df, Seq.empty)
      val twoPhase = snapshotOf(df, Seq(rnd.nextInt(rows.size).toLong))
      val threePhase = snapshotOf(df, Seq(n / 3, 2 * n / 3).distinct.sorted)
      val withEmpty = snapshotOf(df, Seq(0L)) // first batch empty
      assert(twoPhase == oneShot, s"trial $trial two-phase mismatch")
      assert(threePhase == oneShot, s"trial $trial three-phase mismatch")
      assert(withEmpty == oneShot, s"trial $trial empty-batch mismatch")
    }
  }
}
