package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shingle candidate-volume probe: prints, for one SF dir, the quantities
  * that decide whether the n-gram candidate joins survive a scale-up —
  * total shingle rows, the RAW pair multiset an uncapped block self-join
  * WOULD emit (Σ C(df,2) over blocks — the r1-r9 algorithm's shuffle
  * volume, quadratic inside near-dup families), and the DISTINCT candidate
  * count the AllPairs prefix filter actually produces at τ=0.5 (Jaccard,
  * with size-ratio prefilter) and τ=0.7 (containment, without).
  *
  * Built while diagnosing the r10 sf10 probe: dedup_containment's block
  * self-join filled a 75 GB disk with shuffle at sf10 (500k docs) while
  * costing 3 s at sf3. The prefix filter replaced it in r11; this probe
  * now reports both volumes so future scale-ups can compare.
  * Usage: sbt "runMain graft.DedupScaleProbe <sfDir>"
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = sources.Tables(spark, sfDir, "documents")
    val e = dedup.Dedup.shingleRowsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = e.count()
    val blocks = e.groupBy("lang", "source", "h").agg(count(lit(1)).as("df"))
    val agg = blocks.agg(
      count(lit(1)).as("n_blocks"),
      sum(col("df") * (col("df") - 1)).as("raw2")).head
    val nBlocks = agg.getLong(0)
    val rawPairs = agg.getLong(1) / 2
    println(s"[probe] $sfDir: shingle_rows=$total blocks=$nBlocks " +
      s"uncapped_selfjoin_pair_rows=$rawPairs")
    val regimes = Seq(
      ("jaccard tau=0.5", 1, 2, 0.5, true),
      ("containment tau=0.7", 7, 10, 0.0, false))
    for ((name, num, den, sizeTau, both) <- regimes) {
      val t0 = System.nanoTime()
      val nCand = dedup.Dedup.prefixCandidates(e, num, den, sizeTau, both).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] prefix $name distinct_cand=$nCand ($dt%.1f s)")
    }
    e.unpersist()
    spark.stop()
  }
}
