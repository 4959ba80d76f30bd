package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shingle block-join volume probe: prints, for one SF dir, the quantities
  * that decide whether the n-gram candidate joins survive a scale-up —
  * total shingle rows, rows surviving the df cap, the RAW pair multiset the
  * block self-join emits (Σ C(df,2) over kept blocks — what actually hits
  * the shuffle), and the DISTINCT candidate count at tau=0 (containment)
  * vs tau=0.5 (Jaccard size-ratio prefilter).
  *
  * Built while diagnosing the r10 sf10 probe: dedup_containment filled a
  * 75 GB disk with shuffle at sf10 (500k docs) while costing 3 s at sf3.
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
    val cap = dedup.Dedup.ngramDfCap(spark)
    val blocks = e.groupBy("lang", "source", "h").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = blocks.filter(col("df") <= cap)
    val keptRows = kept.agg(sum("df")).head.getLong(0)
    val rawPairs = kept.agg(sum(col("df") * (col("df") - 1))).head.getLong(0) / 2
    val nBlocks = blocks.count()
    val hotBlocks = blocks.filter(col("df") > cap).count()
    println(s"[probe] $sfDir: shingle_rows=$total blocks=$nBlocks " +
      s"hot_blocks=$hotBlocks kept_rows=$keptRows raw_pair_rows=$rawPairs")
    for (tau <- Seq(0.5, 0.0)) {
      val t0 = System.nanoTime()
      val nCand = dedup.Dedup.ngramCandidates(e, tau, cap).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] tau=$tau%.1f distinct_cand=$nCand ($dt%.1f s)")
    }
    blocks.unpersist(); e.unpersist()
    spark.stop()
  }
}
