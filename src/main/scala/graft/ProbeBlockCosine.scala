package graft

import org.apache.spark.sql.functions._

/** Build-loop probe: counts the τ-survivor pair set of the block-cosine
  * kernel and wall-times kernel-only vs full-query (sort + round + force)
  * so the residual cost of dedup_embedding at scale is attributed to the
  * right stage (output volume is a CONTRACT cost — τ=0.35 on clustered
  * embeddings keeps many same-cluster pairs — not a plan defect).
  *
  * Usage: scripts/run_main.sh graft.ProbeBlockCosine <sfDir>
  */
object ProbeBlockCosine {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val v = graft.sources.Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding").as("e"))
    v.count()
    val n = time("kernel-only count") {
      graft.dedup.Dedup.blockCosinePairs(v, tau = 0.35).count()
    }
    System.err.println(s"[probe] survivors=$n")
    time("full dedup_embedding shape (noop)") {
      graft.dedup.Dedup.blockCosinePairs(v, tau = 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
        .orderBy("vec_a", "vec_b")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
