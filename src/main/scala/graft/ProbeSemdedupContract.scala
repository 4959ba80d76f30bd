package graft

import org.apache.spark.sql.functions._

/** Measures the SemDeDup PRODUCTION CONTRACT the r13 scaladoc argues
  * (dedup/Dedup.scala, Graft.nearDupEmbedding): "production corpora run
  * finer blocks (k ∝ n, the SemDeDup paper trains k-means with k
  * proportional to corpus size) and tighter τ, which shrink output and
  * edges, not just compute." The r13 sf10 sweep measured the deliberate
  * WORST CASE — the test corpus's 10 coarse labels — at 534 s
  * (dedup_embedding) / 1301 s (semdedup, CC over 2.0e9 surviving edges).
  * This probe runs the SAME kernel + components at sf10 with the contract
  * honored: k ≈ √n Lloyd-trained cells (the exact k-means the IVF index
  * uses — graft.ann.Ann.trainIvfCentroids) as the block key, at the sweep
  * τ and a tighter one.
  *
  * Output: one JSON line per config with train/assign/kernel/CC wall
  * times and survivor-edge counts, mirrored to
  * `BENCH_sf10_r14_semdedup_contract.json` when SPARK_GRAFT_BENCH_OUT is
  * set. Usage: scripts/run_main.sh graft.ProbeSemdedupContract <sfDir> [k]
  */
object ProbeSemdedupContract {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-local/sf10")
    val k = args.lift(1).map(_.toInt).getOrElse(704)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    // offline half (the one-time index build a deployment amortizes):
    // Lloyd training + cell assignment + artifact write — the PUBLIC
    // ann_ivf build surface, at k ∝ √n instead of the default cell count
    val idxDir = s"target/probe_semdedup_ivf_k$k"
    val (_, tBuild) = timed {
      graft.ann.Ann.buildIvfIndex(spark, dir, idxDir, cells = k, lloydIters = 2)
    }
    val (blocks, tAssign) = timed {
      val b = emb
        .join(spark.read.parquet(s"$idxDir/cells"), "vec_id")
        .select(col("cell").as("label"), col("vec_id"),
          col("embedding").as("e"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }
    System.err.println(f"[probe] n=$n k=$k build=$tBuild%.1f s blockjoin=$tAssign%.1f s")
    val results = Seq(0.35, 0.5).map { tau =>
      val (edges, tKernel) = timed {
        graft.dedup.Dedup.blockCosinePairs(blocks, tau).count()
      }
      val (comps, tCc) = timed {
        graft.dedup.Dedup.connectedComponents(
          graft.dedup.Dedup.blockCosinePairs(blocks, tau)
            .select(col("vec_a").as("a"), col("vec_b").as("b"))).count()
      }
      System.err.println(
        f"[probe] tau=$tau kernel=$tKernel%.1f s edges=$edges cc=$tCc%.1f s nodes=$comps")
      f"""{"tau":$tau,"kernel_s":$tKernel%.1f,"edges":$edges,"cc_s":$tCc%.1f,"cc_nodes":$comps}"""
    }
    val line =
      s"""{"probe":"semdedup_contract","sf":"$dir","n_vectors":$n,"k":$k,""" +
        f""""index_build_s":$tBuild%.1f,"block_join_s":$tAssign%.1f,""" +
        s""""configs":[${results.mkString(",")}],""" +
        s""""coarse_worst_case_r13":{"k":10,"tau":0.35,"dedup_embedding_s":534.0,"semdedup_s":1301.0}}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    println(line)
  }
}
