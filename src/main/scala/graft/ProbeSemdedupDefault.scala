package graft

import org.apache.spark.sql.functions._

/** Measures the r15 DEFAULT semdedup path end-to-end — the r14 verdict's
  * "done" record: `Graft.nearDupEmbedding` on the sf10 embeddings corpus
  * with NO conf overrides, so the auto-switch itself decides (10 coarse
  * labels of ~50k rows each all exceed `spark.graft.dedup.maxBlock`=8192
  * → √n ≈ 704 Lloyd cells trained INLINE by the primitive assignCells
  * kernel). Contrast records: the r13/r14 label-path worst case measured
  * 994-1301 s; the r14 opt-in contract probe measured ~20 s online with a
  * 1238 s amortized index build (BENCH_sf10_r14_semdedup_contract.json).
  * This probe exists to show the DEFAULT now lands in that class with the
  * training included.
  *
  * Output: one JSON line with pair-kernel and connected-components wall
  * times + survivor counts at the sweep τ, mirrored to
  * SPARK_GRAFT_BENCH_OUT when set.
  * Usage: scripts/run_main.sh graft.ProbeSemdedupDefault <sfDir>
  */
object ProbeSemdedupDefault {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-local/sf10")
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
    val g = Graft(spark, dir)
    val v = graft.sources.Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding").as("e"))
    val n = v.count()
    val results = Seq(0.35, 0.5).map { tau =>
      // pairs_s covers the WHOLE default path: size probe + inline Lloyd
      // training + assignment + block join + kernel; the persisted pair
      // frame then feeds CC so cc_s is pure components work
      val pairs = g.nearDupEmbedding(v, tau)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (edges, tPairs) = timed { pairs.count() }
      val (comps, tCc) = timed {
        g.dedupClusters(
          pairs.select(col("vec_a").as("a"), col("vec_b").as("b"))).count()
      }
      pairs.unpersist(blocking = false)
      g.releaseCaches()
      System.err.println(
        f"[probe] tau=$tau pairs=$tPairs%.1f s edges=$edges cc=$tCc%.1f s nodes=$comps")
      f"""{"tau":$tau,"pairs_s":$tPairs%.1f,"edges":$edges,"cc_s":$tCc%.1f,"cc_nodes":$comps}"""
    }
    val line =
      s"""{"probe":"semdedup_default","sf":"$dir","n_vectors":$n,""" +
        s""""max_block":${graft.dedup.Dedup.MaxBlockDefault},""" +
        s""""configs":[${results.mkString(",")}],""" +
        s""""note":"DEFAULT nearDupEmbedding path, inline sqrt(n)-cell training included in pairs_s",""" +
        s""""contrast":{"label_path_r13_s":1301.0,"optin_cells_r14_online_s":20.0,"optin_cells_r14_build_s":1238.0}}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    println(line)
  }
}
