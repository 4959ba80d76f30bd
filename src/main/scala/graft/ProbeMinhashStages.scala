package graft

import org.apache.spark.sql.functions._

/** Build-loop probe (not library surface): wall-times each stage of the
  * MinHash-LSH pipeline in isolation so perf work targets the stage that
  * actually costs, instead of the one a sweep number suggests (r13: the
  * verdict blamed minhash_est_error's signature join-backs; this probe
  * showed the whole dedup family pays a fixed multi-exchange floor and the
  * join-backs are free).
  *
  * Usage: scripts/run_main.sh graft.ProbeMinhashStages <sfDir>
  */
object ProbeMinhashStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docsDf = graft.sources.Tables(spark, dir, "documents")
    // warm FS + codegen
    docsDf.count()
    (1 to 2).foreach { rep =>
      System.err.println(s"[probe] --- repetition $rep ---")
      time("bisect: split+size count") {
        val n = docsDf.select(split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3).count()
        System.err.println(s"[probe]   docs=$n parts=${docsDf.rdd.getNumPartitions}")
      }
      time("bisect: explode, no hash, no distinct") {
        docsDf.select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), col("ws"),
            explode(sequence(lit(0), size(col("ws")) - 3)).as("i"))
          .select(col("doc_id"), col("i"))
          .write.mode("overwrite").format("noop").save()
      }
      time("bisect: explode + md5-h32, no distinct") {
        docsDf.select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), col("ws"),
            explode(sequence(lit(0), size(col("ws")) - 3)).as("i"))
          .select(col("doc_id"),
            conv(substring(md5(concat_ws(" ",
              element_at(col("ws"), col("i") + 1),
              element_at(col("ws"), col("i") + 2),
              element_at(col("ws"), col("i") + 3))), 1, 8), 16, 10)
              .cast("long").as("h"))
          .write.mode("overwrite").format("noop").save()
      }
      time("bisect: explode + h32 + distinct") {
        docsDf.select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), col("ws"),
            explode(sequence(lit(0), size(col("ws")) - 3)).as("i"))
          .select(col("doc_id"),
            conv(substring(md5(concat_ws(" ",
              element_at(col("ws"), col("i") + 1),
              element_at(col("ws"), col("i") + 2),
              element_at(col("ws"), col("i") + 3))), 1, 8), 16, 10)
              .cast("long").as("h"))
          .distinct()
          .write.mode("overwrite").format("noop").save()
      }
      val e = time("shingleRows (distinct, persisted, counted)") {
        val e0 = graft.dedup.Dedup.shingleRowsOf(docsDf)
          .select("doc_id", "h")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        System.err.println(s"[probe]   rows=${e0.count()}")
        e0
      }
      val sig = time("minhash16 signatures (count)") {
        val s0 = e.groupBy("doc_id")
          .agg(call_function("minhash16", col("h")).as("mh"))
        System.err.println(s"[probe]   sigs=${s0.count()}")
        s0
      }
      sig.unpersist()
      val cand = time("band join candidates (count)") {
        val c = graft.dedup.Dedup.minhashCandidates(spark, e)
        System.err.println(s"[probe]   cand=${c.count()}")
        c
      }
      time("verify via sorted sets (noop force)") {
        val sets = e.groupBy("doc_id")
          .agg(sort_array(collect_list(col("h"))).as("sh"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
            Seq("doc_a"))
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
            Seq("doc_b"))
          .withColumn("n_int",
            call_function("sorted_intersect_count", col("sh_a"), col("sh_b")))
          .drop("sh_a", "sh_b")
          .write.mode("overwrite").format("noop").save()
      }
      time("full minhashLshPairs (noop force)") {
        graft.dedup.Dedup.minhashLshPairs(docsDf, tau = 0.35)
          .write.mode("overwrite").format("noop").save()
      }
      e.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
