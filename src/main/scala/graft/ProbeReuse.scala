package graft

/** r17 measurement probe: does AQE runtime exchange reuse actually dedupe
  * the repeated exchange-rooted subtrees that r17 un-persisted? Runs each
  * named query through the noop sink and counts `Scan parquet` /
  * `ReusedExchange` / table-cache nodes in the EXECUTED (final adaptive)
  * plan — the static explain shows `isFinalPlan=false` and no reuse, so
  * only the executed plan answers the 100 TB question (a dropped persist
  * must NOT mean the fact table scans N times).
  *
  * Usage: runMain graft.ProbeReuse <sfDir> <query> [<query> ...]
  */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val df = SparkEntry.queries(q)(spark, args(0))
      // collect() (not a noop write, which clones into a separate
      // QueryExecution) so THIS df's adaptive plan is the one that ran and
      // its final form — including runtime exchange reuse — is inspectable.
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String): Int = pat.r.findAllIn(p).length
      val stageIds = "ShuffleQueryStage ([0-9]+)".r.findAllMatchIn(p)
        .map(_.group(1)).toSeq
      val dupStages = stageIds.size - stageIds.distinct.size
      println(s"EXEC $q scans=${c("Scan parquet")} reused=${c("ReusedExchange")}" +
        s" stageRefs=${stageIds.size} distinctStages=${stageIds.distinct.size}" +
        s" dupStageRefs=$dupStages inMemory=${c("InMemoryTableScan")}")
      val out = java.nio.file.Paths.get(s"target/plans_exec/${q}.txt")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, p.getBytes("UTF-8"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
