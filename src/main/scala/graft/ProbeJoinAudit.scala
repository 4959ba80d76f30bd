package graft

/** One-off audit probe: executes every registered query at the given SF dir
  * and prints the ones whose physical plan contains a
  * BroadcastNestedLoopJoin or CartesianProduct — the discovery pass behind
  * PlanAuditSpec's suite-wide quadratic-join whitelist (r16).
  */
object ProbeJoinAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- SparkEntry.allDefs.keys.toSeq.sorted) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.count()
        val a = PlanAudit.audit(df.queryExecution.executedPlan)
        if (a.nestedLoopJoins > 0 || a.cartesianJoins > 0)
          println(s"QUADRATIC $name bnlj=${a.nestedLoopJoins} cartesian=${a.cartesianJoins}")
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    println("DONE")
    spark.stop()
  }
}
