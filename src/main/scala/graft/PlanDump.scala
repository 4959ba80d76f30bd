package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, args(0)).queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
