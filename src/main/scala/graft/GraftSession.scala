package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the confs every graft job needs.
  *
  * Designed for a real cluster (AQE on, skew-join handling, sane shuffle
  * partitioning); in this repo it is exercised through `local[N]`.
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Runtime-settable confs applied when a query runs against a session we
    * did not build (the driver's Verify/Bench sessions).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // InferWindowGroupLimit's default threshold (1000) silently refuses the
    // k-row-heap rewrite for larger bounded ranks — quantile_deterministic's
    // rn <= 8192 presample trim was buffering+sorting whole groups (r15
    // mechanical sweep catch). An 8192-row heap per group is a few MB:
    // strictly better than a full per-group sort at any scale.
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "16384")
    spark
  }
}
