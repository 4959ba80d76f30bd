package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) in some driver rounds, which
    // Spark's vectorized reader rejects; read it as raw nanos and truncate
    // to a µs TimestampType column (`div` keeps the arithmetic in longs —
    // nanos overflow a double).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val fixed = if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
    normalizeNtz(fixed)
  }

  /** Driver rounds also vary the parquet timestamp encoding between
    * instant (TIMESTAMP_MICROS) and naive (TIMESTAMP_NTZ). NTZ surfaces
    * as LocalDateTime and breaks Row.getTimestamp call sites and schema
    * pins, so normalize every NTZ column to µs TimestampType here at the
    * single read chokepoint — the session timezone is pinned UTC, making
    * the cast value-preserving, and the DuckDB oracle reads parquet as
    * naive timestamps either way.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    ntz.foldLeft(df)((d, f) =>
      d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** Register every table as a temp view (for spark.sql-driven flows). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
