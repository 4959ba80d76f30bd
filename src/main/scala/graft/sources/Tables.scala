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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; read it as raw nanos and truncate to a µs TimestampType column
    // (`div` keeps the arithmetic in longs — nanos overflow a double).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // locally-generated probe SFs (graft.GenTestData) write ts as
      // TIMESTAMP_MICROS directly — only the driver's NANOS files arrive
      // as raw longs needing the truncating conversion. Driver files may
      // also arrive as TIMESTAMP_NTZ (naive wall clock); the session tz is
      // pinned to UTC, so casting to TimestampType is value-preserving and
      // keeps every downstream consumer (and the DuckDB oracle, which is
      // naive-timestamp anyway) on the schema the bank was built against.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a temp view (for spark.sql-driven flows). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
