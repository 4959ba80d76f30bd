package graft

import graft.sources.Tables

/** The sf1 probe is only as good as its generator: it must be (a) fully
  * deterministic — same bytes-of-values on every run at any parallelism —
  * and (b) schema-identical to the driver tables once loaded through
  * [[Tables]] (which normalizes the events timestamp encoding).
  */
class GenTestDataSpec extends SparkSpecBase {

  private def hashOf(dir: String, name: String): Long = {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, dir, name)
    // xor: order-independent content fingerprint, no ANSI sum overflow
    df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .selectExpr("bit_xor(h)").collect()(0).getLong(0)
  }

  test("generator is run-to-run deterministic at different parallelism") {
    val d1 = java.nio.file.Files.createTempDirectory("gen1").toString
    val d2 = java.nio.file.Files.createTempDirectory("gen2").toString
    GenTestData.generate(spark, d1, 0.002)
    // different shuffle partitioning must not change a single value
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try GenTestData.generate(spark, d2, 0.002)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    Seq("customer", "orders", "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        assert(hashOf(d1, t) == hashOf(d2, t), s"$t diverged between runs")
      }
  }

  test("generated tables load schema-identical to the driver tables") {
    val d = java.nio.file.Files.createTempDirectory("gen3").toString
    GenTestData.generate(spark, d, 0.002)
    Tables.names.foreach { t =>
      val got = Tables(spark, d, t).schema.map(f => (f.name, f.dataType))
      val exp = Tables(spark, sfDir, t).schema.map(f => (f.name, f.dataType))
      assert(got == exp, s"$t schema mismatch: $got vs $exp")
    }
  }
}
