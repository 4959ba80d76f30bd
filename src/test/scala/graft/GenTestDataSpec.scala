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

  test("closed-vocab output is pinned across rounds (r12 refactor guard)") {
    // the r12 word() refactor (open-vocab mode) must not move a byte of
    // the closed-mode output: testdata-local/sf{1,3,10} and every probe
    // number derived from them assume regeneration is identity
    val d = java.nio.file.Files.createTempDirectory("genpin").toString
    GenTestData.generate(spark, d, 0.002)
    assert(hashOf(d, "documents") == 1564068213795152577L,
      "closed-vocab documents content drifted from the r9-r11 corpus")
  }

  test("open-vocab mode: Zipf 2^20 word space, dup families, same schema") {
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("genopen").toString
    GenTestData.generate(spark, d, 0.05, openVocab = true)
    val docs = Tables(spark, d, "documents")
    // same schema as the driver corpus — the oracle SQL is vocab-agnostic
    assert(docs.schema.map(f => (f.name, f.dataType)) ==
      Tables(spark, sfDir, "documents").schema.map(f => (f.name, f.dataType)))
    // open vocabulary: thousands of distinct words at 2.5k docs (the
    // closed corpus has 31), Zipfian head (rank-1 word ≈ 5% of tokens)
    val words = docs.selectExpr("explode(split(text, ' ')) AS w")
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(words.length > 2000, s"only ${words.length} distinct words")
    val tot = words.map(_._2).sum.toDouble
    val top = words.maxBy(_._2)
    assert(top._1 == "w1" && top._2 / tot > 0.03 && top._2 / tot < 0.07,
      s"Zipf head off: $top of $tot")
    // the seeded dup/near-dup families survive the vocab swap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exact = texts.count { case (id, t) => texts.get(id - 10).contains(t) }
    val near = texts.count { case (id, t) =>
      id >= 10 && texts.get(id - 10).exists(b => t != b && t.startsWith(b + " ")) }
    assert(exact >= 2, s"exact-dup family too thin: $exact")
    assert(near >= 2, s"near-dup family too thin: $near")
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
