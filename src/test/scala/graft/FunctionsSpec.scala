package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpecBase {

  test("cosine_sim matches the interpreted HOF formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val a = v.selectExpr("vec_id as ia", "embedding as ea")
    val b = v.selectExpr("vec_id as ib", "embedding as eb")
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val hof = expr(
      """aggregate(zip_with(ea, eb, (x, y) -> double(x) * double(y)), 0.0D, (acc, x) -> acc + x)
        | / (sqrt(aggregate(ea, 0.0D, (acc, x) -> acc + double(x) * double(x)))
        |    * sqrt(aggregate(eb, 0.0D, (acc, x) -> acc + double(x) * double(x))))""".stripMargin)
    val diff = pairs
      .select(call_function("cosine_sim", col("ea"), col("eb")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0)
  }

  test("cosine_sim nulls and length mismatch") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 1.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f)))
    ).toDF("a", "b")
    val out = df.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).isNullAt(0))
    assert(out(3).isNullAt(0))
  }

  test("cosine_sim is SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0F, 2.0F), array(2.0F, 4.0F)) c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("every scalar expression COMPILES under CODEGEN_ONLY (no Janino fallback)") {
    // A doGenCode that emits malformed Java fails at runtime with a SILENT
    // interpreter fallback (the class-based plan audit can't see it —
    // exactly how a leading '|' once slipped through pq_adc). Forcing
    // CODEGEN_ONLY turns any such fallback into a hard error here.
    GraftFunctions.register(spark)
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((Seq(1.0f, 2.0f, -3.0f), Seq(0.5f, 1.5f, 2.5f),
        Seq(0, 1), Seq(1.0, 2.0, 3.0, 4.0), Seq("a", "b"), 2L))
        .toDF("a", "b", "codes", "tbl", "ws", "n")
      val out = df.select(
        call_function("cosine_sim", col("a"), col("b")).as("cs"),
        call_function("l2_sq", col("a"), col("b")).as("l2"),
        call_function("pq_adc", col("codes"), col("tbl"), col("tbl")).as("adc"),
        call_function("vec_absmax", col("a")).as("mx"),
        call_function("quantize_i8", col("a")).as("q"),
        call_function("simhash64", col("ws")).as("sh"),
        call_function("md5_chain", col("ws")).as("mc"),
        call_function("bpe_cost", col("ws")).as("bc"),
        call_function("count_in", col("ws"), array(lit("a"))).as("ci")
      ).collect()
      assert(out.length == 1 && !out(0).anyNull)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
