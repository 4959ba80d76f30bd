package graft

import graft.cdc.TypeNormalizer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CdcSpec extends SparkSpecBase {

  test("last-state excludes pks whose final op is DELETE") {
    val state = run("cdc_last_state").collect().map(_.getLong(0)).toSet
    val finalOps = graft.sources.Changes(spark, sfDir)
      .withColumn("rn", expr("row_number() over (partition by pk order by block desc)"))
      .filter(col("rn") === 1).select("pk", "op").collect()
    finalOps.foreach { r =>
      assert(state.contains(r.getLong(0)) == (r.getString(1) != "DELETE"))
    }
  }

  test("merge-fields amount agrees with last-state where both survive") {
    val a = run("cdc_last_state").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = run("cdc_merge_fields").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // merge keeps rows whose last op isn't DELETE but that had a DELETE
    // earlier — last-state pk set is a subset relation check:
    a.foreach { case (pk, amount) => assert(b.get(pk).forall(_ == amount)) }
  }

  test("TypeNormalizer: epoch seconds and ISO strings both land on timestamps") {
    import spark.implicits._
    val df = Seq("1700000000", "2023-11-14 22:13:20").toDF("v")
      .select(TypeNormalizer.normalize(col("v"), TimestampType).as("ts"))
    val ts = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as[String].collect()
    assert(ts(0) == "2023-11-14 22:13:20" && ts(1) == "2023-11-14 22:13:20")
  }

  test("TypeNormalizer: bool/int/double/unknown") {
    import spark.implicits._
    val df = Seq(("true", "42", "1.5", "raw")).toDF("b", "i", "d", "s")
    val out = df.select(
      TypeNormalizer.normalize(col("b"), BooleanType),
      TypeNormalizer.normalize(col("i"), LongType),
      TypeNormalizer.normalize(col("d"), DoubleType),
      TypeNormalizer.normalize(col("s"), StringType)).collect()(0)
    assert(out.getBoolean(0) && out.getLong(1) == 42L && out.getDouble(2) == 1.5
      && out.getString(3) == "raw")
  }

  test("normalizeAll leaves columns absent from the target schema untouched") {
    import spark.implicits._
    val df = Seq(("7", "x")).toDF("n", "extra")
    val out = TypeNormalizer.normalizeAll(df, StructType(Seq(StructField("n", LongType))))
    assert(out.schema("n").dataType == LongType)
    assert(out.schema("extra").dataType == StringType)
  }
}
