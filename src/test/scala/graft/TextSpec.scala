package graft

import org.apache.spark.sql.functions._

class TextSpec extends SparkSpecBase {

  test("quality metrics are bounded ratios") {
    val rows = run("text_quality").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0001, "distinct_ratio")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1.0001, "stop_ratio")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1.0001, "quality")
    }
  }

  test("fingerprint is order-sensitive (reversed words → different fp)") {
    import spark.implicits._
    val two = Seq("a b c", "c b a").toDF("text")
    val fp = aggregate(split(col("text"), " "), lit(""),
      (acc, w) => md5(concat(acc, lit(":"), w)))
    val fps = two.select(fp).as[String].collect()
    assert(fps(0) != fps(1))
  }

  test("token counts: ws == re on punctuation-free text, bpe >= ws") {
    val rows = run("text_tokens").collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    assert(rows.forall(r => r.getLong(3) >= r.getLong(1)))
  }

  test("langid always predicts a lexicon language or 'und', hits consistent") {
    val rows = run("text_langid").collect()
    val langs = Set("en", "de", "fr", "es", "und")
    assert(rows.forall(r => langs(r.getString(1))))
    assert(rows.forall(r => (r.getString(1) == "und") == (r.getLong(2) == 0L)))
  }

  test("doc_repetition equals a direct distinct-gram recompute") {
    val got = run("doc_repetition").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exp = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map { r =>
        val ws = r.getString(1).toLowerCase.split(" ", -1).toSeq
        val n = ws.size
        val grams = ws.zip(ws.tail)
        val g = if (n > 1) (grams.size - grams.distinct.size).toDouble / grams.size else 0.0
        r.getLong(0) -> ((g, (n - ws.distinct.size).toDouble / n))
      }.toMap
    assert(got == exp)
    assert(got.values.exists(_._1 > 0), "no doc has any duplicate 2-gram — vacuous")
    assert(got.values.forall { case (a, b) => a >= 0 && a <= 1 && b >= 0 && b <= 1 })
  }
}
