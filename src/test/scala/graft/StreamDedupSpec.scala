package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Emission spec for the streaming near-dup screen (#260): the SAME
  * stateful operator run incrementally over an ordered two-batch replay
  * must emit EXACTLY the batch hit set (not a subset — the index admits by
  * arrival order, which the ordered replay preserves across micro-batches).
  */
class StreamDedupSpec extends SparkSpecBase {

  private def signedDocs = {
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        call_function("simhash64", array_distinct(split(col("text"), " ")))
          .as("sig"))
  }

  test("stream emissions equal batch hit set on ordered replay") {
    implicit val s = spark
    import s.implicits._
    val cap = graft.dedup.Dedup.lshBucketCap(spark)
    val signed = signedDocs
    val rows = signed.as[(Long, Long)].collect().sortBy(_._1)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = StreamDedup.simhashBandHits(
        in.toDF().toDF("doc_id", "sig"), cap)
      .writeStream.format("memory").queryName("ssd").outputMode("append").start()
    in.addData(h1.toSeq); q.processAllAvailable()
    in.addData(h2.toSeq); q.processAllAvailable()
    q.stop()
    val streamHits = spark.sql("select doc_id, eid, ham from ssd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchHits = StreamDedup.simhashBandHits(signed, cap).collect()
      .map(h => (h.doc_id, h.eid, h.ham)).toSet
    assert(streamHits == batchHits,
      s"stream-only: ${(streamHits diff batchHits).take(3)}; " +
        s"batch-only: ${(batchHits diff streamHits).take(3)}")
    assert(batchHits.nonEmpty, "fixture produced no near-dup hits")
  }

  test("first-cap index: a saturated bucket stops absorbing state") {
    implicit val s = spark
    import s.implicits._
    // 5 identical signatures in one bucket with cap=3: docs 4 and 5 probe
    // the 3 indexed entries but are not indexed themselves
    val sig = 0x123456789ABCDL
    val signed = (1L to 5L).map(id => (id, sig)).toDF("doc_id", "sig")
    val hits = StreamDedup.simhashBandHits(signed, cap = 3).collect()
      .map(h => (h.doc_id, h.eid)).toSet
    val expected = Set(2L -> 1L, 3L -> 1L, 3L -> 2L,
      4L -> 1L, 4L -> 2L, 4L -> 3L, // doc4 sees the full index...
      5L -> 1L, 5L -> 2L, 5L -> 3L) // ...doc5 the same 3, NOT doc4
    assert(hits == expected)
  }

  test("the oracle-checked query screens against indexed earlier docs only") {
    val out = run("stream_simhash_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).distinct.length == out.length, "one row per doc")
    // every reported neighbor is earlier and within radius; uniques are -1/-1
    out.foreach { case (d, e, h) =>
      if (e == -1L) assert(h == -1L)
      else { assert(e < d); assert(h >= 0L && h <= 2L) }
    }
    assert(out.exists(_._2 >= 0L), "fixture has near-dups; none flagged")
  }
}
