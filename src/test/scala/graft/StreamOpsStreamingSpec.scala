package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-mode behavior of the §2.4 transforms whose BATCH shape is
  * oracle-checked (stream_dedup / stream_sessionize queries).
  */
class StreamOpsStreamingSpec extends SparkSpecBase {

  private type Ev = (Long, Long, String, java.sql.Timestamp, Double)
  // 6-tuple fixture: vwap needs the json props weight the Ev rows drop
  private type EvP = (Long, Long, String, java.sql.Timestamp, Double, String)

  private def eventRows(): Array[Ev] = {
    import spark.implicits._
    graft.sources.Tables(spark, sfDir, "events")
      .selectExpr("event_id", "user_id", "event_type", "ts", "value")
      .as[Ev].collect().sortBy(_._4.getTime)
  }

  test("stream dedup: in-batch duplicates collapse, within-watermark replays drop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val in = MemoryStream[Ev]
    val q = StreamOps.dedupStream(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value")
          .select("user_id", "event_type", "event_id", "ts"))
      .writeStream.format("memory").queryName("sd").outputMode("append").start()
    try {
      // (1,a) duplicated in-batch; (2,b) unique → 2 emissions
      in.addData(Seq(
        (10L, 1L, "a", ts(0), 0.0), (11L, 1L, "a", ts(10), 0.0),
        (12L, 2L, "b", ts(20), 0.0)))
      q.processAllAvailable()
      assert(spark.sql("select * from sd").count() == 2)
      // watermark = ts(20) - 1h; (1,a) state (first seen ts(0), expires
      // ts(60)) is alive → replay at ts(15) drops; (3,c) is new → emits
      in.addData(Seq((13L, 1L, "a", ts(15), 0.0), (14L, 3L, "c", ts(25), 0.0)))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, event_type from sd").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows.length == 3 && rows.distinct.length == 3)
      assert(rows.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("windowed quantile sketches on a stream sit in the rank-error window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.windowedQuantiles(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("wq").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val got = spark.sql("select * from wq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      assert(got.nonEmpty, "no window closed — watermark never advanced")
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val exact = ev.groupBy(e => (fmt.format(e._4), e._3))
        .view.mapValues(_.map(_._5).sorted).toMap
      got.foreach { case (day, et, p50, p95) =>
        val vals = exact((day, et))
        val n = vals.length
        val eps = n / 1000 + 1 // accuracy 1000 → rank error ≤ n/1000
        Seq(0.5 -> p50, 0.95 -> p95).foreach { case (p, est) =>
          val lo = vals(math.max(0, (p * (n - 1)).toInt - eps))
          val hi = vals(math.min(n - 1, math.ceil(p * (n - 1)).toInt + eps))
          assert(est >= lo && est <= hi, s"$day/$et p$p: $est outside [$lo, $hi] (n=$n)")
        }
      }
    } finally q.stop()
  }

  test("windowed uniqTheta stream: closed windows equal batch exact distincts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.windowedUniqTheta(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("ut").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val got = spark.sql("select * from ut").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.nonEmpty, "no window closed — watermark never advanced")
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      // exact regime at fixture scale: sketch never saturates, and the
      // 150-user domain makes 60-bit hash collisions impossible in
      // practice — the KMV cell IS the distinct user count
      val exact = ev.groupBy(e => (fmt.format(e._4), e._3))
        .view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      got.foreach { case (k, n) => assert(n == exact(k), s"window $k") }
    } finally q.stop()
  }

  test("windowed bitmap stream: closed windows equal batch exact distincts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.windowedBitmapUniq(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("bu").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val got = spark.sql("select * from bu").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.nonEmpty, "no window closed — watermark never advanced")
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      // bitmaps are exact at EVERY cardinality — no regime caveat at all
      val exact = ev.groupBy(e => (fmt.format(e._4), e._3))
        .view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      got.foreach { case (k, n) => assert(n == exact(k), s"window $k") }
    } finally q.stop()
  }

  test("stream_quantiles BATCH shape sits in the rank-error window (#84 pin)") {
    // The exact-regime pin for the one rows-only query without an oracle
    // twin (r13 verdict item 4): the batch query the driver runs is held
    // to the same rank-error contract the streaming spec pins — every
    // (day, type) sketch value within ±(n/accuracy + 1) ranks of the exact
    // order statistic of the SAME parquet rows.
    val ev = eventRows()
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val exact = ev.groupBy(e => (fmt.format(e._4), e._3))
      .view.mapValues(_.map(_._5).sorted).toMap
    val got = run("stream_quantiles").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == exact.size, "one row per (day, type) group")
    got.foreach { case (day, et, p50, p95) =>
      val vals = exact((day, et))
      val n = vals.length
      val eps = n / 1000 + 1
      Seq(0.5 -> p50, 0.95 -> p95).foreach { case (p, est) =>
        val lo = vals(math.max(0, (p * (n - 1)).toInt - eps))
        val hi = vals(math.min(n - 1, math.ceil(p * (n - 1)).toInt + eps))
        assert(est >= lo && est <= hi,
          s"$day/$et p$p: $est outside [$lo, $hi] (n=$n)")
      }
    }
  }

  test("batch shape of stream_dedup matches distinct keys of the feed") {
    val ev = eventRows()
    val keys = ev.map(e => (e._2, e._3)).distinct
    val batch = run("stream_dedup").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(batch.toSet == keys.toSet && batch.length == keys.length)
  }

  test("streaming sessionization emits watermark-closed sessions matching batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.sessionize(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value")
          .select("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("ss").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from ss").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got.nonEmpty)
    val batch = run("stream_sessionize").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    // append mode only emits sessions the watermark has closed — every one
    // of them must be byte-identical to the batch result's session
    assert(got.subsetOf(batch), s"diff: ${got.diff(batch).take(3)}")
  }

  test("hopping windows on a stream: closed windows match the batch shape") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.hoppingCounts(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("hop").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from hop").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "no hopping window closed — watermark never advanced")
    val batch = run("stream_hop").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.subsetOf(batch), s"diff: ${got.diff(batch).take(3)}")
    // the two-windows-per-event invariant: batch totals double the events
    assert(batch.toSeq.map(_._3).sum == 2L * ev.length)
  }

  test("stream-stream interval join emits exactly the batch pair set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.clickPurchasePairs(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .select("c_id", "p_id")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from ssj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // inner joins emit on match (watermark only bounds state), so after a
    // full drain the stream result IS the batch join — exactly, both ways
    val batch = StreamOps.clickPurchasePairs(
        graft.sources.Tables(spark, sfDir, "events"))
      .select("c_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch, s"stream≠batch: ${got.diff(batch).take(3)} / ${batch.diff(got).take(3)}")
    assert(batch.nonEmpty, "no click→purchase pair at this SF — vacuous")
  }

  test("stateful dwell stream emits exactly the batch lead-window dwell set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows() // ts-ordered: the per-user in-order premise holds
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.dwellRows(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("dw").outputMode("append").start()
    try {
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from dw").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val batch = StreamOps.dwellRows(
        graft.sources.Tables(spark, sfDir, "events")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.size).toMap
    // NoTimeout state + in-order feed: the stateful emission is EXACTLY
    // the batch lead-window dwell multiset, including the cross-batch
    // boundary pairs (state carried the last event of the first half)
    assert(got.nonEmpty)
    assert(got == batch,
      s"multiset diff: ${(got.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff got.toSet).take(3)}")
  }

  test("live OHLC bars: closed windows are byte-identical to the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows()
    // SHUFFLE within each half: open/close must be arrival-order
    // independent (picked by event_id, not by arrival), so a scrambled
    // replay must still converge to the batch bars
    val rnd = new scala.util.Random(7)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.ohlcBars(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("ohlc").outputMode("append").start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    type Bar = (String, Long, Double, Double, Double, Double, Double, Long)
    def bar(r: org.apache.spark.sql.Row): Bar =
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7))
    val got = spark.sql("select * from ohlc").collect().map(bar).toSet
    assert(got.nonEmpty, "no window closed — watermark never advanced")
    val batch = run("stream_ohlc").collect().map(bar).toSet
    assert(got.subsetOf(batch), s"diff: ${got.diff(batch).take(3)}")
    // every bar the final watermark closed must have been emitted: the
    // watermark is max(ts) - 1h, a closed bar ends at or before it
    val wmUs = ev.map(_._4.getTime).max - 3600000L
    val mustClose = batch.filter { b => (b._2 + 3600L) * 1000L <= wmUs }
    assert(mustClose.subsetOf(got),
      s"unemitted closed bars: ${mustClose.diff(got).take(3)}")
  }

  test("live VWAP: closed windows are byte-identical to the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .selectExpr("event_id", "user_id", "event_type", "ts", "value", "props")
      .as[EvP].collect().sortBy(_._4.getTime)
    // shuffled halves: the state is two additive partials, so any arrival
    // order must converge to the identical integer-rounded bar
    val rnd = new scala.util.Random(11)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[EvP]
    val q = StreamOps.vwapBars(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value",
          "props"))
      .writeStream.format("memory").queryName("vwap").outputMode("append")
      .start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    type Bar = (String, Long, Double, Long, Long)
    def bar(r: org.apache.spark.sql.Row): Bar =
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))
    val got = spark.sql("select * from vwap").collect().map(bar).toSet
    assert(got.nonEmpty, "no window closed — watermark never advanced")
    val batch = run("stream_vwap").collect().map(bar).toSet
    assert(got.subsetOf(batch), s"diff: ${got.diff(batch).take(3)}")
    val wmUs = ev.map(_._4.getTime).max - 3600000L
    val mustClose = batch.filter { b => (b._2 + 3600L) * 1000L <= wmUs }
    assert(mustClose.subsetOf(got),
      s"unemitted closed bars: ${mustClose.diff(got).take(3)}")
  }

  test("live corr: closed windows are bit-identical to the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .selectExpr("event_id", "user_id", "event_type", "ts", "value", "props")
      .as[EvP].collect().sortBy(_._4.getTime)
    // shuffled halves: all six partials are additive decimal/integer sums,
    // so any arrival order must converge to the identical double corr
    val rnd = new scala.util.Random(13)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[EvP]
    val q = StreamOps.corrBars(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value",
          "props"))
      .writeStream.format("memory").queryName("corrw").outputMode("append")
      .start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    type CBar = (String, String, Long, Double)
    def bar(r: org.apache.spark.sql.Row): CBar =
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val got = spark.sql("select * from corrw").collect().map(bar).toSet
    assert(got.nonEmpty, "no window closed — watermark never advanced")
    val batch = run("stream_corr").collect().map(bar).toSet
    assert(got.subsetOf(batch), s"diff: ${got.diff(batch).take(3)}")
    // every day window fully behind the watermark must have emitted
    val wmMs = ev.map(_._4.getTime).max - 3600000L
    val dayEndMs = (d: String) => java.time.LocalDate.parse(d)
      .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli
    val mustClose = batch.filter(b => dayEndMs(b._2) <= wmMs)
    assert(mustClose.subsetOf(got),
      s"unemitted closed windows: ${mustClose.diff(got).take(3)}")
  }

  test("live balances: ordered 2-batch replay lands on the batch twin exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // ordered replay contract (the CDC cursor guarantee): split by GLOBAL
    // event_id order so each account's deltas arrive in ledger order
    // across batches; WITHIN a batch arrivals shuffle — the state machine
    // must sort its slice, so a scrambled batch changes nothing
    val ev = eventRows().sortBy(_._1)
    val rnd = new scala.util.Random(13)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.balanceLive(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("bal").outputMode("update")
      .start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    // update mode re-emits a touched account's snapshot per batch: the
    // LAST row per account is its final state
    val emitted = spark.sql("select * from bal").collect()
    val got = emitted.map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap // later duplicates of a key overwrite — memory sink appends in
             // batch order, so the map keeps the final snapshot
    val batch = run("stream_balance").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got == batch,
      s"diff: ${(got.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff got.toSet).take(3)}")
  }

  test("live drawdown: ordered 2-batch replay lands on the batch twin exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = eventRows().sortBy(_._1)
    val rnd = new scala.util.Random(17)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.drawdownLive(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("dd").outputMode("update")
      .start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from dd").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    val batch = run("stream_drawdown").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got == batch,
      s"diff: ${(got.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff got.toSet).take(3)}")
  }

  test("live deltaSum: ordered 2-batch replay lands on the batch twin exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the delta fold is TIME-ordered (the deltaSumTimestamp contract):
    // split by (ts, event_id) so per-user deltas never arrive out of
    // order across batches; within a batch arrivals shuffle (the state
    // machine sorts its slice) — the cross-batch BOUNDARY delta is the
    // part a plain deltaSum state could not reconstruct
    val ev = eventRows().sortBy(e => (e._4.getTime, e._1))
    val rnd = new scala.util.Random(23)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.deltaSumLive(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("dsum").outputMode("update")
      .start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from dsum").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap // last snapshot per user wins
    val batch = run("stream_delta_sum").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got == batch,
      s"diff: ${(got.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff got.toSet).take(3)}")
    // non-vacuous: some user must accumulate a positive delta
    assert(batch.values.exists(_._2 > 0.0), "fixture produced no deltas")
    // and the batch twin's delta_sum column must agree with the
    // standalone delta_sum (#70) oracle row for every user — the merge
    // law IS the op
    val plain = run("delta_sum").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batch.map { case (u, t) => u -> t._2 } == plain)
  }

  test("live funnel: ordered 2-batch replay lands on the batch twin exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the funnel fold is TIME-ordered: split by (ts, event_id) so stage
    // progressions never arrive out of order across batches; within a
    // batch arrivals shuffle (the state machine sorts its slice)
    val ev = eventRows().sortBy(e => (e._4.getTime, e._1))
    val rnd = new scala.util.Random(19)
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[Ev]
    val q = StreamOps.funnelLive(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("fun").outputMode("update")
      .start()
    try {
      in.addData(rnd.shuffle(h1.toSeq)); q.processAllAvailable()
      in.addData(rnd.shuffle(h2.toSeq)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("select * from fun").collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap // last snapshot per user wins
    val batch = run("stream_funnel").collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch,
      s"diff: ${(got.toSet diff batch.toSet).take(5)} / ${(batch.toSet diff got.toSet).take(5)}")
    // non-vacuous, and pinned: the sf0.001 fixture is known to produce
    // exactly levels {2, 3} (14 users convert fully, 1 stalls at click) —
    // a fixture drift or constant-level bug moves this set and fails here
    assert(batch.values.toSet == Set(2L, 3L),
      s"levels present: ${batch.values.toSet}")
  }

  // The sf0.001 fixture only reaches levels {2,3}; this synthetic leg
  // drives all FOUR funnel levels through the live state machine across a
  // 3-batch ordered replay (level progressions split across batches) and
  // pins both the exact per-user read-out and stream ≡ batch equality.
  test("live funnel: synthetic 3-batch replay exercises all four levels") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val b1: Seq[Ev] = Seq((1L, 0L, "view", ts(0), 0.0),
      (2L, 1L, "signup", ts(1), 0.0), (3L, 2L, "signup", ts(2), 0.0))
    val b2: Seq[Ev] = Seq((4L, 2L, "click", ts(3), 0.0),
      (5L, 3L, "signup", ts(4), 0.0))
    val b3: Seq[Ev] = Seq((6L, 3L, "click", ts(5), 0.0),
      (7L, 3L, "purchase", ts(6), 0.0))
    val in = MemoryStream[Ev]
    val q = StreamOps.funnelLive(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("fun4").outputMode("update")
      .start()
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.sql("select * from fun4").collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap // last snapshot per user wins
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $got")
    val single = StreamOps.funnelLive((b1 ++ b2 ++ b3)
        .toDF("event_id", "user_id", "event_type", "ts", "value"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == got)
  }

  test("live bollinger: ordered 3-batch replay lands on the batch twin exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // ordered replay = ts order (the day grain's ledger order); batch
    // splits land mid-day so open cells must carry across batches, and
    // WITHIN a batch arrivals shuffle — the state machine groups + sorts
    // its slice by day, so a scrambled batch changes nothing
    val ev = eventRows()
    val rnd = new scala.util.Random(23)
    val third = ev.length / 3
    val batches = Seq(ev.slice(0, third), ev.slice(third, 2 * third),
      ev.slice(2 * third, ev.length))
    val in = MemoryStream[Ev]
    val q = StreamOps.bollingerLive(
        in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("bb").outputMode("append")
      .start()
    try {
      batches.foreach { b =>
        in.addData(rnd.shuffle(b.toSeq)); q.processAllAvailable()
      }
    } finally q.stop()
    // append mode: each closed day's verdict emits exactly once
    val got = spark.sql("select * from bb").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val emittedCount = spark.sql("select * from bb").count()
    assert(emittedCount == got.size, "a closed day emitted more than once")
    val batch = run("stream_bollinger").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == batch,
      s"diff: ${(got.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff got.toSet).take(3)}")
    // non-vacuity: the sf0.001 fixture has breaches on both sides somewhere
    assert(batch.nonEmpty && batch.values.exists(_._3 != 0L))
  }
}
