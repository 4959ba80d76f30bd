package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** r12: the opt-in inactivity eviction on the per-key state machines
  * (`spark.graft.stream.inactivityHorizon`). Three contracts:
  *
  *  - a key silent past the horizon has its state DROPPED (the 100 TB
  *    unbounded-key-universe knob the r11 verdict asked for), visible as
  *    a restart (n_tx / level reset) when the key reappears;
  *  - the eviction emission is snapshot-on-evict for the ledger twins —
  *    the final state re-emits, so a downstream Update-mode sink keeps
  *    the correct last value;
  *  - dwell eviction is exactly lossless (horizon floors at the 30-min
  *    dwell cap, so no emittable pair can span an eviction gap).
  *
  * With the conf unset every machine keeps the r11 NoTimeout behavior —
  * the existing replay specs in StreamOpsStreamingSpec pin that.
  */
class StreamEvictionSpec extends SparkSpecBase {

  private type Ev = (Long, Long, String, java.sql.Timestamp, Double)

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  private def withHorizon[A](horizon: String, delay: String = "0")(body: => A): A = {
    spark.conf.set("spark.graft.stream.inactivityHorizon", horizon)
    spark.conf.set("spark.graft.stream.watermarkDelay", delay)
    try body
    finally {
      spark.conf.unset("spark.graft.stream.inactivityHorizon")
      spark.conf.unset("spark.graft.stream.watermarkDelay")
    }
  }

  private def runBatches(name: String, mk: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, batches: Seq[Seq[Ev]],
      mode: String = "update"): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = mk(in.toDF().toDF("event_id", "user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.sql(s"select * from $name").collect()
  }

  test("parseDurationMs: m/h/d units and raw millis") {
    assert(StreamOps.parseDurationMs("45m") == 45L * 60000)
    assert(StreamOps.parseDurationMs("12h") == 12L * 3600000)
    assert(StreamOps.parseDurationMs("30d") == 30L * 86400000)
    assert(StreamOps.parseDurationMs("250") == 250L)
    intercept[IllegalArgumentException](StreamOps.parseDurationMs("3w"))
  }

  test("balance: silent key evicts after horizon; reappearance restarts at zero") {
    val rows = withHorizon("1h") {
      runBatches("bal_evict", StreamOps.balanceLive, Seq(
        // u1 transacts twice
        Seq((1L, 1L, "purchase", ts(0), 10.0), (2L, 1L, "purchase", ts(1), 5.0)),
        // u2 advances event time far past u1's horizon (watermark lags one
        // batch, so the u1 timeout fires in the NEXT batch)
        Seq((3L, 2L, "purchase", ts(300), 1.0)),
        // u2 again: u1 has no data this batch -> its timeout fires
        // (snapshot-on-evict re-emission), state drops
        Seq((4L, 2L, "purchase", ts(301), 1.0)),
        // u1 reappears: fresh state -> n_tx restarts at 1
        Seq((5L, 1L, "purchase", ts(302), 7.0))))
    }
    val u1 = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // snapshot(n=2), evict re-emission(n=2), restarted snapshot(n=1)
    assert(u1.count(_ == ((2L, 15.0))) == 2, s"u1 rows: $u1")
    assert(u1.contains((1L, 7.0)), s"u1 rows: $u1")
    assert(u1.size == 3, s"u1 rows: $u1")
  }

  test("drawdown: eviction drops peak/mdd history; restart is visible") {
    val rows = withHorizon("1h") {
      runBatches("dd_evict", StreamOps.drawdownLive, Seq(
        // u1: +20 then -15 -> peak 20, mdd 15
        Seq((1L, 1L, "purchase", ts(0), 20.0), (2L, 1L, "click", ts(1), 15.0)),
        Seq((3L, 2L, "purchase", ts(300), 1.0)),
        Seq((4L, 2L, "purchase", ts(301), 1.0)),
        // u1 reappears: fresh state, mdd restarts at 0
        Seq((5L, 1L, "purchase", ts(302), 3.0))))
    }
    val u1 = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(u1.count(_ == ((2L, 15.0))) == 2, s"u1 rows: $u1") // snapshot + evict
    assert(u1.contains((1L, 0.0)), s"u1 rows: $u1")           // restart
  }

  test("funnel: evicted user restarts at level 0 (click without signup)") {
    val rows = withHorizon("1h") {
      runBatches("fun_evict", StreamOps.funnelLive, Seq(
        Seq((1L, 1L, "signup", ts(0), 0.0)),   // u1 -> level 1
        Seq((2L, 2L, "view", ts(300), 0.0)),
        Seq((3L, 2L, "view", ts(301), 0.0)),   // u1 timeout fires here
        // u1's click arrives post-eviction: fresh state never saw the
        // signup -> level 0 (the ordered-replay contract made visible)
        Seq((4L, 1L, "click", ts(302), 0.0))))
    }
    val u1 = rows.filter(_.getLong(0) == 1L).map(_.getLong(1)).toSeq
    assert(u1.count(_ == 1L) == 2, s"u1 levels: $u1") // snapshot + evict
    assert(u1.last == 0L || u1.contains(0L), s"u1 levels: $u1")
  }

  test("dwell: eviction is exactly lossless (horizon >= cap)") {
    // gappy feed: pairs inside the 30-min cap emit, the 2h silence in the
    // middle both evicts (with the conf on) and exceeds the cap — so
    // emitted rows must be IDENTICAL with and without eviction
    val batches = Seq(
      Seq((1L, 1L, "view", ts(0), 0.0), (2L, 1L, "click", ts(10), 0.0)),
      Seq((3L, 2L, "view", ts(200), 0.0)),
      Seq((4L, 2L, "view", ts(210), 0.0)),   // u1 evicts here (conf on)
      Seq((5L, 1L, "view", ts(220), 0.0), (6L, 1L, "click", ts(225), 0.0)))
    def rowSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val withEvict = withHorizon("45m") {
      rowSet(runBatches("dw_evict", StreamOps.dwellRows, batches, "append"))
    }
    val without =
      rowSet(runBatches("dw_noevict", StreamOps.dwellRows, batches, "append"))
    assert(withEvict == without, s"evict=$withEvict vs plain=$without")
    assert(withEvict.size == 3, s"rows: $withEvict") // (0->10),(200->210),(220->225)
  }
}
