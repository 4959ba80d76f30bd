package graft

import graft.sources.Changes
import graft.streaming.{ChangeStreamSink, LiveSinkStats}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

/** The reference's live operational-metrics surface
  * (`sinker/metrics.go:13-15` counters + `sinker/stats.go:38-70` periodic
  * rate log): counters advance from the flush path and a ticker emits
  * progress rows while a sink runs.
  */
class LiveSinkStatsSpec extends SparkSpecBase {

  test("ticker emits progress rows with sliding-window flush rate") {
    LiveSinkStats.reset("mod_live_t")
    val stats = LiveSinkStats.of("mod_live_t")
    val seen = new ConcurrentLinkedQueue[LiveSinkStats.Progress]()
    // unset head block renders like the reference's <Unset> ref (stats.go:80)
    assert(stats.snapshot().toString.contains("last_block=<Unset>"))
    val h = stats.start(eachMillis = 25, windowMillis = 5000, emit = seen.add(_))
    (1 to 5).foreach { i =>
      stats.recordFlush(entries = 10, headBlock = i * 100L, durationNanos = 2000000L)
      Thread.sleep(30)
    }
    Thread.sleep(60)
    h.close()
    val rows = seen.toArray(Array.empty[LiveSinkStats.Progress])
    assert(rows.nonEmpty, "ticker emitted no progress rows")
    val last = rows.last
    assert(last.flushes == 5 && last.flushedEntries == 50 && last.lastBlock == 500)
    assert(last.flushDurationMs == 10) // 5 × 2 ms
    assert(rows.exists(_.flushRatePerSec > 0), "rate never computed > 0")
    // emission stops after close
    val n = seen.size
    Thread.sleep(80)
    assert(seen.size == n, "ticker kept emitting after close")
    // restart-after-shutdown refuses, like the reference's shutter panic
    intercept[IllegalArgumentException](stats.start(25))
    LiveSinkStats.reset("mod_live_t")
  }

  test("a running ChangeStreamSink feeds the live counters; monitor captures rows") {
    LiveSinkStats.reset("mod_live_s")
    val dir = Files.createTempDirectory("livesink").toString
    val sink = new ChangeStreamSink(dir, "mod_live_s", Seq("amount", "kval", "note"))
    val seen = new ConcurrentLinkedQueue[LiveSinkStats.Progress]()
    val h = LiveSinkStats.of("mod_live_s").start(eachMillis = 20, emit = seen.add(_))
    val ch = Changes(spark, sfDir)
    sink.processBatch(ch.filter(col("block") <= 500), 0)
    sink.processBatch(ch.filter(col("block") > 500), 1)
    // let the ticker observe the final counter state
    Thread.sleep(120)
    h.close()
    val snap = LiveSinkStats.of("mod_live_s").snapshot()
    val expectedHead = ch.agg(max("block")).collect()(0).getLong(0)
    assert(snap.flushes == 2)
    assert(snap.lastBlock == expectedHead)
    assert(snap.flushedEntries == ch.count())
    val rows = seen.toArray(Array.empty[LiveSinkStats.Progress])
    assert(rows.nonEmpty && rows.last.flushes == 2,
      "monitor did not capture the sink's progress")
    LiveSinkStats.reset("mod_live_s")
  }
}
