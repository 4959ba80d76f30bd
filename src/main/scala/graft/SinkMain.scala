package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CursorStore, MismatchMode}
import graft.streaming.{ChangeStreamSink, FlushPolicy}

/** The reference's operational entrypoint, 1:1 demonstrable (r15 verdict
  * item 7) — mirrors `cmd/substreams-sink-clickhouse/run.go`:
  *
  * {{{
  *   run <target> <source> <module-hash> <module> [<start>:<stop>] [flags]
  * }}}
  *
  * against the reference's `run <clickhouse_dsn> <endpoint> <manifest>
  * <module> [<start>:<stop>]`, with the reference's flags and DEFAULTS
  * verbatim:
  *
  *   - `--flush-interval 1000` (run.go:28 — catch-up flush cadence, wired
  *     into [[graft.streaming.FlushPolicy]] which already reproduces the
  *     historical-modulo / live-edge rule);
  *   - `--on-module-hash-mistmatch error|warn|ignore` (run.go:29 — the
  *     REFERENCE'S OWN SPELLING, accepted alongside the corrected
  *     `--on-module-hash-mismatch`; wired into
  *     [[graft.cdc.CursorStore.readWithMismatch]]);
  *   - `--undo-buffer-size 12` (the substreams-sink common flag the
  *     reference inherits via sink.AddFlagsToSet: the newest N blocks are
  *     still reversible, so only blocks ≤ head − N flush — expressed as a
  *     feed trim, the batch equivalent of the sinker's buffered segment).
  *
  * Positional mapping: `<target>` = the sink base dir (the DSN role),
  * `<source>` = the change-feed data dir (the endpoint role),
  * `<module-hash>` = the literal output-module hash (the manifest's only
  * contribution at run time), `<module>` = the module name (reporting
  * only, as in the reference). Dispatch is WIRING of the existing facade
  * — [[graft.sources.Changes]] → [[graft.streaming.ChangeStreamSink]]
  * with [[graft.streaming.FlushPolicy]] + [[graft.cdc.CursorStore]] —
  * no new semantics (spec: SinkMainSpec).
  */
object SinkMain {

  val usage: String =
    """usage: run <target> <source> <module-hash> <module> [<start>:<stop>]
      |  --flush-interval <n>                 flush every N blocks in catch-up mode (default 1000)
      |  --on-module-hash-mistmatch <mode>    error | warn | ignore (default error)
      |  --undo-buffer-size <n>               hold back the newest N reversible blocks (default 12)""".stripMargin

  /** Parsed run configuration — reference flag defaults verbatim. */
  final case class SinkConfig(
      target: String,
      sourceDir: String,
      moduleHash: String,
      module: String,
      startStop: Option[(Long, Long)] = None,
      flushInterval: Long = 1000L,
      mismatchMode: String = MismatchMode.Error,
      undoBufferSize: Int = 12)

  /** The constructed (not yet executed) pipeline. */
  final case class Wiring(
      source: DataFrame,
      fields: Seq[String],
      policy: FlushPolicy,
      store: CursorStore,
      sink: ChangeStreamSink)

  private val knownFlags = Set("flush-interval", "on-module-hash-mistmatch",
    "on-module-hash-mismatch", "undo-buffer-size")

  /** Strict arg parse: `run` + 4-5 positionals + `--flag value` /
    * `--flag=value`. Unknown flags, bad arity, non-numeric values, and
    * unknown mismatch modes are errors (the reference's cobra surface
    * rejects all four the same way).
    */
  def parse(args: Seq[String]): Either[String, SinkConfig] = {
    if (args.isEmpty || args.head != "run") return Left(usage)
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    val fl = scala.collection.mutable.Map[String, String]()
    val it = args.tail.iterator
    while (it.hasNext) {
      val a = it.next()
      if (a.startsWith("--")) {
        val body = a.drop(2)
        val eq = body.indexOf('=')
        val (k, v) =
          if (eq >= 0) (body.take(eq), body.drop(eq + 1))
          else if (it.hasNext) (body, it.next())
          else return Left(s"flag --$body needs a value")
        if (!knownFlags(k)) return Left(s"unknown flag --$k")
        fl += k -> v
      } else pos += a
    }
    if (pos.length < 4 || pos.length > 5) return Left(usage)
    val startStop: Either[String, Option[(Long, Long)]] =
      if (pos.length < 5) Right(None)
      else pos(4).split(":", -1) match {
        case Array(a, b) =>
          try Right(Some((a.toLong, b.toLong)))
          catch { case _: NumberFormatException => Left(s"bad block range '${pos(4)}'") }
        case _ => Left(s"bad block range '${pos(4)}' (want <start>:<stop>)")
      }
    def num[T](key: String, dflt: T, f: String => T): Either[String, T] =
      fl.get(key) match {
        case None => Right(dflt)
        case Some(v) =>
          try Right(f(v))
          catch { case _: NumberFormatException => Left(s"--$key: not a number: '$v'") }
      }
    val mode = fl.get("on-module-hash-mistmatch")
      .orElse(fl.get("on-module-hash-mismatch"))
      .getOrElse(MismatchMode.Error)
    for {
      ss <- startStop
      fi <- num("flush-interval", 1000L, _.toLong)
      ub <- num("undo-buffer-size", 12, _.toInt)
      m <- if (Set(MismatchMode.Error, MismatchMode.Warn, MismatchMode.Ignore)(mode))
        Right(mode)
      else Left(s"--on-module-hash-mistmatch: must be error|warn|ignore, got '$mode'")
    } yield SinkConfig(pos(0), pos(1), pos(2), pos(3), ss, fi, m, ub)
  }

  /** Build the pipeline from a parsed config — pure facade wiring. The
    * start-cursor resolution runs here under the configured mismatch mode
    * (the reference resolves it at sinker startup: `error` throws before
    * any work, `warn` and `ignore` both adopt the cursor at the highest
    * block and use it as the starting point — run.go's flag doc). r17
    * (ADVICE item 1): the resolved cursor now actually TRIMS the feed
    * (block > cursor.blockNum, before the undo-buffer trim) — previously
    * it was resolved and discarded, so every run reprocessed the full
    * feed regardless of the committed cursor.
    */
  def wire(spark: SparkSession, cfg: SinkConfig): Wiring = {
    val raw = graft.sources.Changes(spark, cfg.sourceDir)
    val ranged = cfg.startStop match {
      // substreams block ranges are start-inclusive, stop-EXCLUSIVE
      case Some((a, b)) => raw.filter(col("block") >= a && col("block") < b)
      case None => raw
    }
    val store0 = new CursorStore(s"${cfg.target}/cursor", spark)
    val resumed = store0.readWithMismatch(cfg.moduleHash, cfg.mismatchMode)
      .map(c => ranged.filter(col("block") > c.blockNum))
      .getOrElse(ranged)
    val head = resumed.agg(max("block")).collect()(0)
    val confirmed =
      if (cfg.undoBufferSize <= 0 || head.isNullAt(0)) resumed
      else resumed.filter(col("block") <= head.getLong(0) - cfg.undoBufferSize)
    // field columns come from the feed schema — the schema-introspection
    // role the reference fills from the live DB (db/operations.go:220-277)
    val fields = confirmed.columns
      .filterNot(Set("pk", "block", "op", "ordinal")).toSeq
    val policy = FlushPolicy(flushInterval = cfg.flushInterval)
    val sink = new ChangeStreamSink(cfg.target, cfg.moduleHash, fields,
      policy = Some(policy))
    Wiring(confirmed, fields, policy, store0, sink)
  }

  /** One catch-up pass: flush the confirmed feed through the policy's
    * units, then report the committed cursor as one JSON line.
    */
  def run(spark: SparkSession, cfg: SinkConfig): Option[graft.cdc.Cursor] = {
    val w = wire(spark, cfg)
    w.sink.processBatch(w.source, 0L)
    w.store.read(cfg.moduleHash)
  }

  def main(args: Array[String]): Unit = parse(args.toIndexedSeq) match {
    case Left(msg) =>
      System.err.println(msg)
      sys.exit(2)
    case Right(cfg) =>
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val cur = run(spark, cfg)
      println(cur match {
        case Some(c) =>
          s"""{"module":"${cfg.module}","moduleHash":"${cfg.moduleHash}",""" +
            s""""cursor":"${c.cursor}","head_block":${c.blockNum}}"""
        case None =>
          s"""{"module":"${cfg.module}","moduleHash":"${cfg.moduleHash}","cursor":null}"""
      })
      spark.stop()
  }
}
