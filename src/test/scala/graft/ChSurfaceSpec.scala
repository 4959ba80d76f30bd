package graft

import org.apache.spark.sql.functions._

/** The r5 ClickHouse-surface additions: sequenceCount, uniqUpTo(N) and
  * quantileExactWeighted — each checked against an independent Scala
  * re-derivation of the reference semantics (not against the oracle SQL,
  * which the driver gate already runs).
  */
class ChSurfaceSpec extends SparkSpecBase {

  test("sequence_count equals the greedy non-overlapping automaton per user") {
    val got = run("sequence_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val events = graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val exp = events.groupBy(_._1).map { case (u, rows) =>
      val seq = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      // greedy state machine: signup → click → purchase, count + reset
      var stage = 0; var n = 0L
      seq.foreach {
        case "signup" if stage == 0 => stage = 1
        case "click" if stage == 1 => stage = 2
        case "purchase" if stage == 2 => n += 1; stage = 0
        case _ => ()
      }
      u -> n
    }
    assert(got == exp)
    assert(got.values.exists(_ > 0), "no user ever completed the sequence — vacuous")
    assert(got.values.toSet.size > 1, "constant match count — degenerate fixture")
  }

  test("leftmost-lazy regex count ≡ greedy automaton on random event strings") {
    // the equivalence sequence_count rests on: java.util.regex find() with
    // s.*?c.*?p counts exactly what the reset-on-match state machine counts
    val rng = new scala.util.Random(7L)
    val pat = java.util.regex.Pattern.compile("s.*?c.*?p")
    (1 to 500).foreach { trial =>
      val str = Seq.fill(rng.nextInt(60))("scpx" (rng.nextInt(4))).mkString
      var stage = 0; var n = 0
      str.foreach {
        case 's' if stage == 0 => stage = 1
        case 'c' if stage == 1 => stage = 2
        case 'p' if stage == 2 => n += 1; stage = 0
        case _ => ()
      }
      val m = pat.matcher(str)
      var re = 0
      while (m.find()) re += 1
      assert(re == n, s"trial=$trial str=$str regex=$re automaton=$n")
    }
  }

  test("uniq_upto: sentinel in the overflow regime, exact below it") {
    val got = run("uniq_upto").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = graft.sources.Tables(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (et, d) =>
      val (capped, wide) = got(et)
      assert(capped == math.min(d, 11L), s"$et: capped=$capped d=$d")
      assert(wide == d, s"$et: wide=$wide d=$d")
    }
    // both regimes must actually occur at this SF
    assert(exact.values.exists(_ > 10), "overflow regime never exercised")
  }

  test("uniq_upto state frees its tracked set at overflow and merge is sticky") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val a = graft.functions.UniqUpToAgg(
      BoundReference(0, StringType, nullable = true), n = 5)
    val st = a.createAggregationBuffer()
    (1 to 5).foreach(i => a.update(st, InternalRow(UTF8String.fromString(s"v$i"))))
    assert(!st.overflowed && a.eval(st) == 5L)
    // serialized small state round-trips
    assert(a.eval(a.deserialize(a.serialize(st))) == 5L)
    a.update(st, InternalRow(UTF8String.fromString("v6")))
    assert(st.overflowed && st.seen.isEmpty, "overflow must drop the tracked set")
    assert(a.eval(st) == 6L) // sentinel n+1
    // duplicates never overflow
    val dup = a.createAggregationBuffer()
    (1 to 100).foreach(_ => a.update(dup, InternalRow(UTF8String.fromString("same"))))
    assert(a.eval(dup) == 1L)
    // merge: small∪small exact; anything ∪ overflowed stays the sentinel
    val b1 = a.createAggregationBuffer(); val b2 = a.createAggregationBuffer()
    Seq("a", "b", "c").foreach(v => a.update(b1, InternalRow(UTF8String.fromString(v))))
    Seq("c", "d").foreach(v => a.update(b2, InternalRow(UTF8String.fromString(v))))
    assert(a.eval(a.merge(b1, b2)) == 4L)
    assert(a.eval(a.merge(b1, st)) == 6L)
    assert(a.eval(a.deserialize(a.serialize(st))) == 6L)
  }

  test("agg_if equals the same aggregates over pre-filtered frames") {
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val got = run("agg_if").collect()
      .map(r => r.getString(0) -> r).toMap
    val types = ev.select("event_type").distinct().collect().map(_.getString(0))
    assert(got.keySet == types.toSet)
    types.foreach { et =>
      val all = ev.filter(col("event_type") === et)
      val big = all.filter(col("value") > 5.0)
      val r = got(et)
      assert(r.getLong(1) == big.count(), s"$et n_big")
      assert(r.getLong(5) == big.select("user_id").distinct().count(), s"$et uniq_big")
      // maxIf over even users only
      val even = all.filter(col("user_id") % 2 === 0)
      val expMax = even.agg(max("value")).collect()(0)
      assert((r.isNullAt(4) && expMax.isNullAt(0)) ||
        r.getDouble(4) == expMax.getDouble(0), s"$et max_even_user")
      // avgIf: NULL exactly for the error group (predicate empties it)
      assert(r.isNullAt(3) == (et == "error"), s"$et avg_ok nullness")
    }
  }

  test("quantiles_exact_weighted matches the cumulative-weight definition") {
    val got = run("quantiles_exact_weighted").collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))
    val exp = li.groupBy(_._1).map { case (rf, rows) =>
      val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      def q(num: Long, den: Long): Double = {
        var cum = 0L
        byV.find { case (_, w) => cum += w; cum * den >= num * tot }.get._1
      }
      rf -> Seq(q(1, 4), q(1, 2), q(3, 4), q(9, 10))
    }
    assert(got == exp)
    got.values.foreach(qs => assert(qs == qs.sorted, "quantiles must be monotone"))
  }

  test("topk_reagg: merged day-grain state cells equal one-pass topK exactly") {
    val onePass = run("topk_approx").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val reagg = run("topk_reagg").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(reagg == onePass,
      "state-cell re-aggregation diverged from the one-pass aggregate")
  }

  test("weighted state cells re-aggregate to the one-pass weighted topK") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType}
    graft.functions.GraftFunctions.register(spark)
    val onePass = run("topk_weighted").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val cells = graft.sources.Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(call_function("topk_state_weighted",
        col("user_id").cast(StringType), floor(col("value")).cast(LongType),
        lit(16384)).as("st"))
    val reagg = cells.groupBy("event_type")
      .agg(concat_ws(",", call_function("topk_merge",
        col("st"), lit(5), lit(16384))).as("top_users"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(reagg == onePass)
  }

  test("topk state cells survive serialization and union under eviction pressure") {
    import graft.functions.TopKAgg
    // tiny capacity forces evictions; the union of restored cells must keep
    // the space-saving overestimate-only guarantee for a clear heavy hitter
    val mkState = (vals: Seq[String], cap: Int) => {
      val st = new TopKAgg.State()
      vals.foreach(v => st.offer(
        org.apache.spark.unsafe.types.UTF8String.fromString(v), 1L, 0L, cap))
      st
    }
    val a = mkState(Seq.fill(50)("hot") ++ (1 to 6).map("a" + _), 4)
    val b = mkState(Seq.fill(30)("hot") ++ (1 to 6).map("b" + _), 4)
    val merged = TopKAgg.union(
      TopKAgg.read(TopKAgg.write(a)), TopKAgg.read(TopKAgg.write(b)), 4)
    val top = TopKAgg.evalTopK(merged, 1)
    assert(top.numElements() == 1 && top.getUTF8String(0).toString == "hot",
      "a 80-count heavy hitter must survive merge of evicting cells")
    val hotCount = merged.items.get(
      org.apache.spark.unsafe.types.UTF8String.fromString("hot"))(0)
    assert(hotCount >= 80, s"count $hotCount underestimates true 80")
  }

  test("uniq_reagg: merged day-grain cells equal one-pass uniq_upto in both regimes") {
    val onePass = run("uniq_upto").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val reagg = run("uniq_reagg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(reagg == onePass)
    // the capped regime must actually be overflowed, or the sticky-overflow
    // path of the merge went unexercised
    assert(reagg.forall(_._2 == 11L), "capped regime not overflowed — vacuous")
  }

  test("uniq_upto state cells: union exactness and sticky overflow survive the wire") {
    import graft.functions.UniqUpToAgg
    import org.apache.spark.unsafe.types.UTF8String
    val mk = (vals: Seq[String]) => {
      val st = new UniqUpToAgg.State()
      vals.foreach { v =>
        val u = UTF8String.fromString(v)
        if (!st.overflowed && !st.seen.contains(u)) {
          st.seen.add(u.clone()); if (st.seen.size() > 5) st.overflow()
        }
      }
      st
    }
    // exact union below the cap, dedup across cells
    val a = UniqUpToAgg.read(UniqUpToAgg.write(mk(Seq("x", "y", "z"))))
    val b = UniqUpToAgg.read(UniqUpToAgg.write(mk(Seq("y", "z", "w"))))
    assert(UniqUpToAgg.union(a, b, 5).seen.size() == 4)
    // union crossing the cap overflows
    val c = UniqUpToAgg.read(UniqUpToAgg.write(mk(Seq("1", "2", "3"))))
    val c2 = UniqUpToAgg.read(UniqUpToAgg.write(mk(Seq("4", "5", "6"))))
    assert(UniqUpToAgg.union(c, c2, 5).overflowed, "6 distinct past n=5 must overflow")
    // an overflowed cell survives the wire and stays sticky in any union
    val d = UniqUpToAgg.read(UniqUpToAgg.write(mk((1 to 6).map(_.toString))))
    assert(d.overflowed, "6 distinct past n=5 must overflow at build")
    val u = UniqUpToAgg.union(UniqUpToAgg.read(UniqUpToAgg.write(mk(Seq("x")))), d, 5)
    assert(u.overflowed && u.seen.isEmpty, "overflow must be sticky and free the set")
  }

  test("group_array_moving_sum equals per-user prefix sums") {
    val got = run("group_array_moving_sum").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = ev.groupBy(_._1).map { case (u, rows) =>
      val sums = rows.sortBy(_._2).map(r => math.floor(r._3).toLong)
        .scanLeft(0L)(_ + _).drop(1)
      u -> sums.mkString(",")
    }
    assert(got == exp)
  }

  test("any_heavy is the modal user with (count desc, string asc) ties") {
    val got = run("any_heavy").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1).toString))
    val exp = ev.groupBy(_._1).map { case (t, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size).toSeq
      t -> counts.minBy { case (u, c) => (-c, u) }._1
    }
    assert(got == exp)
  }
}
