package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (band, bucket) occurrence of a document's simhash signature. */
final case class SimhashBand(b: Int, bkey: Long, doc_id: Long, sig: Long)

/** A banded candidate match: `doc_id` collided with the earlier indexed
  * `eid` in some band, within the hamming radius.
  */
final case class SimhashHit(doc_id: Long, eid: Long, ham: Long)

/** SURVEY §2.4 #260 — streaming near-dup screen (`stream_simhash_dedup`):
  * the one LLM-pipeline family that had no streaming twin. Documents arrive
  * in order; each doc's 60-bit simhash splits into 3×20-bit pigeonhole
  * bands (radius-2 recall guaranteed — the #32b discipline), and every band
  * routes to a `flatMapGroupsWithState` keyed by (band, bucket) whose state
  * is the FIRST `cap` (doc_id, sig) pairs that landed there. An arriving
  * doc emits a hit per indexed earlier neighbor within hamming ≤ 2, then a
  * per-doc collapse keeps the earliest match.
  *
  * First-cap is the streaming-realizable form of the batch hot-bucket
  * guard: the batch QUALIFY (drop buckets that END UP oversized) is
  * retroactive — a stream cannot un-emit matches made while the bucket was
  * still cold — so this op's SEMANTICS (batch and stream, identically) is
  * "index the first `cap` arrivals per bucket, probe everything". A
  * boilerplate bucket saturates its index and stops absorbing state, which
  * is also the production behavior you want: byte-identical floods belong
  * to exact dedup upstream.
  *
  * Scale: state is O(buckets × cap × 16 bytes), bounded regardless of
  * corpus size; the shuffle is the same band-bucket key the batch pair
  * join uses. In production the state additionally evicts buckets idle
  * past the watermark (EventTimeTimeout — the `horizon`); the batch twin
  * has no event time, so the spec pins the NoTimeout shape.
  *
  * Reference frame: the sink has no streaming dedup (the reference errors
  * on duplicate replays; `sinker/sinker.go:96-190` relies on cursor
  * idempotence) — this is the LLM-pipeline extension operating on content,
  * not keys.
  */
object StreamDedup {

  /** Banded hit generation — the SAME typed stateful operator runs in batch
    * (state fresh per key, whole group in one call) and on a stream
    * (state persists across micro-batches), which is what lets the DuckDB
    * oracle check the literal streaming code path.
    *
    * Input must carry `doc_id` (long) and `sig` (long, 60-bit simhash);
    * callers produce `sig` with the native `simhash64` expression so the
    * hot path stays codegen. Within a micro-batch, each bucket's rows are
    * processed in doc_id order (arrival order at the fixture and at any
    * ordered replay; cross-batch order is the stream's own arrival order).
    */
  def simhashBandHits(signed: DataFrame, cap: Int,
      numBands: Int = 3, bandBits: Int = 20,
      maxHamming: Int = 2): Dataset[SimhashHit] = {
    val s = signed.sparkSession
    import s.implicits._
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("b"),
        shiftright(col("sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
    }
    val bands = signed
      .select(col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.b").as("b"), col("bb.bkey").as("bkey"),
        col("doc_id"), col("sig"))
      .as[SimhashBand]
    bands
      .groupByKey(r => (r.b, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(cap, maxHamming))
  }

  private def process(cap: Int, maxHamming: Int)(
      key: (Int, Long), rows: Iterator[SimhashBand],
      state: GroupState[Vector[(Long, Long)]]
  ): Iterator[SimhashHit] = {
    var idx = state.getOption.getOrElse(Vector.empty)
    val out = Vector.newBuilder[SimhashHit]
    // doc_id order within the group = arrival order (the shuffle does not
    // preserve it); buckets are bucket-sized, not corpus-sized, so the
    // per-group sort is bounded by the bucket's own occupancy
    for (r <- rows.toArray.sortBy(_.doc_id)) {
      for ((eid, esig) <- idx if eid < r.doc_id) {
        val ham = java.lang.Long.bitCount(r.sig ^ esig).toLong
        if (ham <= maxHamming) out += SimhashHit(r.doc_id, eid, ham)
      }
      if (idx.size < cap) idx = idx :+ (r.doc_id -> r.sig)
    }
    state.update(idx)
    out.result().iterator
  }

  /** Per-doc collapse: earliest matching neighbor (min eid, its hamming);
    * unique docs emit (-1, -1). Batch form — on a live stream this is the
    * update-mode aggregation downstream of [[simhashBandHits]].
    */
  def collapseHits(signed: DataFrame, hits: Dataset[SimhashHit]): DataFrame = {
    val m = hits.toDF()
      .groupBy("doc_id")
      .agg(min(struct(col("eid"), col("ham"))).as("m"))
      .select(col("doc_id"), col("m.eid").as("dup_of"), col("m.ham").as("hamming"))
    signed.select("doc_id").join(m, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        coalesce(col("hamming"), lit(-1L)).as("hamming"))
  }
}
