package graft.multimodal

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A media asset: opaque binary payload + typed envelope. */
final case class MediaAsset(doc_id: Long, payload: Array[Byte])

/** Stub-decoded media metadata (the envelope a real codec would fill). */
final case class MediaMeta(
    doc_id: Long,
    fmt: String,
    width: Int,
    height: Int,
    n_frames: Int
)

/** Stub-extracted feature vector (what a real embedding model emits). */
final case class MediaFeatures(doc_id: Long, feat: Seq[Double])

/** SURVEY §2.3 #40-41 — multimodal column plumbing.
  *
  * Image/audio/video content is carried as an opaque `binary` column with a
  * typed metadata envelope; decode / feature-extract run as a typed
  * `mapPartitions` over batches of assets (the exact shape a real
  * JNI/Pandas-UDF codec pass needs: per-partition init, streaming iterator,
  * no driver involvement, narrow → zero shuffle).
  *
  * STUB CODEC: the container has no image/audio libraries, so
  * [[MediaCodec.decode]] derives metadata deterministically from the
  * payload's leading bytes. The payload itself is synthesized as the md5
  * digest of the document text, which is why a DuckDB oracle can reproduce
  * the stub's output from the hex string — the Spark side genuinely reads
  * binary bytes through the full plumbing path.
  */
object MediaCodec {

  val Formats = Vector("jpeg", "png", "webp")

  /** STUB: a real implementation would parse the container header here. */
  def decode(a: MediaAsset): MediaMeta = {
    def b(i: Int): Int = a.payload(i) & 0xFF
    MediaMeta(
      doc_id = a.doc_id,
      fmt = Formats(b(0) % 3),
      width = 64 + (b(1) % 64) * 16,
      height = 64 + (b(2) % 64) * 16,
      n_frames = (b(3) % 16) + 1
    )
  }

  /** STUB: a real implementation would run the vision/audio encoder on the
    * decoded frames. Deterministic 8-dim vector from the payload bytes —
    * the BATCH SHAPE (per-partition model init, streaming iterator, fixed
    * output dim) is what a real encoder pass needs.
    */
  def features(a: MediaAsset): MediaFeatures =
    MediaFeatures(a.doc_id,
      (0 until 8).map(i => (a.payload(i) & 0xFF) / 255.0))

  /** STUB-decoded 60-bit block-mean perceptual hash (blockhash structure:
    * 60 blocks of 4 "pixels", bit = block mean above image mean, compared
    * as exact integers block_sum·60 > total_sum). A real implementation
    * hashes the decoded luma plane; the stub reads the first 240
    * codepoints as the pixel buffer (space-padded), which preserves the
    * property that matters: near-identical sources → near-identical
    * hashes.
    */
  def phash60(text: String): Long = {
    val cps = new Array[Int](240)
    val it = text.codePoints().iterator()
    var i = 0
    while (i < 240) { cps(i) = if (it.hasNext) it.nextInt() else 32; i += 1 }
    var tot = 0L
    i = 0
    while (i < 240) { tot += cps(i); i += 1 }
    var h = 0L
    var b = 0
    while (b < 60) {
      var s = 0L
      var j = 0
      while (j < 4) { s += cps(b * 4 + j); j += 1 }
      if (s * 60 > tot) h |= (1L << b)
      b += 1
    }
    h
  }
}

object MediaColumns {

  private def assets(s: SparkSession, dir: String): DataFrame = {
    GraftSession.tune(s)
    // Synthesize the opaque payload column (md5 bytes of the text). In a
    // real pipeline this is the stored blob; everything downstream treats
    // it as opaque binary.
    Tables(s, dir, "documents")
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
  }

  /** doc → stub-decoded metadata, via the typed mapPartitions codec path. */
  def decodeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).as[MediaAsset]
      .mapPartitions(_.map(MediaCodec.decode))
      .toDF()
  }

  /** doc → stub-extracted feature vectors (8-dim `feat` array), via the
    * typed mapPartitions encoder path — the array-typed public API a
    * downstream consumer (e.g. [[graft.ann.Ann]]) would read.
    */
  def featureDs(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[MediaFeatures] = {
    import s.implicits._
    assets(s, dir).as[MediaAsset]
      .mapPartitions(_.map(MediaCodec.features))
  }

  /** DuckDB byte-k-of-md5 helper: payload byte k as 0-255 int. */
  private def byteSql(k: Int): String =
    s"('0x' || substr(md5(text), ${2 * k + 1}, 2))::INT"

  val defs: Map[String, OpDef] = Map(
    // ---- #40 decode → metadata envelope ----------------------------------
    "mm_decode_meta" -> OpDef(
      s"""SELECT doc_id,
         |  ['jpeg', 'png', 'webp'][${byteSql(0)} % 3 + 1] AS fmt,
         |  CAST(64 + (${byteSql(1)} % 64) * 16 AS INT) AS width,
         |  CAST(64 + (${byteSql(2)} % 64) * 16 AS INT) AS height,
         |  CAST(${byteSql(3)} % 16 + 1 AS INT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      decodeMeta(s, dir)
        .select("doc_id", "fmt", "width", "height", "n_frames")
        .orderBy("doc_id")
    },

    // ---- #41 frame sampling -----------------------------------------------
    // Video assets (fmt = webp) explode into frame rows; every 4th frame is
    // sampled. posexplode keeps it a narrow op — no shuffle, and the frame
    // index plan is exactly what a real frame-extract UDF pass consumes.
    "mm_frame_sample" -> OpDef(
      s"""WITH meta AS (
         |  SELECT doc_id,
         |    ['jpeg', 'png', 'webp'][${byteSql(0)} % 3 + 1] AS fmt,
         |    ${byteSql(3)} % 16 + 1 AS n_frames
         |  FROM documents),
         |fr AS (
         |  SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx
         |  FROM meta WHERE fmt = 'webp')
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |  CAST(frame_idx * 40 AS BIGINT) AS frame_ts_ms,
         |  md5(doc_id::VARCHAR || ':' || frame_idx::VARCHAR) AS frame_key
         |FROM fr WHERE frame_idx % 4 = 0
         |ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, dir) =>
      decodeMeta(s, dir)
        .filter(col("fmt") === "webp")
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
        .filter(col("frame_idx") % 4 === 0)
        .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
          (col("frame_idx") * 40).cast(LongType).as("frame_ts_ms"),
          md5(concat(col("doc_id").cast(StringType), lit(":"),
            col("frame_idx").cast(StringType))).as("frame_key"))
        .orderBy("doc_id", "frame_idx")
    },

    // ---- #76 resize plan (aspect-preserving fit into 224×224) -------------
    // The resize PASS stays stubbed (no codecs here) but the target-geometry
    // computation — what the batch resize UDF consumes — is real and exact:
    // pure INTEGER arithmetic ((dim × 224) div long-side), so both engines
    // agree bit-for-bit with no rounding-mode traps. Narrow, zero shuffle.
    "mm_resize" -> OpDef(
      s"""WITH meta AS (
         |  SELECT doc_id,
         |    ['jpeg', 'png', 'webp'][${byteSql(0)} % 3 + 1] AS fmt,
         |    64 + (${byteSql(1)} % 64) * 16 AS width,
         |    64 + (${byteSql(2)} % 64) * 16 AS height
         |  FROM documents)
         |SELECT doc_id, fmt,
         |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         |  CAST(width * 224 // greatest(width, height) AS INT) AS out_w,
         |  CAST(height * 224 // greatest(width, height) AS INT) AS out_h
         |FROM meta WHERE fmt <> 'webp'
         |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      decodeMeta(s, dir)
        .filter(col("fmt") =!= "webp") // stills only; video goes to #41
        .select(col("doc_id"), col("fmt"), col("width"), col("height"),
          expr("CAST(width * 224 div greatest(width, height) AS INT)").as("out_w"),
          expr("CAST(height * 224 div greatest(width, height) AS INT)").as("out_h"))
        .orderBy("doc_id")
    },

    // ---- #77 feature extraction (stub encoder, real batch shape) ----------
    // Typed mapPartitions: per-partition "model init", streaming iterator,
    // fixed-dim vector out — the exact plumbing a real encoder pass uses;
    // the oracle reproduces the stub from the md5 hex. The 8 dims are
    // projected to scalar columns f0..f7 (byte/255.0 is one IEEE-754 double
    // division — bit-identical in both engines) so the output is
    // comparator-hashable; real consumers take the array via `featureDs`.
    "mm_feature_extract" -> OpDef(
      (s"""SELECT doc_id,
          |""" + (0 until 8).map(i =>
              s"  ('0x' || substr(md5(text), ${2 * i + 1}, 2))::INT / 255.0 AS f$i")
              .mkString(",\n") + """
         |FROM documents ORDER BY doc_id""").stripMargin
    ) { (s, dir) =>
      featureDs(s, dir).toDF()
        .select(col("doc_id") +: (0 until 8).map(i => col("feat")(i).as(s"f$i")): _*)
        .orderBy("doc_id")
    },

    // ---- #253 perceptual-hash near-dup pairs -------------------------------
    // Image dedup's shape end to end: a 60-bit block-mean perceptual hash
    // (Zauner's blockhash structure — 60 blocks, bit = block mean above
    // image mean) computed in the typed mapPartitions CODEC path (where a
    // real implementation decodes pixels; the stub treats the first 240
    // codepoints as the pixel buffer, so near-dup "images" are exactly the
    // near-dup texts and the pair set is non-trivial), then the EXACT
    // #32 banding discipline: 3×20-bit pigeonhole bands (radius-2 recall
    // guaranteed), hot buckets capped, hamming filter after the bucket
    // join. The phash is integer-exact (block_sum·60 > total_sum), so the
    // whole pipeline hash-matches the oracle.
    "mm_phash_pairs" -> OpDef(
      s"""WITH cp AS (
         |  SELECT doc_id, list_transform(generate_series(1, 240), i ->
         |    CASE WHEN i <= length(text)
         |         THEN unicode(substr(text, CAST(i AS INT), 1))
         |         ELSE 32 END) AS cs
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
         |      CASE WHEN (cs[b*4+1] + cs[b*4+2] + cs[b*4+3] + cs[b*4+4]) * 60
         |                > list_sum(cs)
         |           THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS ph
         |  FROM cp),
         |bands AS (
         |  SELECT doc_id, ph, b, (ph >> (b * 20)) & 1048575 AS bkey
         |  FROM h, (SELECT unnest(generate_series(0, 2)) AS b)
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bkey)
         |    <= ${graft.dedup.Dedup.LshBucketCap})
         |SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.ph, c.ph)) AS BIGINT) AS hamming
         |FROM bands a JOIN bands c ON a.b = c.b AND a.bkey = c.bkey
         |WHERE a.doc_id < c.doc_id AND bit_count(xor(a.ph, c.ph)) <= 2
         |ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      GraftSession.tune(s)
      val cap = graft.dedup.Dedup.lshBucketCap(s)
      val sig = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, MediaCodec.phash60(t)) })
        .toDF("doc_id", "ph")
      val bandStructs = (0 until 3).map { b =>
        struct(lit(b).as("b"),
          shiftright(col("ph"), b * 20)
            .bitwiseAND(lit((1L << 20) - 1)).as("bkey"))
      }
      val bands = sig
        .select(col("doc_id"), col("ph"),
          explode(array(bandStructs: _*)).as("bb"))
        .select(col("doc_id"), col("ph"),
          col("bb.b").as("b"), col("bb.bkey").as("bkey"))
      val cold = bands.withColumn("_bs", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("b", "bkey")))
        .filter(col("_bs") <= cap).drop("_bs")
      val l = cold.select(col("b"), col("bkey"),
        col("doc_id").as("doc_a"), col("ph").as("ph_a"))
      val r = cold.select(col("b"), col("bkey"),
        col("doc_id").as("doc_b"), col("ph").as("ph_b"))
      l.join(r, Seq("b", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "ph_a", "ph_b")
        .distinct()
        .withColumn("hamming",
          bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast(LongType))
        .filter(col("hamming") <= 2)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    }
  )
}
