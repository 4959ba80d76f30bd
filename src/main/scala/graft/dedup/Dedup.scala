package graft.dedup

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.3 #29-33 — the deduplication family for a training-data
  * pipeline, each designed to avoid O(n²) at 100 TB:
  *
  *   - exact:   shuffle the 16-byte md5 of the text, never the text.
  *   - n-gram:  pairwise verify ONLY within (lang, source) blocks.
  *   - minhash: LSH band → bucket join; candidate pairs, then verify.
  *   - simhash: per-doc 60-bit signature — a narrow zero-shuffle map.
  *   - embedding: cosine pairs within label blocks (IVF-style blocking).
  *
  * All hashing is md5-based (bit-identical across engines) so every operator
  * has a DuckDB oracle.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, "documents")
  }

  private def embs(s: SparkSession, dir: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, "embeddings")
  }

  /** 60-bit portable hash of a string: first 15 md5 hex chars as a bigint. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Word 3-gram shingle set (distinct). */
  private def shingles(text: Column): Column = {
    val ws = split(text, " ")
    array_distinct(
      transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3))))
  }

  /** DuckDB spelling of [[shingles]] over column `text`. */
  private val shinglesSql: String =
    """list_distinct(list_transform(
      |      generate_series(0, len(string_split(text, ' ')) - 3),
      |      i -> string_split(text, ' ')[i+1] || ' ' ||
      |           string_split(text, ' ')[i+2] || ' ' ||
      |           string_split(text, ' ')[i+3]))""".stripMargin

  // MinHash geometry: 16 permutations in 4 bands of 4 rows.
  private val NumPerms = 16
  private val BandRows = 4
  private val NumBands = NumPerms / BandRows

  val defs: Map[String, OpDef] = Map(
    // ---- #29 exact dedup: keep min doc_id per identical text -------------
    // groupBy is on md5(text): at 100 TB the shuffle moves 16-byte keys +
    // ids, not documents; the join-back is on the same key (co-partitioned).
    "dedup_exact" -> OpDef(
      """WITH h AS (SELECT doc_id, md5(text) AS th FROM documents),
        |k AS (SELECT th, MIN(doc_id) AS keep_id FROM h GROUP BY th)
        |SELECT h.doc_id, k.keep_id FROM h JOIN k USING (th)
        |WHERE h.doc_id <> k.keep_id
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val h = docs(s, dir).select(col("doc_id"), md5(col("text")).as("th"))
      val keep = h.groupBy("th").agg(min("doc_id").as("keep_id"))
      h.join(keep, "th")
        .filter(col("doc_id") =!= col("keep_id"))
        .select("doc_id", "keep_id")
        .orderBy("doc_id")
    },

    // ---- #30 n-gram Jaccard near-dup pairs within (lang, source) blocks --
    // The block key bounds the pairwise blowup (IVF-style); at 100 TB the
    // self-join shuffles shingle arrays once on the block key. τ = 0.5.
    "dedup_ngram_jaccard" -> OpDef(
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, $shinglesSql AS sh
         |  FROM documents),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS n_int,
         |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_uni
         |  FROM t a JOIN t b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(CAST(n_int AS DOUBLE) / n_uni, 4) AS jaccard
         |FROM p WHERE CAST(n_int AS DOUBLE) / n_uni >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      val t = docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
        shingles(col("text")).as("sh"))
      val a = t.select(col("lang"), col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = t.select(col("lang"), col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val nInt = size(array_intersect(col("sh_a"), col("sh_b")))
      val nUni = size(col("sh_a")) + size(col("sh_b")) - nInt
      val jac = nInt.cast(DoubleType) / nUni
      a.join(b, Seq("lang", "source"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), nInt.as("n_int"), nUni.as("n_uni"))
        .filter(col("n_int").cast(DoubleType) / col("n_uni") >= 0.5)
        .select(col("doc_a"), col("doc_b"),
          round(col("n_int").cast(DoubleType) / col("n_uni"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- #31 MinHash + LSH candidate pairs, Jaccard-verified -------------
    // sig_j = min over shingles of md5(j || ':' || shingle); bands of 4 sigs
    // hash to a bucket key; docs sharing ANY band bucket become candidates
    // (bucket join — never an O(n²) cross). Verify exact Jaccard ≥ 0.35.
    "dedup_minhash_lsh" -> OpDef(
      s"""WITH t AS (
         |  SELECT doc_id, $shinglesSql AS sh FROM documents),
         |sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${NumPerms - 1}), j ->
         |      list_min(list_transform(sh, s ->
         |        ('0x' || substr(md5(j::VARCHAR || ':' || s), 1, 15))::BIGINT))) AS mh
         |  FROM t),
         |bands_e AS (
         |  SELECT doc_id, sh, mh, unnest(generate_series(0, ${NumBands - 1})) AS b FROM sig),
         |bands AS (
         |  SELECT doc_id, sh, b,
         |    md5(array_to_string(
         |      list_transform(list_slice(mh, b * $BandRows + 1, b * $BandRows + $BandRows),
         |                     v -> v::VARCHAR), ',')) AS bkey
         |  FROM bands_e),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.sh AS sh_a, b.sh AS sh_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
         |  WHERE a.doc_id < b.doc_id),
         |ver AS (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(sh_a, sh_b)) AS n_int,
         |    len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)) AS n_uni
         |  FROM cand)
         |SELECT doc_a, doc_b, round(CAST(n_int AS DOUBLE) / n_uni, 4) AS jaccard
         |FROM ver WHERE CAST(n_int AS DOUBLE) / n_uni >= 0.35
         |ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      val t = docs(s, dir).select(col("doc_id"), shingles(col("text")).as("sh"))
      val mh = transform(sequence(lit(0), lit(NumPerms - 1)),
        j => array_min(transform(col("sh"),
          sh => conv(substring(md5(concat(j.cast(StringType), lit(":"), sh)), 1, 15), 16, 10)
            .cast(LongType))))
      val sig = t.select(col("doc_id"), col("sh"), mh.as("mh"))
      val bands = sig.select(col("doc_id"), col("sh"),
          explode(sequence(lit(0), lit(NumBands - 1))).as("b"), col("mh"))
        .select(col("doc_id"), col("sh"), col("b"),
          md5(concat_ws(",",
            transform(slice(col("mh"), col("b") * BandRows + 1, lit(BandRows)),
              v => v.cast(StringType)))).as("bkey"))
      val l = bands.select(col("b"), col("bkey"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val r = bands.select(col("b"), col("bkey"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val cand = l.join(r, Seq("b", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
      val nInt = size(array_intersect(col("sh_a"), col("sh_b")))
      val nUni = size(col("sh_a")) + size(col("sh_b")) - nInt
      cand
        .select(col("doc_a"), col("doc_b"), nInt.as("n_int"), nUni.as("n_uni"))
        .filter(col("n_int").cast(DoubleType) / col("n_uni") >= 0.35)
        .select(col("doc_a"), col("doc_b"),
          round(col("n_int").cast(DoubleType) / col("n_uni"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- #32 SimHash 60-bit signature per doc ----------------------------
    // bit i of sig = majority vote of bit i over the doc's distinct token
    // hashes. Pure narrow expression — zero shuffle at any scale.
    "dedup_simhash" -> OpDef(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_transform(list_distinct(string_split(text, ' ')),
        |      w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS th
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 59), i ->
        |    CASE WHEN 2 * len(list_filter(th, h -> (h >> i) & 1 = 1)) > len(th)
        |         THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM t ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val th = transform(array_distinct(split(col("text"), " ")), w => h60(w))
      // The Scala shiftright/shiftleft wrappers only take literal bit counts;
      // the SQL forms accept a column — use an expr for the bit-vote fold.
      val simhash = expr(
        """aggregate(sequence(0, 59), 0L, (acc, i) ->
          |  acc + IF(2 * size(filter(th, h -> (shiftright(h, i) & 1) = 1)) > size(th),
          |           shiftleft(1L, i), 0L))""".stripMargin)
      docs(s, dir)
        .select(col("doc_id"), th.as("th"))
        .select(col("doc_id"), simhash.as("simhash"))
        .orderBy("doc_id")
    },

    // ---- #33 embedding cosine near-dup pairs within label blocks ---------
    // Sequential double dot product (same fold order both engines); block
    // key = label (an IVF coarse cell at scale). τ = 0.35 (the synthetic
    // embeddings are near-random — higher thresholds match nothing).
    "dedup_embedding" -> OpDef(
      """WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_sum(list_transform(generate_series(1, 64), i -> a.e[i] * b.e[i]))
        |      / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
        |         * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, round(cos, 4) AS cosine
        |FROM p WHERE cos >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin
    ) { (s, dir) =>
      val e = transform(col("embedding"), x => x.cast(DoubleType))
      val v = embs(s, dir).select(col("vec_id"), col("label"), e.as("e"))
      val a = v.select(col("label"), col("vec_id").as("vec_a"), col("e").as("e_a"))
      val b = v.select(col("label"), col("vec_id").as("vec_b"), col("e").as("e_b"))
      def norm(c: Column): Column =
        sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x * x))
      val dot = aggregate(zip_with(col("e_a"), col("e_b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val cos = dot / (norm(col("e_a")) * norm(col("e_b")))
      a.join(b, Seq("label"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), cos.as("cos"))
        .filter(col("cos") >= 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
        .orderBy("vec_a", "vec_b")
    }
  )
}
