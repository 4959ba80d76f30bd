package graft.ops

import graft.{GraftSession, OpDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.3 — corpus-profile operators over the documents table: the
  * read-outs a curation run consults BEFORE paying for dedup/training
  * passes. Shared discipline: token/shingle streams hash before they
  * shuffle, df rides count windows over collapsed grains (never
  * self-joins), ratios are exact-integer divides -> round(.,4).
  * (Consolidated r9 from the r8 chronology files.)
  */
object CorpusProfile {

  private def tbl(s: SparkSession, dir: String, n: String): DataFrame = {
    GraftSession.tune(s)
    Tables(s, dir, n)
  }

  private val kProp = get_json_object(col("props"), "$.k").cast(LongType)
  private val centsL =
    (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
  private val big = DecimalType(38, 0)
  private val epochDay = datediff(col("ts").cast(DateType),
    to_date(lit("1970-01-01"))).cast(LongType)

  val defs: Map[String, OpDef] = Map(
    // ---- #160 type-token ratio (lexical diversity) -------------------------
    // Per-doc TTR + hapax-legomena ratio — the lexical-diversity quality
    // signal curation pipelines cut on next to doc_repetition. The doc_id
    // filter prunes the fact side BEFORE the explode; tokens collapse to
    // the (doc, tok) grain then fold per doc — two grain collapses on one
    // scan, zero joins. Ratios are single IEEE divides of exact integers
    // → round(·,4).
    "text_ttr" -> OpDef(
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 200),
        |g AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM w GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 4) AS ttr,
        |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS hapax_ratio
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      g.groupBy("doc_id").agg(
        sum("c").cast(LongType).as("n_tok"),
        count(lit(1)).cast(LongType).as("n_types"),
        round(count(lit(1)).cast(DoubleType) / sum("c"), 4).as("ttr"),
        round(sum(when(col("c") === 1, 1).otherwise(0)).cast(DoubleType)
          / count(lit(1)), 4).as("hapax_ratio"))
        .orderBy("doc_id")
    },

    // ---- #161 shingle novelty (inter-doc duplication profile) --------------
    // Per-doc fraction of its distinct word-3-gram shingles that appear in
    // ANY other doc (document frequency ≥ 2) — the corpus-level boilerplate
    // profile that tells a curation run how much near-dup mass dedup will
    // find BEFORE paying for pair generation. Shingles are hashed ONCE
    // (the dedup bank's h32 discipline); df is a count over the
    // hash-partitioned shingle grain — window, not join; the per-doc fold
    // is a second grain collapse. Two exchanges total, both on distinct
    // (doc, h) rows, never on raw text.
    "shingle_novelty" -> OpDef(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(0, len(ws) - 3),
        |    i -> ('0x' || substr(md5(ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |      ws[i+3]), 1, 8))::BIGINT))) AS h
        |  FROM w WHERE len(ws) >= 3),
        |d AS (
        |  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS df FROM g)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS shared_frac
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val e = graft.dedup.Dedup.gramRows(tbl(s, dir, "documents"), 3)
      val d = e.withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      d.groupBy("doc_id").agg(
        count(lit(1)).cast(LongType).as("n_shingles"),
        round(sum(when(col("df") >= 2, 1).otherwise(0)).cast(DoubleType)
          / count(lit(1)), 4).as("shared_frac"))
        .orderBy("doc_id")
    },

    // ---- #173 document length profile --------------------------------------
    // Per (lang, source): doc count, total chars, exact p50/p90 of the
    // n_chars distribution — the corpus shape profile curation dashboards
    // lead with. The length grain collapse and BOTH rank windows ride one
    // hashpartitioning(lang, source) clustering; nearest-rank selection
    // (mad_exact discipline); pure integers.
    "doc_length_stats" -> OpDef(
      """WITH g AS (
        |  SELECT lang, source, n_chars AS len,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT lang, source, len, cnt,
        |    SUM(cnt) OVER (PARTITION BY lang, source ORDER BY len) AS cum,
        |    SUM(cnt) OVER (PARTITION BY lang, source) AS n,
        |    SUM(CAST(len AS HUGEINT) * cnt)
        |      OVER (PARTITION BY lang, source) AS tot
        |  FROM g)
        |SELECT lang, source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  CAST(MAX(tot) AS BIGINT) AS total_chars,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN len END) AS BIGINT)
        |    AS p50_len,
        |  CAST(MIN(CASE WHEN cum >= ceil(0.90 * n) THEN len END) AS BIGINT)
        |    AS p90_len
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val g = tbl(s, dir, "documents")
        .groupBy(col("lang"), col("source"), col("n_chars").as("len"))
        .agg(count(lit(1)).as("cnt"))
      val part = Window.partitionBy("lang", "source")
      val cumW = part.orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = g
        .withColumn("cum", sum("cnt").over(cumW))
        .withColumn("n", sum("cnt").over(part))
        .withColumn("tot",
          sum(col("len").cast(big) * col("cnt")).over(part))
      def sel(q: Double): Column =
        min(when(col("cum") >= ceil(lit(q) * col("n")), col("len")))
          .cast(LongType)
      w.groupBy("lang", "source").agg(
        max("n").cast(LongType).as("n_docs"),
        max("tot").cast(LongType).as("total_chars"),
        sel(0.50).as("p50_len"), sel(0.90).as("p90_len"))
        .orderBy("lang", "source")
    },

    // ---- #188 duplication rate by source -----------------------------------
    // Per (source): docs, exact-distinct texts (16-byte md5 keys — the
    // dedup_exact discipline: digests shuffle, never text bodies), and
    // the duplicate rate — the per-feed quality read-out a curation run
    // uses to decide WHERE dedup budget goes. Two-phase distinct (the
    // canonical scale shape for unbounded per-group domains) + one
    // divide → round(·,4).
    "dup_rate_by_source" -> OpDef(
      """WITH d AS (
        |  SELECT source, md5(text) AS h FROM documents),
        |g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs, n_unique,
        |  round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) AS dup_rate
        |FROM g ORDER BY source""".stripMargin
    ) { (s, dir) =>
      tbl(s, dir, "documents")
        .select(col("source"), md5(col("text")).as("h"))
        .groupBy("source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          countDistinct("h").cast(LongType).as("n_unique"))
        .select(col("source"), col("n_docs"), col("n_unique"),
          round(lit(1.0) - col("n_unique").cast(DoubleType) / col("n_docs"), 4)
            .as("dup_rate"))
        .orderBy("source")
    },

    // ---- #197 tokens-per-doc histogram -------------------------------------
    // Corpus length structure in TOKENS (the unit curation budgets in),
    // bucketed by power of two — the log2_histogram discipline (bit
    // LENGTH, never floor(log2)) applied to the per-doc token count. The
    // token count is size(split) — a scan-riding scalar, no explode; ONE
    // collapse to the ≤20-cell bucket grain; share rides a grain window.
    "tokens_per_doc_hist" -> OpDef(
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
        |g AS (
        |  SELECT CAST(length(printf('%b', n_tok)) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM d WHERE n_tok > 0 GROUP BY 1)
        |SELECT bucket, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 4) AS share
        |FROM g ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val d = tbl(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .filter(col("n_tok") > 0)
      val g = d.groupBy(length(bin(col("n_tok"))).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast(LongType).as("n_tokens"))
      g.select(col("bucket"), col("n_docs").cast(LongType).as("n_docs"),
          col("n_tokens"),
          round(col("n_docs").cast(DoubleType)
            / sum("n_docs").over(Window.partitionBy()), 4).as("share"))
        .orderBy("bucket")
    }
  )
}
