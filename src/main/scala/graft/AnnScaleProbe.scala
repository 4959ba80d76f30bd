package graft

import org.apache.spark.sql.DataFrame

import graft.ann.{Ann, Pq}

/** Build-loop scale probe for the ANN family (tooling, not library
  * surface): at an arbitrary corpus dir it times every OFFLINE index build
  * from scratch (IVF centroids + cells, PQ codebooks + codes, composed
  * IVF-PQ — the only O(corpus) offline jobs in the repo) and measures
  * recall@5 of every approximate online path against the exact brute-force
  * neighbors. Run at 10× (`testdata-local/sf1`) this is the evidence that
  * the BUILD path scales, not just the query path — the r8 verdict's
  * item #6.
  *
  * Usage: `sbt "runMain graft.AnnScaleProbe <sfDir>"` → one JSON line
  * (build seconds + recall per path).
  */
object AnnScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"ann-probe-$tag").toString

    val nVec = graft.sources.Tables(spark, dir, "embeddings").count()
    val (_, tIvf) = timed(Ann.buildIvfIndex(spark, dir, tmp("ivf")))
    val (_, tPq) = timed(Pq.buildIndex(spark, dir, tmp("pq")))
    val (_, tIvfPq) = timed(Pq.buildIvfPq(spark, dir, tmp("ivfpq")))
    val (_, tLsh) = timed(Ann.buildLshIndex(spark, dir, tmp("lsh")))

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SparkEntry.queries("ann_bruteforce")(spark, dir))
    def recall(df: DataFrame): Double =
      math.round(pairs(df).intersect(exact).size.toDouble / exact.size * 1000) / 1000.0

    val paths = Seq(
      "lsh_multiprobe" -> Ann.lshTopK(spark, dir, multiprobe = 4),
      "ivf" -> Ann.ivfTopK(spark, dir),
      "pq" -> Pq.pqTopK(spark, dir),
      "ivfpq" -> Pq.ivfPqTopK(spark, dir))
    val recalls = paths.map { case (n, df) =>
      val (r, t) = timed(recall(df))
      (n, r, t)
    }
    val line =
      s"""{"n_vectors":$nVec,"build_sec":{"ivf":$tIvf,"pq":$tPq,"ivfpq":$tIvfPq,"lsh":$tLsh},""" +
        s""""recall_at_5":{${recalls.map(r => s""""${r._1}":${r._2}""").mkString(",")}},""" +
        s""""query_sec":{${recalls.map(r => s""""${r._1}":${r._3}""").mkString(",")}}}"""
    spark.stop()
    System.out.flush()
    println(line)
    System.out.flush()
  }
}
