package graft

import graft.ann.{Ann, Pq}

class AnnSpec extends SparkSpecBase {

  private lazy val bf = run("ann_bruteforce").collect()

  test("pq recall@5: ADC + re-rank ≥ 0.6; deeper re-rank never loses recall") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    def recallAt(depth: Int) = {
      val approx = pairs(Pq.pqTopK(spark, sfDir, rerankDepth = depth).collect())
      approx.intersect(exact).size.toDouble / exact.size
    }
    val shallow = recallAt(20)
    val deep = recallAt(Pq.RerankDepth)
    assert(deep >= 0.6, s"pq recall@5 $deep at depth ${Pq.RerankDepth}")
    assert(deep >= shallow, s"deeper re-rank lost recall ($deep vs $shallow)")
  }

  test("ivfpq: composed recall reasonable; full probing recovers plain PQ") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    // composed recall ≤ each stage's own recall, but must stay useful
    val composed = pairs(Pq.ivfPqTopK(spark, sfDir).collect())
    val rComposed = composed.intersect(exact).size.toDouble / exact.size
    assert(rComposed >= 0.4, s"ivfpq recall@5 $rComposed")
    // probing EVERY cell removes the IVF pruning → exactly the PQ result
    val allCells = pairs(Pq.ivfPqTopK(spark, sfDir, nprobe = Ann.Cells).collect())
    val pqOnly = pairs(Pq.pqTopK(spark, sfDir).collect())
    assert(allCells == pqOnly,
      "nprobe=cells must degenerate IVF-PQ to plain PQ")
  }

  test("pq index: codes in range, one row per vector, rebuild is deterministic") {
    val idx = Pq.ensureIndex(spark, sfDir)
    val codes = spark.read.parquet(s"${idx.indexDir}/codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val n = graft.sources.Tables(spark, sfDir, "embeddings").count()
    assert(codes.size.toLong == n)
    assert(codes.values.forall(cs =>
      cs.length == Pq.M && cs.forall(c => c >= 0 && c < Pq.Ksub)))
    // codes must actually discriminate (not all vectors on one codeword)
    assert(codes.values.map(_.mkString(",")).toSet.size > n / 2)
    // a from-scratch rebuild reproduces the artifacts bit-for-bit
    val dir2 = java.nio.file.Files.createTempDirectory("pq-rebuild").toString
    val idx2 = Pq.buildIndex(spark, sfDir, dir2)
    assert(idx2.codebooks.flatten.flatten.toSeq == idx.codebooks.flatten.flatten.toSeq)
    val codes2 = spark.read.parquet(s"$dir2/codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes2 == codes)
  }

  test("bruteforce returns exactly k neighbors per probe") {
    val byProbe = bf.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byProbe.size == Ann.NumProbes)
    assert(byProbe.values.forall(_ == Ann.K))
  }

  test("bruteforce neighbors are ranked by cosine desc and never the probe itself") {
    bf.groupBy(_.getLong(0)).foreach { case (pid, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(w => w(0) >= w(1)))
      assert(!rows.exists(_.getLong(1) == pid))
    }
  }

  test("lsh recall@5: multiprobe ≥ 0.8 and strictly lifts single-probe ≥ 0.5") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    def recallAt(multiprobe: Int) = {
      val approx = pairs(Ann.lshTopK(spark, sfDir, multiprobe = multiprobe).collect())
      approx.intersect(exact).size.toDouble / exact.size
    }
    val single = recallAt(0)
    val multi = recallAt(1)
    assert(single >= 0.5, s"single-probe recall $single")
    assert(multi >= 0.8, s"multiprobe recall $multi")
    assert(multi >= single, s"multiprobe $multi must not lose to single $single")
  }

  test("int8 ANN: recall@5 ≥ baseline, pool depth monotone, exhaustive = brute force") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    def recallAt(pool: Int) = {
      val approx = pairs(Ann.int8TopK(spark, sfDir, rerankPool = pool).collect())
      approx.intersect(exact).size.toDouble / exact.size
    }
    // the default pool (4k): int8 quantization perturbs cosine by ≲0.5% on
    // this corpus, so a 4x pool catches essentially every true neighbor —
    // ≥ the float-baseline-within-tolerance bar (r15 verdict item 4)
    val dflt = recallAt(4 * Ann.K)
    assert(dflt >= 0.9, s"int8 recall@5 $dflt at default pool")
    val deep = recallAt(12 * Ann.K)
    assert(deep >= dflt, s"deeper pool lost recall ($deep vs $dflt)")
    // exhaustive pool degenerates the pipeline to brute force EXACTLY —
    // same rows, same order, same doubles (the ann_int8_exact oracle pin)
    val exhaustive = run("ann_int8_exact").collect()
    assert(exhaustive.toSeq == bf.toSeq,
      "exhaustive int8 pool must reproduce ann_bruteforce bit-for-bit")
  }

  test("ivf recall@5: nprobe cells beat a single cell; ≥ 0.5 at nprobe=4/8") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    def recallAt(nprobe: Int) = {
      val approx = pairs(Ann.ivfTopK(spark, sfDir, nprobe = nprobe).collect())
      approx.intersect(exact).size.toDouble / exact.size
    }
    val one = recallAt(1)
    val four = recallAt(4)
    assert(four >= 0.5, s"ivf nprobe=4 recall $four")
    assert(four >= one, s"more probed cells must not lose recall ($four vs $one)")
    // vectors store ONE cell row each (vs L bucket rows in LSH)
    assert(Ann.ivfTopK(spark, sfDir).collect().nonEmpty)
  }

  test("exact-regime rows (exhaustive probing) equal brute force row-for-row") {
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val exact = key(bf)
    assert(key(run("ann_lsh_exact").collect()) == exact, "ann_lsh_exact != bruteforce")
    assert(key(run("ann_ivf_exact").collect()) == exact, "ann_ivf_exact != bruteforce")
  }

  test("ivf online query path: zero training jobs, reads the prebuilt index") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
      Ann.buildIvfIndex(spark, sfDir, idxDir)
      Thread.sleep(1000) // listener bus delivery is async
      val buildJobs = jobs.get()
      val idx = Ann.loadIvfIndex(spark, idxDir)
      assert(idx.centroids.length == Ann.Cells && idx.centroids.head.length == Ann.Dim)

      jobs.set(0)
      val df = Ann.ivfQuery(spark, sfDir, idx)
      Thread.sleep(1000)
      // The query path's only eager work is the probe collect + parquet
      // footer reads (≤ 5 metadata-scale jobs). Lloyd training — the seed
      // collect, an assignment agg per iteration, the index writes — ran
      // `buildJobs` jobs; the online path must be nowhere near it.
      val queryJobs = jobs.get()
      assert(queryJobs <= 5, s"query-path construction ran $queryJobs jobs")
      // r15: the primitive assignCells kernel collapsed the build itself to
      // a handful of jobs (the old crossJoin+max_by ran 2 jobs per pass),
      // so the relative pin is strict-less, not half — the absolute ≤5
      // metadata-job bound above is the real zero-training contract
      assert(queryJobs < buildJobs,
        s"query path ($queryJobs jobs) is not cheaper than the build ($buildJobs)")
      // the candidate side reads the persisted (vec_id, cell) index parquet
      val paths = df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
      assert(paths.exists(_.contains(idxDir)), s"no index scan in $paths")
      // recall of the prebuilt-index query path matches the inline path
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.intersect(exact).size.toDouble / exact.size >= 0.5)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("lsh online query path: prebuilt bucket index, no corpus re-hash") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-lsh-spec").toString
    Ann.buildLshIndex(spark, sfDir, idxDir)
    val df = Ann.lshQuery(spark, sfDir, idxDir, multiprobe = 1)
    // the candidate side reads the persisted bucket parquet, not the corpus
    val paths = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(paths.exists(_.contains(idxDir)), s"no index scan in $paths")
    // identical results to the recompute path (same deterministic buckets)
    val fromIndex = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val recompute = Ann.lshTopK(spark, sfDir, multiprobe = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(fromIndex == recompute)
  }

  test("deterministic hyperplanes are reproducible and bounded") {
    val a = Ann.hyperplanes
    assert(a.length == Ann.Tables_ && a(0).length == Ann.Bits && a(0)(0).length == Ann.Dim)
    assert(a.flatten.flatten.forall(w => w >= -1.0 && w <= 1.0))
  }
}
