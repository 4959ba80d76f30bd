package graft

import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSpecBase {

  private lazy val g = Graft(spark, sfDir)

  test("facade exposes every inventory operator and runs one") {
    assert(g.operators.size == SparkEntry.queries.size)
    assert(g.operators.size >= 43)
    assert(g.run("q1_agg").count() == 6)
  }

  test("facade catalog sees all ten tables with pk metadata") {
    assert(g.catalog.tables().size == 10)
    assert(g.catalog.primaryKeys("lineitem") == Seq("l_orderkey", "l_linenumber"))
    assert(g.catalog.columns("events").nonEmpty)
  }

  test("facade CDC loop: changes → collapse → apply matches the query bank") {
    val fields = Seq("amount", "kval", "note")
    val ch = g.changes()
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      ch.select(col("pk"), col("amount"), col("kval"), col("note")).schema)
    val snap = g.applyBatch(empty, g.collapse(ch, fields), fields)
    val viaQuery = g.run("cdc_merge_fields").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
    val viaApi = snap.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(viaApi == viaQuery)
  }

  test("retention offsets bounded; day-0 cohort includes every signup user") {
    val rows = run("retention").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (0L to 7L).contains(r.getLong(1))))
    // every cohort day has a day-0 row (the signup itself is activity)
    val days = rows.map(_.getDate(0)).distinct
    val day0 = rows.filter(_.getLong(1) == 0L).map(_.getDate(0)).distinct
    assert(days.toSet == day0.toSet)
  }

  test("seq_match is at most the 2-step funnel conversion count") {
    val seq = run("seq_match").collect()(0)
    val fun = run("funnel").collect()(0)
    assert(seq.getLong(0) == fun.getLong(0)) // same user universe
    // signup→click→purchase matches ⊆ signup→purchase matches
    assert(seq.getLong(1) <= fun.getLong(2))
  }

  test("facade registers native functions on construction") {
    assert(!g.spark.sql("SELECT cosine_sim(array(1.0F), array(1.0F)) c").isEmpty)
  }

  test("facade r4 surface: jdbc bootstrap + introspected sink + dedup/ann entries") {
    import spark.implicits._
    val url = "jdbc:derby:memory:facadedb;create=true"
    val schema = java.nio.file.Files.createTempFile("facade_schema", ".sql")
    java.nio.file.Files.write(schema,
      """CREATE TABLE "acct" ("id" VARCHAR(32) NOT NULL PRIMARY KEY,
        |"bal" DOUBLE)""".stripMargin.getBytes("UTF-8"))
    g.jdbcSetup(url, schema)
    val tables = g.jdbcLoadTables(url)
    assert(tables.keySet == Set("acct", "cursors"))
    assert(tables("acct").pkCol == "id" && tables("acct").fieldCols == Seq("bal"))
    val sink = g.jdbcSink(url, "acct", "mod_facade")
    assert(sink.processBatch(
      Seq((1L, "a1", "INSERT", Some("2.5"))).toDF("block", "pk", "op", "bal"), 0))
    assert(g.liveStats("mod_facade").snapshot().flushes == 1)
    assert(g.scrapeMetrics()
      .contains("""substreams_sink_clickhouse_store_flush_count{module="mod_facade"} 1"""))
    // dedup + ann entries return live frames over the lake tables
    assert(g.nearDupSimhash().columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    assert(g.annIvf().count() > 0)
    graft.streaming.LiveSinkStats.reset("mod_facade")
  }

  test("curate materializes every stage once and matches pipeline_filter") {
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    val kept = g.curate(out)
    val exp = run("pipeline_filter")
    assert(kept.collect().map(_.toSeq).toSeq == exp.collect().map(_.toSeq).toSeq)
    // every stage artifact is on disk (the audit trail a curation run keeps)
    for (stage <- Seq("quality", "exact_dups", "near_dup_non_canonical",
        "contaminated", "kept")) {
      val p = java.nio.file.Paths.get(out, stage)
      assert(java.nio.file.Files.exists(p), s"stage $stage not materialized")
      assert(spark.read.parquet(p.toString).count() >= 0)
    }
    // the kept frame is served FROM the materialized stage, not recomputed
    val roots = kept.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(roots.nonEmpty && roots.forall(_.contains("curate")),
      s"kept must read back the materialized parquet, scans: $roots")
  }

  test("facade mv sink maintains a live rollup") {
    val dir = java.nio.file.Files.createTempDirectory("facade_mv").toString
    val sink = g.streamSinkWithMv(dir, "mod_facade_mv",
      Seq("amount", "kval", "note"), groupCol = "note", valueCol = "amount")
    sink.processBatch(g.changes().filter(col("block") <= 100), 0)
    val mv = sink.latestMv(spark).get
    assert(mv.columns.toSeq == Seq("grp", "n_rows", "n_vals", "total"))
    assert(mv.count() > 0)
  }
}
