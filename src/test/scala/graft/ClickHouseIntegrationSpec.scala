package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._

/** Live-ClickHouse integration leg — validates the CH-specific statement
  * shapes (`ALTER TABLE … UPDATE` mutations, MergeTree DDL, native-type
  * cursors table: reference `db/operations.go:77-141`, `db/db.go:233-242`)
  * that the embedded-Derby suites structurally cannot: Derby has no
  * mutation syntax and rejects engine clauses.
  *
  * GATED: every test `assume`s `GRAFT_CH_JDBC_URL` (e.g.
  * `jdbc:clickhouse://localhost:8123/default`, with a ClickHouse JDBC
  * driver jar on the test classpath — DriverManager finds it via SPI).
  * Without the env var the tests cancel (suite stays green); with a live
  * server they run the real round-trip. This container ships no dockerd,
  * no CH binary and has zero egress, so the gate is the honest shape:
  * the leg runs wherever `docker compose up ch_server` (the reference's
  * own `docker-compose.yml`) is possible.
  *
  * ClickHouse has no multi-statement rollback, so the Derby-validated
  * transactional `execFlush` path is NOT exercised here; what is:
  * statement GENERATION ([[SqlDialect]], [[JdbcFlush.statements]]) executed
  * verbatim against the live server, the reference DDL, and the cursor
  * read-back loop.
  */
class ClickHouseIntegrationSpec extends AnyFunSuite {

  private val url = sys.env.get("GRAFT_CH_JDBC_URL")

  private def withConn(f: java.sql.Connection => Unit): Unit = {
    assume(url.isDefined,
      "GRAFT_CH_JDBC_URL unset — live-ClickHouse leg skipped (needs a " +
        "reachable server + JDBC driver; see the reference docker-compose.yml)")
    val conn = java.sql.DriverManager.getConnection(url.get)
    try {
      // synchronous mutations: ALTER UPDATE/DELETE normally apply async;
      // the tests must read their own writes
      val st = conn.createStatement()
      try st.execute("SET mutations_sync = 1") finally st.close()
      f(conn)
    } finally conn.close()
  }

  private def exec(conn: java.sql.Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql.stripSuffix(";")) finally st.close()
  }

  private def queryOne(conn: java.sql.Connection, sql: String): Option[String] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try { if (rs.next()) Option(rs.getString(1)) else None } finally rs.close()
    } finally st.close()
  }

  test("reference cursors DDL creates; cursor row upserts and reads back") {
    withConn { conn =>
      exec(conn, "DROP TABLE IF EXISTS cursors")
      JdbcSetup.setupSqlCh(conn, "")
      exec(conn, SqlDialect.insertSql("cursors", Seq(
        "id" -> "mod_hash_1", "cursor" -> "c0", "block_num" -> "0",
        "block_id" -> "b0")))
      // the flush-time advance is the CH mutation form, not ANSI UPDATE
      exec(conn, SqlDialect.updateSql("cursors",
        Seq("cursor" -> "c1", "block_num" -> "42", "block_id" -> "b42"),
        Seq("id" -> "mod_hash_1")))
      assert(queryOne(conn,
        "SELECT cursor FROM cursors WHERE id = 'mod_hash_1'").contains("c1"))
      assert(queryOne(conn,
        "SELECT block_num FROM cursors WHERE id = 'mod_hash_1'").contains("42"))
    }
  }

  test("collapsed batch replays through SqlDialect CH statements: " +
    "insert, mutation update, mutation delete") {
    withConn { conn =>
      exec(conn, "DROP TABLE IF EXISTS graft_it_kv")
      exec(conn,
        """CREATE TABLE graft_it_kv (
          |  "id" String, "name" String, "qty" Int64,
          |  PRIMARY KEY ("id")) ENGINE = MergeTree() ORDER BY "id"""".stripMargin)
      exec(conn, SqlDialect.insertSql("graft_it_kv",
        Seq("id" -> "k1", "name" -> "it's \\ tricky", "qty" -> "1")))
      exec(conn, SqlDialect.insertSql("graft_it_kv",
        Seq("id" -> "k2", "name" -> "two", "qty" -> "2")))
      // escaping round-trip: the doubled-quote/backslash literal must
      // come back byte-identical
      assert(queryOne(conn,
        "SELECT name FROM graft_it_kv WHERE \"id\" = 'k1'")
        .contains("it's \\ tricky"))
      exec(conn, SqlDialect.updateSql("graft_it_kv",
        Seq("qty" -> "10"), Seq("id" -> "k1")))
      assert(queryOne(conn,
        "SELECT qty FROM graft_it_kv WHERE \"id\" = 'k1'").contains("10"))
      // DELETE FROM is the lightweight delete (GA since CH 23.3)
      exec(conn, SqlDialect.deleteSql("graft_it_kv", Seq("id" -> "k2")))
      assert(queryOne(conn,
        "SELECT count() FROM graft_it_kv WHERE \"id\" = 'k2'").contains("0"))
    }
  }

  // Verdict-r9 #7: exactly-once against CH-NATIVE merge semantics. The sink
  // promises a replayed batch (crash between flush and cursor commit) is
  // harmless; on a ReplacingMergeTree target that promise is kept by CH's
  // own merge-time dedup (max-version row per key), so this leg replays a
  // feed TWICE, forces the merge (OPTIMIZE … FINAL), and asserts the
  // post-merge state equals [[ChangeLoader.collapse]]'s last-writer-wins
  // snapshot of the single feed. Deletes are out of RMT's scope (they ride
  // the lightweight-DELETE path proven above), so the feed is upsert-only.
  test("exactly-once vs ReplacingMergeTree: replayed feed + OPTIMIZE FINAL " +
    "equals the ChangeLoader snapshot") {
    withConn { conn =>
      exec(conn, "DROP TABLE IF EXISTS graft_it_rmt")
      exec(conn,
        """CREATE TABLE graft_it_rmt (
          |  "pk" String, "amount" Float64, "block" Int64)
          |ENGINE = ReplacingMergeTree("block") ORDER BY "pk"""".stripMargin)
      val feed = Seq( // (pk, block, amount): several versions per pk
        ("a", 1L, 10.0), ("b", 1L, 5.0), ("a", 2L, 11.5),
        ("c", 3L, 7.25), ("b", 4L, 6.0), ("a", 5L, 12.0))
      def insertAll(): Unit = feed.foreach { case (pk, b, v) =>
        exec(conn, SqlDialect.insertSql("graft_it_rmt",
          Seq("pk" -> pk, "amount" -> v.toString, "block" -> b.toString)))
      }
      insertAll()
      insertAll() // the replay
      exec(conn, "OPTIMIZE TABLE graft_it_rmt FINAL")
      val st = conn.createStatement()
      val got = try {
        val rs = st.executeQuery(
          "SELECT pk, amount, block FROM graft_it_rmt FINAL ORDER BY pk")
        try {
          val b = Vector.newBuilder[(String, Double, Long)]
          while (rs.next())
            b += ((rs.getString(1), rs.getDouble(2), rs.getLong(3)))
          b.result()
        } finally rs.close()
      } finally st.close()
      val spark = SparkSpecBase.session
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      val changes = feed.toDF("pk", "block", "amount")
        .withColumn("op", lit(Op.Insert))
      val expected = ChangeLoader.collapse(changes, Seq("amount"))
        .filter(!col("deleted"))
        .select("pk", "amount", "last_block").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toVector
      assert(got == expected,
        s"post-OPTIMIZE CH state $got != ChangeLoader snapshot $expected")
    }
  }

  test("JdbcFlush.statements order (deletes, then pk-sorted upserts) " +
    "applies cleanly on a live server") {
    withConn { conn =>
      exec(conn, "DROP TABLE IF EXISTS graft_it_ops")
      exec(conn,
        """CREATE TABLE graft_it_ops ("pk" String, "v" String,
          |  PRIMARY KEY ("pk")) ENGINE = MergeTree() ORDER BY "pk"""".stripMargin)
      exec(conn, SqlDialect.insertSql("graft_it_ops",
        Seq("pk" -> "a", "v" -> "old")))
      val stmts = JdbcFlush.statements("graft_it_ops", "pk", Seq(
        JdbcFlush.PendingRow("a", "REPLACE", Seq("v" -> "new")),
        JdbcFlush.PendingRow("b", Op.Insert, Seq("v" -> "b1"))))
      stmts.foreach(exec(conn, _))
      assert(queryOne(conn,
        "SELECT v FROM graft_it_ops WHERE \"pk\" = 'a'").contains("new"))
      assert(queryOne(conn, "SELECT count() FROM graft_it_ops").contains("2"))
    }
  }
}
