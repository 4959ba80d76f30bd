package graft

import graft.cdc.{ChangeLoader, JdbcFlush, SqlDialect}
import graft.cdc.JdbcFlush.PendingRow
import graft.streaming.JdbcChangeSink
import org.apache.spark.sql.DataFrame

import java.sql.Connection

/** The reference's transactional DB flush (`db/flush.go:12-63`) against an
  * embedded Derby database: ops + cursor atomicity, idempotent replay,
  * rollback on mid-flush failure.
  */
class JdbcSinkSpec extends SparkSpecBase {

  private val fields = Seq("amount", "note")

  private def freshDb(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  private def withConn[A](url: String)(f: Connection => A): A = {
    val c = JdbcFlush.connect(url)
    try f(c) finally c.close()
  }

  private def createTarget(conn: Connection): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(
      """CREATE TABLE "accounts" ("pk" VARCHAR(64) PRIMARY KEY,
        |  "amount" VARCHAR(64), "note" VARCHAR(64))""".stripMargin)
    finally st.close()
  }

  private def readTarget(conn: Connection): Set[(String, Option[String], Option[String])] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery("""SELECT "pk", "amount", "note" FROM "accounts"""")
      val out = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
        .toSet
      rs.close(); out
    } finally st.close()
  }

  private def feed(rows: Seq[(Long, String, String, Option[String], Option[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("block", "pk", "op", "amount", "note")
  }

  test("statement generation: dialect text with escaping, deletes first") {
    val stmts = JdbcFlush.statements("accounts", "pk", Seq(
      PendingRow("2", "UPDATE", Seq("note" -> "it's")),
      PendingRow("1", "INSERT", Seq("amount" -> "1.5", "note" -> "a")),
      PendingRow("3", "DELETE", Seq.empty),
      PendingRow("4", "REPLACE", Seq("amount" -> "9"))))
    assert(stmts == Seq(
      """DELETE FROM "accounts" WHERE "pk"='3';""",
      """DELETE FROM "accounts" WHERE "pk"='4';""",
      """INSERT INTO "accounts" ("pk","amount","note") VALUES ('1','1.5','a');""",
      """UPDATE "accounts" SET "note"='it''s' WHERE "pk"='2';""",
      """INSERT INTO "accounts" ("pk","amount") VALUES ('4','9');"""))
    // ClickHouse spelling kept for the reference target (operations.go:107)
    assert(SqlDialect.updateSql("t", Seq("a" -> "1"), Seq("pk" -> "x"))
      == """ALTER TABLE "t" UPDATE "a"='1' WHERE "pk"='x';""")
  }

  test("multi-batch flush matches collapse+apply; cursor advances in-txn") {
    val url = freshDb("flushdb")
    withConn(url)(createTarget)
    val sink = new JdbcChangeSink(url, "accounts", "pk", "mod_j", fields)
    val b0 = feed(Seq(
      (1L, "u1", "INSERT", Some("1.0"), Some("a")),
      (2L, "u2", "INSERT", Some("2.0"), None),
      (3L, "u1", "UPDATE", Some("1.5"), None)))
    val b1 = feed(Seq(
      (4L, "u2", "UPDATE", None, Some("late")),
      (5L, "u1", "DELETE", None, None),
      (6L, "u3", "INSERT", Some("3.0"), Some("c")),
      (7L, "u3", "DELETE", None, None),
      (8L, "u3", "INSERT", Some("4.0"), None))) // revive within batch
    assert(sink.processBatch(b0, 0))
    assert(sink.processBatch(b1, 1))
    withConn(url) { c =>
      assert(readTarget(c) == Set(
        ("u2", Some("2.0"), Some("late")),
        ("u3", Some("4.0"), None)))
      val (cur, bid) = JdbcFlush.readCursor(c, "mod_j").get
      assert(cur.blockNum == 8 && bid == 1)
    }
  }

  test("replay of a flushed batch is a transactional no-op") {
    val url = freshDb("replaydb")
    withConn(url)(createTarget)
    val sink = new JdbcChangeSink(url, "accounts", "pk", "mod_r", fields)
    val b0 = feed(Seq((1L, "u1", "INSERT", Some("1.0"), Some("a"))))
    val b1 = feed(Seq((2L, "u1", "UPDATE", Some("5.0"), None)))
    assert(sink.processBatch(b0, 0))
    assert(sink.processBatch(b1, 1))
    assert(!sink.processBatch(b1, 1), "replay must be detected in-txn")
    assert(!sink.processBatch(b0, 0), "older batch replay must be detected")
    withConn(url) { c =>
      assert(readTarget(c) == Set(("u1", Some("5.0"), Some("a"))))
      assert(JdbcFlush.readCursor(c, "mod_r").get._2 == 1)
    }
  }

  test("JDBC sink end-to-end on a real stream") {
    implicit val s = spark
    import s.implicits._
    val url = freshDb("streamdb")
    withConn(url)(createTarget)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String, String, Option[String], Option[String])]
    in.addData(Seq(
      (1L, "u1", "INSERT", Some("1.0"), Some("a")),
      (2L, "u2", "INSERT", Some("2.0"), None),
      (3L, "u1", "UPDATE", Some("7.5"), None),
      (4L, "u2", "DELETE", None, None)))
    val sink = new JdbcChangeSink(url, "accounts", "pk", "mod_stream", fields)
    val ckpt = java.nio.file.Files.createTempDirectory("jdbc_ckpt").toString
    val q = sink.start(in.toDF().toDF("block", "pk", "op", "amount", "note"), ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(60000)
    withConn(url) { c =>
      assert(readTarget(c) == Set(("u1", Some("7.5"), Some("a"))))
      assert(JdbcFlush.readCursor(c, "mod_stream").get._1.blockNum == 4)
    }
  }

  test("mid-flush failure rolls back ops AND cursor (atomicity)") {
    val url = freshDb("atomdb")
    withConn(url)(createTarget)
    val sink = new JdbcChangeSink(url, "accounts", "pk", "mod_a", fields)
    assert(sink.processBatch(feed(Seq(
      (1L, "u1", "INSERT", Some("1.0"), None),
      (2L, "u2", "INSERT", Some("2.0"), None))), 0))
    // batch 1: a DELETE that would apply, then an INSERT violating the
    // primary key (duplicate u2 — the reference aborts on dup insert).
    val bad = feed(Seq(
      (3L, "u1", "DELETE", None, None),
      (4L, "u2", "INSERT", Some("9.9"), None)))
    intercept[java.sql.SQLException](sink.processBatch(bad, 1))
    withConn(url) { c =>
      // u1's delete must NOT have applied; cursor still at batch 0
      assert(readTarget(c) == Set(
        ("u1", Some("1.0"), None), ("u2", Some("2.0"), None)))
      val (cur, bid) = JdbcFlush.readCursor(c, "mod_a").get
      assert(cur.blockNum == 2 && bid == 0)
    }
  }
}
