package graft

import graft.cdc.{Cursor, JdbcCatalog, JdbcFlush, JdbcMv, JdbcSetup}
import graft.cdc.JdbcFlush.PendingRow
import graft.cdc.JdbcMv.MvSpec

import java.sql.Connection

/** [[graft.cdc.JdbcMv]] — the on-target rollup must equal a direct
  * recompute after every flush, survive replay untouched, and roll back
  * with a failed flush (ops + rollup + cursor are one transaction).
  */
class JdbcMvSpec extends SparkSpecBase {

  private val spec = MvSpec("acct_mv", "grp", "bal")

  private def withConn[A](name: String)(f: Connection => A): A = {
    val c = JdbcFlush.connect(s"jdbc:derby:memory:$name;create=true")
    try f(c) finally c.close()
  }

  private def setup(conn: Connection): graft.cdc.JdbcTableInfo = {
    val schema = java.nio.file.Files.createTempFile("mv_schema", ".sql")
    java.nio.file.Files.write(schema,
      """CREATE TABLE "acct" ("id" VARCHAR(32) NOT NULL PRIMARY KEY,
        |"grp" VARCHAR(16), "bal" DOUBLE)""".stripMargin.getBytes("UTF-8"))
    JdbcSetup.setup(conn, schema)
    JdbcCatalog.tableInfo(conn, "acct")
  }

  /** Maintained rollup vs direct recompute, both read back from Derby. */
  private def assertMvMatches(conn: Connection): Unit = {
    def rows(sql: String): Set[(Option[String], Long, Long, String)] = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        val out = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(3),
            r.getBigDecimal(4).setScale(2).toPlainString))
          .toSet
        rs.close(); out
      } finally st.close()
    }
    val maintained = rows("""SELECT "grp", "n_rows", "n_vals", "total" FROM "acct_mv"""")
    val direct = rows(
      """SELECT "grp", COUNT(*), COUNT("bal"),
        |  COALESCE(SUM(CAST("bal" AS DECIMAL(31,2))), 0)
        |FROM "acct" GROUP BY "grp"""".stripMargin)
    assert(maintained == direct, s"maintained=$maintained direct=$direct")
  }

  test("rollup equals recompute across insert/update/migrate/delete flushes") {
    withConn("mvdb") { conn =>
      val info = setup(conn)
      assert(JdbcMv.flushTypedWithMv(conn, info, Seq(
        PendingRow("a1", "INSERT", Seq("grp" -> "g1", "bal" -> "1.25")),
        PendingRow("a2", "INSERT", Seq("grp" -> "g1", "bal" -> "2.25")),
        PendingRow("a3", "INSERT", Seq("grp" -> "g2", "bal" -> "3.5"))),
        Cursor("mod", "c1", 10, "b10"), 0, spec))
      assertMvMatches(conn)

      // value update, group migration, delete, a null-group + null-value row
      assert(JdbcMv.flushTypedWithMv(conn, info, Seq(
        PendingRow("a1", "UPDATE", Seq("bal" -> "5.25")),
        PendingRow("a2", "UPDATE", Seq("grp" -> "g2")),
        PendingRow("a3", "DELETE", Seq.empty),
        PendingRow("a4", "INSERT", Seq.empty)),
        Cursor("mod", "c2", 20, "b20"), 1, spec))
      assertMvMatches(conn)

      // replay of batch 1: flush is a no-op, rollup untouched
      assert(!JdbcMv.flushTypedWithMv(conn, info, Seq(
        PendingRow("a9", "INSERT", Seq("grp" -> "g9", "bal" -> "9.0"))),
        Cursor("mod", "c2", 20, "b20"), 1, spec))
      assertMvMatches(conn)

      // a group emptied by deletes disappears from the rollup
      assert(JdbcMv.flushTypedWithMv(conn, info, Seq(
        PendingRow("a1", "DELETE", Seq.empty),
        PendingRow("a2", "DELETE", Seq.empty)),
        Cursor("mod", "c3", 30, "b30"), 2, spec))
      assertMvMatches(conn)
      val st = conn.createStatement()
      val rs = st.executeQuery("""SELECT COUNT(*) FROM "acct_mv" WHERE "grp" = 'g2'""")
      rs.next(); assert(rs.getLong(1) == 0); rs.close(); st.close()
    }
  }

  test("streaming sink path: introspected JdbcChangeSink maintains the rollup") {
    import spark.implicits._
    val url = "jdbc:derby:memory:mvstream;create=true"
    withConn("mvstream") { conn => setup(conn) }
    val sink = graft.streaming.JdbcChangeSink.introspected(
      url, "acct", "mod_stream", mv = Some(spec))
    assert(sink.processBatch(Seq(
      (1L, "s1", "INSERT", Some("g1"), Some(2.5)),
      (2L, "s2", "INSERT", Some("g2"), Some(3.5)),
      (3L, "s1", "UPDATE", None, Some(4.5))).toDF("block", "pk", "op", "grp", "bal"), 0))
    assert(sink.processBatch(Seq(
      (10L, "s2", "DELETE", None: Option[String], None: Option[Double]))
      .toDF("block", "pk", "op", "grp", "bal"), 1))
    withConn("mvstream")(assertMvMatches)
    graft.streaming.LiveSinkStats.reset("mod_stream")
  }

  test("property: random op sequences keep the rollup equal to recompute") {
    val rnd = new scala.util.Random(3)
    withConn("mvprop") { conn =>
      val info = setup(conn)
      val livePks = scala.collection.mutable.Set.empty[String]
      var batchId = 0L
      for (_ <- 1 to 12) {
        // one op per DISTINCT pk per flush (the collapsed-batch precondition)
        val pks = Seq.fill(1 + rnd.nextInt(6))(s"p${rnd.nextInt(8)}").distinct
        val collapsed = pks.map { pk =>
          val grp = if (rnd.nextInt(5) == 0) None else Some(s"g${rnd.nextInt(3)}")
          val bal = if (rnd.nextInt(5) == 0) None else Some(s"${rnd.nextInt(400) / 4.0}")
          val fields = grp.map("grp" -> _).toSeq ++ bal.map("bal" -> _).toSeq
          if (livePks(pk) && rnd.nextInt(4) == 0) {
            livePks -= pk; PendingRow(pk, "DELETE", Seq.empty)
          } else if (livePks(pk)) PendingRow(pk, "UPDATE", fields)
          else { livePks += pk; PendingRow(pk, "INSERT", fields) }
        }
        batchId += 1
        JdbcMv.flushTypedWithMv(conn, info, collapsed,
          Cursor("mod", s"c$batchId", batchId * 10, s"b$batchId"), batchId, spec)
        assertMvMatches(conn)
      }
    }
  }

  test("failed flush rolls back ops, rollup and cursor together") {
    withConn("mvcrash") { conn =>
      val info = setup(conn)
      assert(JdbcMv.flushTypedWithMv(conn, info, Seq(
        PendingRow("a1", "INSERT", Seq("grp" -> "g1", "bal" -> "1.0"))),
        Cursor("mod", "c1", 10, "b10"), 0, spec))
      assertMvMatches(conn)
      // duplicate-pk INSERT violates the primary key mid-transaction
      intercept[java.sql.SQLException] {
        JdbcMv.flushTypedWithMv(conn, info, Seq(
          PendingRow("a2", "INSERT", Seq("grp" -> "g1", "bal" -> "2.0")),
          PendingRow("a1", "INSERT", Seq("grp" -> "g1", "bal" -> "9.0"))),
          Cursor("mod", "c2", 20, "b20"), 1, spec)
      }
      assertMvMatches(conn) // rollup still matches the UNCHANGED table
      assert(JdbcFlush.readCursor(conn, "mod").get._2 == 0) // cursor too
    }
  }
}
