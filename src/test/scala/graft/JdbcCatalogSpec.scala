package graft

import graft.cdc.{CursorTableException, JdbcCatalog, JdbcFlush, JdbcSetup, SqlDialect}
import graft.streaming.JdbcChangeSink
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Connection

/** The reference's first-run surface against embedded Derby:
  * `Setup` (schema file + cursors table, `db/db.go:212-249`), `LoadTables`
  * introspection (`db/db.go:82-138`), `validateCursorTables` error cases
  * (`db/db.go:140-178`), and the type-aware statement rendering
  * (`db/operations.go:118-193`).
  */
class JdbcCatalogSpec extends AnyFunSuite {

  private def freshDb(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  private def withConn[A](url: String)(f: Connection => A): A = {
    val c = JdbcFlush.connect(url)
    try f(c) finally c.close()
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  private val schemaSql =
    """-- user schema file (two tables, mixed types)
      |CREATE TABLE "wallet" (
      |  "id"      VARCHAR(64) NOT NULL PRIMARY KEY,
      |  "balance" DOUBLE,
      |  "height"  BIGINT,
      |  "memo"    VARCHAR(256));
      |/* second table; the ';' in the comment below must not split: x;y */
      |CREATE TABLE "transfer" (
      |  "id"     VARCHAR(64) NOT NULL PRIMARY KEY,
      |  "note"   VARCHAR(64) DEFAULT 'a;''b');
      |""".stripMargin

  test("splitStatements: terminators in strings/idents/comments do not split") {
    val stmts = JdbcSetup.splitStatements(schemaSql)
    assert(stmts.size == 2)
    assert(stmts.head.startsWith("CREATE TABLE \"wallet\""))
    assert(stmts(1).contains("'a;''b'"))
    assert(JdbcSetup.splitStatements("a; b ;; c;") == Seq("a", "b", "c"))
    assert(JdbcSetup.splitStatements("x /* ; */ y; -- tail ;\nz")
      == Seq("x  y", "z"))
  }

  test("Setup: executes schema file, creates reference-shape cursors table") {
    val url = freshDb("setupdb")
    val schemaFile = java.nio.file.Files.createTempFile("schema", ".sql")
    java.nio.file.Files.write(schemaFile, schemaSql.getBytes("UTF-8"))
    withConn(url) { c =>
      JdbcSetup.setup(c, schemaFile)
      val tables = JdbcCatalog.loadTables(c) // validates cursors internally
      assert(tables.keySet == Set("wallet", "transfer", "cursors"))
      assert(tables("wallet").pkCol == "id")
      assert(tables("wallet").columnNames == Seq("id", "balance", "height", "memo"))
      assert(tables("wallet").column("height").get.kind == "int64")
      assert(tables("wallet").column("balance").get.kind == "float64")
      // re-running cursor setup is a no-op (CREATE IF NOT EXISTS parity)
      JdbcSetup.setupCursorTable(c)
      assert(JdbcCatalog.tableInfo(c, "cursors").columns.size == 4)
    }
  }

  test("loadTables without a cursors table fails with the reference's CursorError") {
    val url = freshDb("nocursors")
    withConn(url) { c =>
      exec(c, """CREATE TABLE "t" ("id" VARCHAR(8) NOT NULL PRIMARY KEY)""")
      val e = intercept[CursorTableException](JdbcCatalog.loadTables(c))
      assert(e.getMessage.contains("\"cursors\" table is not found"))
    }
  }

  test("validateCursorTables error cases match the reference") {
    def validateIn(dbName: String, ddl: String): CursorTableException =
      withConn(freshDb(dbName)) { c =>
        exec(c, ddl)
        intercept[CursorTableException](
          JdbcCatalog.validateCursorTable(JdbcCatalog.tableInfo(c, "cursors")))
      }
    // 3 columns — db/db.go:141-143
    assert(validateIn("cur3col",
      """CREATE TABLE "cursors" ("id" VARCHAR(8) NOT NULL PRIMARY KEY,
        |"cursor" VARCHAR(8), "block_num" BIGINT)""".stripMargin)
      .getMessage.contains("requires 4 columns"))
    // unexpected column name — db/db.go:152-154
    assert(validateIn("curbadname",
      """CREATE TABLE "cursors" ("id" VARCHAR(8) NOT NULL PRIMARY KEY,
        |"cursor" VARCHAR(8), "block_num" BIGINT, "oops" VARCHAR(8))""".stripMargin)
      .getMessage.contains("unexpected column \"oops\""))
    // wrong type for block_num — db/db.go:155-159
    assert(validateIn("curbadtype",
      """CREATE TABLE "cursors" ("id" VARCHAR(8) NOT NULL PRIMARY KEY,
        |"cursor" VARCHAR(8), "block_num" VARCHAR(8), "block_id" VARCHAR(8))""".stripMargin)
      .getMessage.contains("column \"block_num\" has invalid type"))
    // no primary key — db/db.go:171-173
    assert(validateIn("curnopk",
      """CREATE TABLE "cursors" ("id" VARCHAR(8),
        |"cursor" VARCHAR(8), "block_num" BIGINT, "block_id" VARCHAR(8))""".stripMargin)
      .getMessage.contains("primary key not found"))
    // pk on the wrong column — db/db.go:174-176
    assert(validateIn("curwrongpk",
      """CREATE TABLE "cursors" ("id" VARCHAR(8),
        |"cursor" VARCHAR(8) NOT NULL PRIMARY KEY, "block_num" BIGINT,
        |"block_id" VARCHAR(8))""".stripMargin)
      .getMessage.contains("column 'id' should be primary key"))
  }

  test("normalizeValue renders literals by introspected kind") {
    assert(SqlDialect.normalizeValue("it's", "string") == "'it''s'")
    assert(SqlDialect.normalizeValue("true", "bool") == "'true'")
    assert(SqlDialect.normalizeValue("42", "int64") == "42")
    assert(SqlDialect.normalizeValue("-1.5e3", "float64") == "-1.5e3")
    // epoch seconds → timestamp literal (operations.go:167-180)
    assert(SqlDialect.normalizeValue("0", "time") == "'1970-01-01 00:00:00'")
    assert(SqlDialect.normalizeValue("2021-01-01 00:00:00", "time")
      == "'2021-01-01 00:00:00'")
    intercept[IllegalArgumentException](
      SqlDialect.normalizeValue("1 OR 1=1", "int64"))
    intercept[IllegalArgumentException](
      SqlDialect.normalizeValue("abc", "float64"))
  }

  test("typedStatements: unknown column fails like prepareColValues") {
    val url = freshDb("typederr")
    withConn(url) { c =>
      exec(c, """CREATE TABLE "w" ("id" VARCHAR(8) NOT NULL PRIMARY KEY, "a" BIGINT)""")
      val info = JdbcCatalog.tableInfo(c, "w")
      val e = intercept[IllegalArgumentException](JdbcFlush.typedStatements(info,
        Seq(JdbcFlush.PendingRow("1", "INSERT", Seq("nope" -> "2")))))
      assert(e.getMessage.contains("cannot find column \"nope\" for table \"w\""))
    }
  }
}

/** Introspected end-to-end flush (needs the shared Spark session). */
class JdbcIntrospectedSinkSpec extends SparkSpecBase {

  private def freshDb(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  private def withConn[A](url: String)(f: Connection => A): A = {
    val c = JdbcFlush.connect(url)
    try f(c) finally c.close()
  }

  test("setup → introspected sink: typed columns round-trip, cursor mirrored") {
    import spark.implicits._
    val url = freshDb("introdb")
    withConn(url)(c => JdbcSetup.setupSql(c,
      """CREATE TABLE "wallet" (
        |  "id"      VARCHAR(64) NOT NULL PRIMARY KEY,
        |  "balance" DOUBLE,
        |  "height"  BIGINT,
        |  "memo"    VARCHAR(256))""".stripMargin))
    // pk + field cols come from the live schema, not hand-passed lists
    val sink = JdbcChangeSink.introspected(url, "wallet", "mod_i")
    val b0 = Seq(
      (1L, "u1", "INSERT", Some("1.5"), Some("10"), Some("it's")),
      (2L, "u2", "INSERT", Some("2.0"), Some("11"), None),
      (3L, "u1", "UPDATE", Some("9.25"), None, None))
      .toDF("block", "pk", "op", "balance", "height", "memo")
    assert(sink.processBatch(b0, 0))
    withConn(url) { c =>
      val st = c.createStatement()
      val rs = st.executeQuery(
        """SELECT "id", "balance", "height", "memo" FROM "wallet" ORDER BY "id"""")
      val rows = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4)))
        .toVector
      rs.close(); st.close()
      // DOUBLE/BIGINT stored as real numeric types (raw literals), not strings
      assert(rows == Vector(("u1", 9.25, 10L, "it's"), ("u2", 2.0, 11L, null)))
      // the reference-shape cursors row rides the same transaction
      val st2 = c.createStatement()
      val cr = st2.executeQuery(
        """SELECT "cursor", "block_num" FROM "cursors" WHERE "id" = 'mod_i'""")
      assert(cr.next())
      assert(cr.getLong(2) == 3L)
      cr.close(); st2.close()
    }
  }
}
