package graft.cdc

import org.apache.spark.sql.DataFrame

import java.sql.{Connection, DriverManager}

/** Transactional JDBC flush executor — the reference's `db/flush.go:12-63`
  * semantics against any JDBC database: every pending op's statement AND
  * the cursor advance commit in ONE transaction, so a crash mid-flush
  * leaves the target exactly at the previous cursor, and a replayed batch
  * is detected inside the transaction and skipped (exactly-once).
  *
  * The flush unit is the COLLAPSED batch ([[ChangeLoader.pendingOps]]) —
  * the same thing the reference holds in its in-memory op buffer
  * (`db/ops.go` map), one row per (pk): snapshot-scale data never passes
  * through this path, only the delta. For bulk historical backfill the
  * lake-side sinks ([[graft.streaming.ChangeStreamSink]]) are the scale
  * path; this executor closes the reference's live-DB surface.
  */
object JdbcFlush {

  /** One pending op ready for statement generation: `sqlOp` is
    * INSERT/UPDATE/DELETE/REPLACE per [[ChangeLoader.pendingOps]], fields
    * are (column, string-value) pairs in schema order with nulls absent.
    */
  final case class PendingRow(pk: String, sqlOp: String, fields: Seq[(String, String)])

  /** Deterministic statement list for a collapsed batch: deletes first
    * (REPLACE pks delete before their re-insert), then upserts, each group
    * ordered by pk.
    */
  def statements(table: String, pkCol: String, rows: Seq[PendingRow]): Seq[String] = {
    val sorted = rows.sortBy(_.pk)
    val deletes = sorted.collect {
      case r if r.sqlOp == Op.Delete || r.sqlOp == "REPLACE" =>
        SqlDialect.deleteSql(table, Seq(pkCol -> r.pk))
    }
    val upserts = sorted.collect {
      case r if r.sqlOp == Op.Insert || r.sqlOp == "REPLACE" =>
        SqlDialect.insertSql(table, (pkCol -> r.pk) +: r.fields)
      case r if r.sqlOp == Op.Update =>
        SqlDialect.updateSqlAnsi(table, r.fields, Seq(pkCol -> r.pk))
    }
    deletes ++ upserts
  }

  /** Statement list for a collapsed batch against an INTROSPECTED table
    * shape ([[JdbcCatalog.tableInfo]]): same delete-first/pk-sorted order
    * as [[statements]], but every value renders through
    * [[SqlDialect.normalizeValue]] with the column's live type kind — the
    * reference's `prepareColValues` + `normalizeValueType`
    * (`db/operations.go:118-193`), including its unknown-column error.
    */
  def typedStatements(info: JdbcTableInfo, rows: Seq[PendingRow]): Seq[String] = {
    def lit(col: String, v: String): (String, String) = {
      val c = info.column(col).getOrElse(throw new IllegalArgumentException(
        s"""cannot find column "$col" for table "${info.name}""""))
      c.name -> SqlDialect.normalizeValue(v, c.kind)
    }
    val table = SqlDialect.escapeIdentifier(info.name)
    def where(pk: String): String = {
      val (c, v) = lit(info.pkCol, pk)
      s"${SqlDialect.escapeIdentifier(c)}=$v"
    }
    val sorted = rows.sortBy(_.pk)
    val deletes = sorted.collect {
      case r if r.sqlOp == Op.Delete || r.sqlOp == "REPLACE" =>
        s"DELETE FROM $table WHERE ${where(r.pk)}"
    }
    val upserts = sorted.collect {
      case r if r.sqlOp == Op.Insert || r.sqlOp == "REPLACE" =>
        val cols = (info.pkCol -> r.pk) +: r.fields
        val rendered = cols.map { case (c, v) => lit(c, v) }
        s"INSERT INTO $table (${rendered.map(f => SqlDialect.escapeIdentifier(f._1)).mkString(",")}) " +
          s"VALUES (${rendered.map(_._2).mkString(",")})"
      case r if r.sqlOp == Op.Update =>
        val sets = r.fields.map { case (c, v) =>
          val (name, l) = lit(c, v)
          s"${SqlDialect.escapeIdentifier(name)}=$l"
        }.mkString(", ")
        s"UPDATE $table SET $sets WHERE ${where(r.pk)}"
    }
    deletes ++ upserts
  }

  /** Collect a [[ChangeLoader.pendingOps]] frame into driver-side rows
    * (delta-sized by construction).
    */
  def collectPending(pending: DataFrame, fieldCols: Seq[String]): Seq[PendingRow] =
    pending.collect().toSeq.map { r =>
      val fields = fieldCols.flatMap { f =>
        Option(r.get(r.fieldIndex(f))).map(v => f -> String.valueOf(v))
      }
      PendingRow(String.valueOf(r.get(r.fieldIndex("pk"))),
        r.getAs[String]("sql_op"), fields)
    }

  val CursorTable = "graft_cursors"

  private def ensureCursorTable(conn: Connection): Unit = {
    val meta = conn.getMetaData.getTables(null, null, CursorTable.toUpperCase, null)
    val exists = meta.next()
    meta.close()
    if (!exists) {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $CursorTable (
           |  module_hash VARCHAR(256) PRIMARY KEY,
           |  cursor_v VARCHAR(1024),
           |  block_num BIGINT,
           |  block_id VARCHAR(256),
           |  batch_id BIGINT)""".stripMargin)
      finally st.close()
    }
  }

  /** Execute one flush transactionally. Returns false (no-op) when the
    * module's stored batch_id already covers `batchId` — the replay check
    * runs INSIDE the transaction, like the reference's cursor-row UPDATE
    * sharing the ops transaction.
    */
  def flush(conn: Connection, table: String, pkCol: String, rows: Seq[PendingRow],
      cursor: Cursor, batchId: Long): Boolean =
    execFlush(conn, statements(table, pkCol, rows), cursor, batchId)

  /** [[flush]] with statements generated from the live target schema
    * ([[typedStatements]]) — the reference's introspection-driven path
    * where `LoadTables` shapes every op (`db/db.go:82-130`).
    */
  def flushTyped(conn: Connection, info: JdbcTableInfo, rows: Seq[PendingRow],
      cursor: Cursor, batchId: Long): Boolean =
    execFlush(conn, typedStatements(info, rows), cursor, batchId)

  /** Extra work carried inside the flush transaction: `beforeOps` runs
    * after the replay check and before the op statements, `afterOps`
    * between the ops and the cursor advance. Neither runs on a replayed
    * batch, and a failure in either rolls the whole flush back —
    * [[JdbcMv]] rides this to keep an on-target rollup exactly-once.
    */
  private[cdc] trait TxnHook {
    def beforeOps(conn: Connection): Unit
    def afterOps(conn: Connection): Unit
  }

  private[cdc] def execFlush(conn: Connection, stmts: Seq[String],
      cursor: Cursor, batchId: Long, hook: Option[TxnHook] = None): Boolean = {
    val prevAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    try {
      ensureCursorTable(conn)
      val check = conn.prepareStatement(
        s"SELECT batch_id FROM $CursorTable WHERE module_hash = ?")
      check.setString(1, cursor.moduleHash)
      val rs = check.executeQuery()
      val existing = if (rs.next()) Some(rs.getLong(1)) else None
      rs.close(); check.close()
      if (existing.exists(_ >= batchId)) { conn.rollback(); return false }

      hook.foreach(_.beforeOps(conn))
      val st = conn.createStatement()
      try stmts.foreach(sql => st.execute(sql.stripSuffix(";")))
      finally st.close()
      hook.foreach(_.afterOps(conn))

      val upd = conn.prepareStatement(
        s"UPDATE $CursorTable SET cursor_v = ?, block_num = ?, block_id = ?, " +
          "batch_id = ? WHERE module_hash = ?")
      upd.setString(1, cursor.cursor); upd.setLong(2, cursor.blockNum)
      upd.setString(3, cursor.blockId); upd.setLong(4, batchId)
      upd.setString(5, cursor.moduleHash)
      val n = upd.executeUpdate(); upd.close()
      if (n == 0) {
        val ins = conn.prepareStatement(
          s"INSERT INTO $CursorTable VALUES (?, ?, ?, ?, ?)")
        ins.setString(1, cursor.moduleHash); ins.setString(2, cursor.cursor)
        ins.setLong(3, cursor.blockNum); ins.setString(4, cursor.blockId)
        ins.setLong(5, batchId)
        ins.executeUpdate(); ins.close()
      }
      mirrorReferenceCursor(conn, cursor)
      conn.commit()
      true
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.setAutoCommit(prevAutoCommit)
  }

  /** When the target carries the reference's `cursors` table (created by
    * [[JdbcSetup.setupCursorTable]]), mirror the cursor row into it inside
    * the flush transaction — the reference's `UpdateCursor` shares the ops
    * txn (`db/flush.go:52`), and reference-schema consumers read their
    * resume position from that table. `graft_cursors` stays the
    * engine-internal store (it additionally carries batch_id for the
    * exactly-once replay check the reference lacks).
    */
  private def mirrorReferenceCursor(conn: Connection, cursor: Cursor): Unit = {
    val rs = conn.getMetaData.getTables(null, null, JdbcCatalog.CursorTable, Array("TABLE"))
    val exists = try rs.next() finally rs.close()
    if (!exists) return
    val upd = conn.prepareStatement(
      """UPDATE "cursors" SET "cursor" = ?, "block_num" = ?, "block_id" = ? WHERE "id" = ?""")
    upd.setString(1, cursor.cursor); upd.setLong(2, cursor.blockNum)
    upd.setString(3, cursor.blockId); upd.setString(4, cursor.moduleHash)
    val n = upd.executeUpdate(); upd.close()
    if (n == 0) {
      val ins = conn.prepareStatement("""INSERT INTO "cursors" VALUES (?, ?, ?, ?)""")
      ins.setString(1, cursor.moduleHash); ins.setString(2, cursor.cursor)
      ins.setLong(3, cursor.blockNum); ins.setString(4, cursor.blockId)
      ins.executeUpdate(); ins.close()
    }
  }

  /** Stored cursor for a module (resume point), if any. */
  def readCursor(conn: Connection, moduleHash: String): Option[(Cursor, Long)] = {
    ensureCursorTable(conn)
    val ps = conn.prepareStatement(
      s"SELECT cursor_v, block_num, block_id, batch_id FROM $CursorTable " +
        "WHERE module_hash = ?")
    ps.setString(1, moduleHash)
    val rs = ps.executeQuery()
    val out =
      if (rs.next())
        Some((Cursor(moduleHash, rs.getString(1), rs.getLong(2), rs.getString(3)),
          rs.getLong(4)))
      else None
    rs.close(); ps.close()
    out
  }

  def connect(url: String): Connection = DriverManager.getConnection(url)
}
