package graft.cdc

import java.sql.{Connection, Types}

/** One introspected target column — the reference's `ColumnInfo`
  * (`/root/reference/db/db.go:106-114`: name, escaped name, database type
  * name, Go scan type). The JDBC analog keeps the `java.sql.Types` code and
  * derives the reference's scan-type *kind* class from it for validation.
  */
final case class JdbcColumn(name: String, jdbcType: Int, typeName: String,
    position: Int, nullable: Boolean) {

  /** The reference validates cursor columns by comparing Go `reflect.Kind`
    * strings (`db/db.go:156-158`); this buckets `java.sql.Types` into the
    * same classes (`int64`, `string`, …).
    */
  def kind: String = JdbcCatalog.kindOf(jdbcType)

  def escapedName: String = SqlDialect.escapeIdentifier(name)
}

/** Introspected table shape — the reference's `TableInfo` (`db/tables.go`):
  * name, primary-key column, columns in ordinal order.
  */
final case class JdbcTableInfo(name: String, pkCols: Seq[String],
    columns: Seq[JdbcColumn]) {

  /** First pk column; the reference defaults to `"id"` when the table
    * declares none (`db/db.go:121-124`).
    */
  def pkCol: String = pkCols.headOption.getOrElse("id")

  def columnNames: Seq[String] = columns.map(_.name)

  def column(colName: String): Option[JdbcColumn] = columns.find(_.name == colName)

  /** Non-pk columns in schema order — the field set a collapsed CDC batch
    * carries for this table.
    */
  def fieldCols: Seq[String] = columnNames.filterNot(_ == pkCol)
}

/** Mirrors the reference's `CursorError` (`db/db.go:17-19`): a distinct
  * error class so callers can branch on cursor-table problems (the
  * reference's CLI prints a "run setup first" hint on it).
  */
final class CursorTableException(msg: String) extends RuntimeException(msg)

/** Live-target schema introspection over `java.sql.DatabaseMetaData` —
  * re-expresses the reference's target-DB catalog probes
  * (`/root/reference/db/db.go:82-178` LoadTables/validateCursorTables,
  * `db/operations.go:211-277` table/column/pk queries). Where the reference
  * issues ClickHouse `system.tables` / `system.columns` queries and LIMIT-0
  * scans, a JDBC target exposes the same facts through standard metadata
  * calls — no vendor SQL needed.
  */
object JdbcCatalog {

  /** The reference's cursor table name (`db/db.go:99`). */
  val CursorTable = "cursors"

  /** `java.sql.Types` → reference scan-kind class (`db/db.go:144-149`
    * expects `int64` for block_num and `string` for the other three).
    */
  def kindOf(jdbcType: Int): String = jdbcType match {
    case Types.TINYINT | Types.SMALLINT | Types.INTEGER | Types.BIGINT => "int64"
    case Types.FLOAT | Types.REAL | Types.DOUBLE                       => "float64"
    case Types.DECIMAL | Types.NUMERIC                                 => "decimal"
    case Types.BOOLEAN | Types.BIT                                     => "bool"
    case Types.DATE | Types.TIME | Types.TIMESTAMP |
         Types.TIME_WITH_TIMEZONE | Types.TIMESTAMP_WITH_TIMEZONE      => "time"
    case Types.CHAR | Types.VARCHAR | Types.LONGVARCHAR | Types.CLOB |
         Types.NCHAR | Types.NVARCHAR | Types.LONGNVARCHAR             => "string"
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB => "bytes"
    case _                                                             => "other"
  }

  private def currentSchema(conn: Connection): String =
    try conn.getSchema
    catch { case _: Throwable => null }

  /** All base-table names in the connection's current schema — the
    * reference's `getTableNamesInDatabase` (`db/operations.go:211-230`,
    * `system.tables WHERE database = ?`).
    */
  def tableNames(conn: Connection): Seq[String] = {
    val rs = conn.getMetaData.getTables(null, currentSchema(conn), "%", Array("TABLE"))
    try Iterator.continually(rs).takeWhile(_.next())
      .map(_.getString("TABLE_NAME")).toVector.sorted
    finally rs.close()
  }

  /** Columns (name, type, ordinal, nullability) for one table — the
    * reference's LIMIT-0 probe (`db/operations.go:232-246`), via metadata
    * instead of a scan.
    */
  def columnsOf(conn: Connection, table: String): Seq[JdbcColumn] = {
    val rs = conn.getMetaData.getColumns(null, currentSchema(conn), table, "%")
    try Iterator.continually(rs).takeWhile(_.next())
      .map(r => JdbcColumn(
        name = r.getString("COLUMN_NAME"),
        jdbcType = r.getInt("DATA_TYPE"),
        typeName = r.getString("TYPE_NAME"),
        position = r.getInt("ORDINAL_POSITION"),
        nullable = r.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls))
      .toVector.sortBy(_.position)
    finally rs.close()
  }

  /** Primary-key column names in key-sequence order — the reference's
    * `getPrimaryKeysForTable` (`db/operations.go:248-277`, ordered by
    * position).
    */
  def primaryKeysOf(conn: Connection, table: String): Seq[String] = {
    val rs = conn.getMetaData.getPrimaryKeys(null, currentSchema(conn), table)
    try Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getShort("KEY_SEQ"), r.getString("COLUMN_NAME")))
      .toVector.sortBy(_._1).map(_._2)
    finally rs.close()
  }

  /** Full shape of one table; fails if the table is unknown to the target. */
  def tableInfo(conn: Connection, table: String): JdbcTableInfo = {
    val cols = columnsOf(conn, table)
    require(cols.nonEmpty, s"""table "$table" not found in target database""")
    JdbcTableInfo(table, primaryKeysOf(conn, table), cols)
  }

  /** The reference's `LoadTables` (`db/db.go:82-138`): introspect every
    * table, validate the cursors table's shape, and fail with the
    * reference's `CursorError` when it is absent.
    */
  def loadTables(conn: Connection): Map[String, JdbcTableInfo] = {
    val infos = tableNames(conn).map(t => t -> tableInfo(conn, t)).toMap
    infos.get(CursorTable) match {
      case None => throw new CursorTableException(s""""$CursorTable" table is not found""")
      case Some(ct) => validateCursorTable(ct)
    }
    infos
  }

  /** The reference's `validateCursorTables` (`db/db.go:140-178`): exactly
    * four columns named id/cursor/block_num/block_id with string/string/
    * int64/string kinds, and `id` as the (first) primary key. Error
    * messages mirror the reference's so operators see familiar diagnostics.
    */
  def validateCursorTable(info: JdbcTableInfo): Unit = {
    val expected = Map(
      "block_num" -> "int64",
      "block_id"  -> "string",
      "cursor"    -> "string",
      "id"        -> "string")
    if (info.columns.size != 4)
      throw new CursorTableException(
        "table requires 4 columns ('id', 'cursor', 'block_num', 'block_id')")
    val remaining = scala.collection.mutable.Map(expected.toSeq: _*)
    info.columns.foreach { c =>
      remaining.remove(c.name) match {
        case None =>
          throw new CursorTableException(
            s"""unexpected column "${c.name}" in cursors table""")
        case Some(expectedKind) =>
          if (c.kind != expectedKind)
            throw new CursorTableException(
              s"""column "${c.name}" has invalid type, expected "$expectedKind" has "${c.kind}"""")
      }
    }
    remaining.keys.headOption.foreach { k =>
      throw new CursorTableException(s"""missing column "$k" from cursors""")
    }
    if (info.pkCols.isEmpty)
      throw new CursorTableException("primary key not found")
    if (info.pkCols.head != "id")
      throw new CursorTableException(
        s"""column 'id' should be primary key not "${info.pkCols.head}"""")
  }
}
