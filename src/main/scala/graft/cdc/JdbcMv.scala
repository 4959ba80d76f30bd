package graft.cdc

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.sql.Connection

/** Incremental materialized rollup ON THE JDBC TARGET — the
  * reference-world twin of [[MaterializedAgg]]: a per-group
  * (n_rows, n_vals, total) table maintained with ± delta statements INSIDE
  * the flush transaction ([[JdbcFlush.TxnHook]]), so the rollup is
  * exactly-once with the ops and the cursor — what a ClickHouse
  * MATERIALIZED VIEW gives the reference's users, minus its
  * inserted-blocks-only blindness to UPDATE/DELETE.
  *
  * Per flush: the batch pks' PRIOR rows are read before the op statements
  * and their NEW rows after (same transaction, so the second read sees the
  * ops), group deltas are computed driver-side over the O(batch) rows, and
  * each touched group gets one additive UPDATE (or INSERT); groups whose
  * live count reaches zero are deleted. A replayed batch skips the hook
  * entirely; any failure rolls back ops, rollup and cursor together.
  *
  * Totals live in `DECIMAL(31, scale)` — decimal addition is exact, so the
  * maintained rollup is bit-equal to a direct `SUM(CAST(... AS DECIMAL))`
  * recompute (the spec's witness).
  */
object JdbcMv {

  /** Rollup definition: `mvTable` gets (grp, n_rows, n_vals, total). */
  final case class MvSpec(mvTable: String, groupCol: String, valueCol: String,
      scale: Int = 2)

  private def q(id: String): String = SqlDialect.escapeIdentifier(id)

  /** Create the rollup table if absent (quoted lowercase identifiers, like
    * [[JdbcSetup]]-managed tables).
    */
  def ensureMvTable(conn: Connection, spec: MvSpec): Unit = {
    val rs = conn.getMetaData.getTables(null, null, spec.mvTable, null)
    val exists = try rs.next() finally rs.close()
    if (!exists) {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE ${q(spec.mvTable)} (
           |  ${q("grp")} VARCHAR(256),
           |  ${q("n_rows")} BIGINT NOT NULL,
           |  ${q("n_vals")} BIGINT NOT NULL,
           |  ${q("total")} DECIMAL(31, ${spec.scale}) NOT NULL)""".stripMargin)
      finally st.close()
    }
  }

  /** [[JdbcFlush.flushTyped]] plus rollup maintenance in the same
    * transaction. Returns false on a replayed batch (rollup untouched).
    */
  def flushTypedWithMv(conn: Connection, info: JdbcTableInfo,
      rows: Seq[JdbcFlush.PendingRow], cursor: Cursor, batchId: Long,
      spec: MvSpec): Boolean = {
    val pks = rows.map(_.pk).distinct
    var before: Seq[(Option[String], Option[JBigDecimal])] = Nil
    val hook = new JdbcFlush.TxnHook {
      override def beforeOps(c: Connection): Unit = {
        ensureMvTable(c, spec)
        before = contributions(c, info, spec, pks)
      }
      override def afterOps(c: Connection): Unit =
        applyDeltas(c, spec, deltasOf(before, contributions(c, info, spec, pks)))
    }
    JdbcFlush.execFlush(conn, JdbcFlush.typedStatements(info, rows), cursor,
      batchId, Some(hook))
  }

  /** (group, value) of the batch pks' CURRENT rows — O(batch) via the pk
    * index, never a table scan. Values land at the rollup's scale (exact
    * for in-scale inputs; HALF_UP beyond, matching Spark's decimal cast).
    */
  private def contributions(conn: Connection, info: JdbcTableInfo,
      spec: MvSpec, pks: Seq[String]): Seq[(Option[String], Option[JBigDecimal])] = {
    if (pks.isEmpty) return Nil
    val pkKind = info.column(info.pkCol)
      .getOrElse(throw new IllegalArgumentException(
        s"""cannot find column "${info.pkCol}" for table "${info.name}"""")).kind
    val in = pks.map(SqlDialect.normalizeValue(_, pkKind)).mkString(", ")
    val sql = s"SELECT ${q(spec.groupCol)}, ${q(spec.valueCol)} " +
      s"FROM ${q(info.name)} WHERE ${q(info.pkCol)} IN ($in)"
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val out = Iterator.continually(rs)
        .takeWhile(_.next())
        .map { r =>
          val g = Option(r.getString(1))
          val v = Option(r.getBigDecimal(2))
            .map(_.setScale(spec.scale, RoundingMode.HALF_UP))
          (g, v)
        }
        .toVector
      rs.close()
      out
    } finally st.close()
  }

  /** Per-group (Δrows, Δvals, Δtotal): new rows add, prior rows subtract. */
  private def deltasOf(before: Seq[(Option[String], Option[JBigDecimal])],
      after: Seq[(Option[String], Option[JBigDecimal])]
  ): Map[Option[String], (Long, Long, JBigDecimal)] = {
    val zero = JBigDecimal.ZERO
    def fold(rows: Seq[(Option[String], Option[JBigDecimal])], sign: Int) =
      rows.groupBy(_._1).view.mapValues { g =>
        (sign.toLong * g.size,
          sign.toLong * g.count(_._2.isDefined),
          g.flatMap(_._2).foldLeft(zero)(_.add(_))
            .multiply(JBigDecimal.valueOf(sign.toLong)))
      }.toMap
    val minus = fold(before, -1)
    val plus = fold(after, 1)
    (minus.keySet ++ plus.keySet).map { g =>
      val (ar, av, at) = plus.getOrElse(g, (0L, 0L, zero))
      val (br, bv, bt) = minus.getOrElse(g, (0L, 0L, zero))
      g -> (ar + br, av + bv, at.add(bt))
    }.toMap
  }

  /** One additive UPDATE (or first-touch INSERT) per changed group, then
    * drop groups with no live rows left.
    */
  private def applyDeltas(conn: Connection, spec: MvSpec,
      deltas: Map[Option[String], (Long, Long, JBigDecimal)]): Unit = {
    val mv = q(spec.mvTable)
    for ((g, (dr, dv, dt)) <- deltas if dr != 0 || dv != 0 || dt.signum != 0) {
      val where = g.fold(s"${q("grp")} IS NULL")(_ => s"${q("grp")} = ?")
      val upd = conn.prepareStatement(
        s"UPDATE $mv SET ${q("n_rows")} = ${q("n_rows")} + ?, " +
          s"${q("n_vals")} = ${q("n_vals")} + ?, " +
          s"${q("total")} = ${q("total")} + ? WHERE $where")
      upd.setLong(1, dr); upd.setLong(2, dv)
      upd.setBigDecimal(3, dt.setScale(spec.scale, RoundingMode.HALF_UP))
      g.foreach(upd.setString(4, _))
      val n = upd.executeUpdate(); upd.close()
      if (n == 0) {
        val ins = conn.prepareStatement(s"INSERT INTO $mv VALUES (?, ?, ?, ?)")
        g.fold(ins.setNull(1, java.sql.Types.VARCHAR))(ins.setString(1, _))
        ins.setLong(2, dr); ins.setLong(3, dv)
        ins.setBigDecimal(4, dt.setScale(spec.scale, RoundingMode.HALF_UP))
        ins.executeUpdate(); ins.close()
      }
    }
    val st = conn.createStatement()
    try st.executeUpdate(s"DELETE FROM $mv WHERE ${q("n_rows")} <= 0")
    finally st.close()
  }
}
