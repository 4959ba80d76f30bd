package graft.cdc

import java.net.URI

/** SQL generation with ClickHouse-style escaping — re-expresses the
  * reference's statement builders (`/root/reference/db/operations.go:77-141`,
  * `escapeStringValue`/`EscapeIdentifier`): identifiers double `"`, string
  * literals double `'` and escape backslash.
  *
  * The engine itself never round-trips through SQL text (plans are built
  * with the DataFrame API); this exists for emitting statements to an
  * EXTERNAL sink database, as the reference does.
  */
object SqlDialect {

  def escapeIdentifier(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  def escapeString(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  def insertSql(table: String, fields: Seq[(String, String)]): String = {
    val cols = fields.map { case (k, _) => escapeIdentifier(k) }.mkString(",")
    val vals = fields.map { case (_, v) => escapeString(v) }.mkString(",")
    s"INSERT INTO ${escapeIdentifier(table)} ($cols) VALUES ($vals);"
  }

  /** ClickHouse mutation-style UPDATE (`operations.go:107`). */
  def updateSql(table: String, fields: Seq[(String, String)], pk: Seq[(String, String)]): String = {
    val sets = fields.map { case (k, v) => s"${escapeIdentifier(k)}=${escapeString(v)}" }
      .mkString(", ")
    s"ALTER TABLE ${escapeIdentifier(table)} UPDATE $sets WHERE ${whereClause(pk)};"
  }

  /** Standard-SQL UPDATE — same escaping, for JDBC targets that are not
    * ClickHouse (the [[JdbcFlush]] executor's default).
    */
  def updateSqlAnsi(table: String, fields: Seq[(String, String)], pk: Seq[(String, String)]): String = {
    val sets = fields.map { case (k, v) => s"${escapeIdentifier(k)}=${escapeString(v)}" }
      .mkString(", ")
    s"UPDATE ${escapeIdentifier(table)} SET $sets WHERE ${whereClause(pk)};"
  }

  def deleteSql(table: String, pk: Seq[(String, String)]): String =
    s"DELETE FROM ${escapeIdentifier(table)} WHERE ${whereClause(pk)};"

  private def whereClause(pk: Seq[(String, String)]): String =
    pk.map { case (k, v) => s"${escapeIdentifier(k)}=${escapeString(v)}" }.mkString(" AND ")

  private val integerRe = "^\\d+$".r
  private val numericRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$".r
  private val epochFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  /** Format one string-typed CDC value as a SQL literal for a column of
    * the given introspected kind ([[JdbcColumn.kind]]) — the reference's
    * `normalizeValueType` (`operations.go:150-193`): strings escape+quote,
    * bools quote, numerics pass through raw, epoch-second integers headed
    * for time columns render as a timestamp literal, anything unknown
    * passes through for the target to interpret.
    *
    * Two deliberate deviations from the reference, both safety-tightening:
    * raw numeric passthrough is validated against a numeric shape (the
    * reference trusts the value, `operations.go:158-165`), and the
    * timestamp spelling is the SQL-standard `yyyy-MM-dd HH:mm:ss` UTC that
    * JDBC targets accept rather than Go's RFC3339.
    */
  def normalizeValue(value: String, kind: String): String = kind match {
    case "string" => escapeString(value)
    case "bool"   => "'" + value + "'"
    case "int64" | "float64" | "decimal" =>
      require(numericRe.pattern.matcher(value).matches(),
        s"""non-numeric value "$value" for a $kind column""")
      value
    case "time" =>
      if (integerRe.pattern.matcher(value).matches())
        escapeString(epochFmt.format(java.time.Instant.ofEpochSecond(value.toLong)))
      else escapeString(value)
    case _ => value
  }
}

/** Parsed sink-database connection string, matching the reference's
  * `db/dsn.go` rules exactly:
  *
  *   - `${VAR}` / `$VAR` environment substitution BEFORE parsing
  *     (`dsn.go:27` envsubst),
  *   - the scheme MUST be `clickhouse` (`dsn.go:37-39` errors otherwise),
  *   - port defaults to 8123 — the HTTP interface — when absent
  *     (`dsn.go:43`),
  *   - database defaults to `default` (`dsn.go:49-52`),
  *   - options are flattened `key=v1,v2` strings sorted by key
  *     (`dsn.go:54-72`).
  */
final case class Dsn(
    scheme: String,
    user: Option[String],
    password: Option[String],
    host: String,
    port: Int,
    database: String,
    params: Map[String, String]
) {

  /** The reference's `connString()` (`dsn.go:78-87`): HTTP endpoint form. */
  def connString: String = {
    val base = s"http://$host:$port/$database?user=${user.getOrElse("")}"
    val withPass = password.filter(_.nonEmpty).fold(base)(p => s"$base&password=$p")
    val opts = params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
    if (opts.isEmpty) withPass else withPass + "&" + opts.mkString("&")
  }
}

object Dsn {

  /** `dsn.go:43`: the ClickHouse HTTP port, not the native 9000. */
  val DefaultPort = 8123

  private val varPattern = "\\$\\{(\\w+)\\}|\\$(\\w+)".r

  /** `${VAR}` / `$VAR` → environment value (empty when unset) — the
    * reference's envsubst expansion (`dsn.go:27-30`).
    */
  def substituteEnv(s: String, env: String => Option[String] = sys.env.get): String =
    varPattern.replaceAllIn(s, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      java.util.regex.Matcher.quoteReplacement(env(name).getOrElse(""))
    })

  def parse(dsn: String, env: String => Option[String] = sys.env.get): Dsn = {
    val u = new URI(substituteEnv(dsn, env))
    require(u.getScheme == "clickhouse",
      s"""invalid scheme "${Option(u.getScheme).getOrElse("")}", should be "clickhouse"""")
    require(u.getHost != null, s"malformed DSN: $dsn")
    val userInfo = Option(u.getUserInfo).map(_.split(":", 2))
    // multi-valued keys join with ',' and keys sort — dsn.go:64-72
    val params = Option(u.getQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k)    => k -> ""
        }
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).mkString(",") }
    Dsn(
      scheme = u.getScheme,
      user = userInfo.map(_(0)),
      password = userInfo.flatMap(_.lift(1)),
      host = u.getHost,
      port = if (u.getPort == -1) DefaultPort else u.getPort,
      database = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
        .getOrElse("default"),
      params = params
    )
  }
}
