package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{ColumnSchema, TableSchema}

/**
 * S2–S4: bounded JDBC snapshot source — the Spark form of the reference's Debezium initial
 * snapshot (`snapshot.mode` handling `ex_mysql_cdc/src/component.py:575-592`,
 * `ex_postgres_cdc/src/component.py:532-543`; statement overrides
 * `postgres_extractor.py:142-146`; parallelism `snapshot.max.threads`/`snapshot.fetch.size`
 * `ex_postgres_cdc/src/configuration.py:115-116`).
 *
 * Everything except the socket is pure and unit-tested: snapshot-mode policy, the per-table
 * SELECT construction (overrides + column include list), and partitioning options. The read
 * itself is `spark.read.jdbc`, which gives Catalyst predicate/projection pushdown and
 * `numPartitions`-way parallel scans (each executor slice runs `WHERE partitionCol BETWEEN…`)
 * — at 100 TB the snapshot parallelism is the cluster width, not a thread-count config.
 */
object JdbcSnapshot {

  /** `snapshot.mode` policy (reference enum `ex_mysql_cdc/src/configuration.py:129-135`). */
  sealed trait Mode { def doSnapshot: Boolean; def doStream: Boolean }
  case object Initial extends Mode { val doSnapshot = true; val doStream = true }
  case object InitialOnly extends Mode { val doSnapshot = true; val doStream = false }
  case object Never extends Mode { val doSnapshot = false; val doStream = true }
  case object SchemaOnly extends Mode { val doSnapshot = false; val doStream = true }
  case object SnapshotOnly extends Mode { val doSnapshot = true; val doStream = false }
  case object WhenNeeded extends Mode { val doSnapshot = true; val doStream = true }

  def parseMode(s: String): Mode = s.toLowerCase match {
    case "initial"                              => Initial
    case "initial_only"                         => InitialOnly
    case "never" | "no_data"                    => Never
    case "schema_only" | "schema_only_recovery" => SchemaOnly
    case "snapshot_only"                        => SnapshotOnly
    case "when_needed"                          => WhenNeeded
    case other => throw new IllegalArgumentException(s"unknown snapshot.mode: $other")
  }

  /** D4 + initial-run policy: the first run of a DEDUPE pipeline is forced to a pure snapshot
    * so it is naturally duplicate-free (`ex_mysql_cdc/src/component.py:523-531`). */
  def effectiveMode(requested: Mode, isFirstRun: Boolean, dedupe: Boolean): Mode =
    if (isFirstRun && dedupe && requested.doSnapshot) InitialOnly else requested

  /**
   * S3: per-table snapshot SELECT — the user override wins verbatim
   * (`snapshot.select.statement.overrides`), otherwise SELECT of the included columns.
   */
  def snapshotStatement(table: String, statementOverride: Option[String],
      includeColumns: Seq[String] = Nil): String =
    statementOverride.getOrElse {
      val cols = if (includeColumns.isEmpty) "*" else includeColumns.mkString(", ")
      s"SELECT $cols FROM $table"
    }

  final case class SnapshotConfig(
      url: String,
      table: String,
      user: String = "",
      password: String = "",
      statementOverride: Option[String] = None,
      includeColumns: Seq[String] = Nil,
      partitionColumn: Option[String] = None,   // S4: parallel scan split column
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 2,                   // reference snapshot.max.threads default
      fetchSize: Int = 10240,                   // reference snapshot.fetch.size default
      driver: Option[String] = None,            // JDBC driver class, when not url-derivable
      /** SSH seam (`ssh_utils.py` analog): maps the url's host:port to a local forward;
        * None = direct connection. See [[PortForward]]/[[SocketRelay]]. */
      tunnel: Option[PortForward] = None)

  /** Rewrite the JDBC url's `//host:port` through the tunnel's local forward — identity
    * without a tunnel; a tunnel over a url with no network endpoint (e.g. embedded Derby)
    * is a config error, reported as such. */
  def effectiveUrl(url: String, tunnel: Option[PortForward]): String = tunnel match {
    case None => url
    case Some(t) =>
      val hostPort = "//([^/:,@?]+):(\\d+)".r
      val m = hostPort.findFirstMatchIn(url).getOrElse(throw new IllegalArgumentException(
        s"tunnel configured but the JDBC url has no //host:port endpoint: $url"))
      val (lh, lp) = t.forward(m.group(1), m.group(2).toInt)
      url.substring(0, m.start) + s"//$lh:$lp" + url.substring(m.end)
  }

  /** S2: run the bounded snapshot read. The statement (override or projected SELECT) goes in
    * as a dbtable subquery so Catalyst still pushes filters/pruning into it. */
  def read(spark: SparkSession, cfg: SnapshotConfig): DataFrame = {
    val stmt = snapshotStatement(cfg.table, cfg.statementOverride, cfg.includeColumns)
    var r = spark.read.format("jdbc")
      .option("url", effectiveUrl(cfg.url, cfg.tunnel))
      .option("dbtable", s"($stmt) snapshot_src")
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("fetchsize", cfg.fetchSize)
    cfg.driver.foreach(d => r = r.option("driver", d))
    (cfg.partitionColumn, cfg.lowerBound, cfg.upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        r = r.option("partitionColumn", c).option("lowerBound", lo)
          .option("upperBound", hi).option("numPartitions", cfg.numPartitions)
      case _ => ()
    }
    r.load()
  }
}

/**
 * S6 + §3.3 sync actions: JDBC metadata provider — `getTables`/`getColumns`/`getPrimaryKeys`
 * → [[TableSchema]], plus the metadata-only sync actions (`testConnection`, `get_schemas`,
 * `get_tables`). Reference: `db_components/db_common/metadata.py:13-91`,
 * `ex_postgres_cdc/src/component.py:546-577`.
 */
object JdbcMetadata {

  def withConnection[T](url: String, user: String, password: String)(f: java.sql.Connection => T): T = {
    val conn = java.sql.DriverManager.getConnection(url, user, password)
    try f(conn) finally conn.close()
  }

  def testConnection(url: String, user: String, password: String): Boolean =
    withConnection(url, user, password)(_.isValid(10))

  def schemas(conn: java.sql.Connection): Seq[String] = {
    val rs = conn.getMetaData.getSchemas
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString("TABLE_SCHEM")
    out.result()
  }

  def tables(conn: java.sql.Connection, schema: String): Seq[String] = {
    val rs = conn.getMetaData.getTables(null, schema, "%", Array("TABLE"))
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString("TABLE_NAME")
    out.result()
  }

  def tableSchema(conn: java.sql.Connection, schema: String, table: String,
      baseTypeOf: String => String = PostgresBaseTypes.of): TableSchema = {
    val md = conn.getMetaData
    val pks = {
      val rs = md.getPrimaryKeys(null, schema, table)
      val b = Set.newBuilder[String]
      while (rs.next()) b += rs.getString("COLUMN_NAME")
      b.result()
    }
    val cols = {
      val rs = md.getColumns(null, schema, table, "%")
      val b = Seq.newBuilder[ColumnSchema]
      while (rs.next()) {
        val name = rs.getString("COLUMN_NAME")
        val typeName = rs.getString("TYPE_NAME")
        b += ColumnSchema(
          name = name,
          sourceType = typeName,
          baseType = baseTypeOf(typeName),
          nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
          length = Option(rs.getString("COLUMN_SIZE")),
          primaryKey = pks.contains(name))
      }
      b.result()
    }
    TableSchema(table, schema, cols)
  }
}

/** §1.3b: Postgres source types → Keboola base types
  * (`ex_postgres_cdc/src/extractor/postgres_extractor.py:21-52`). */
object PostgresBaseTypes {
  private val Mapping: Map[String, String] = Map(
    "smallint" -> "INTEGER", "int2" -> "INTEGER", "integer" -> "INTEGER", "int" -> "INTEGER",
    "int4" -> "INTEGER", "bigint" -> "INTEGER", "int8" -> "INTEGER",
    "smallserial" -> "INTEGER", "serial" -> "INTEGER", "bigserial" -> "INTEGER",
    "numeric" -> "NUMERIC", "decimal" -> "NUMERIC", "money" -> "NUMERIC",
    "real" -> "FLOAT", "float4" -> "FLOAT", "double precision" -> "FLOAT", "float8" -> "FLOAT",
    "boolean" -> "BOOLEAN", "bool" -> "BOOLEAN",
    "date" -> "DATE",
    "timestamp" -> "TIMESTAMP", "timestamptz" -> "TIMESTAMP",
    "timestamp without time zone" -> "TIMESTAMP", "timestamp with time zone" -> "TIMESTAMP")
  def of(sourceType: String): String = Mapping.getOrElse(sourceType.toLowerCase, "STRING")
}

/** §1.3b: MySQL source types → base types, with the `bit(1)` → BOOLEAN special case
  * (`ex_mysql_cdc/src/extractor/mysql_extractor.py:22-60`). */
object MySqlBaseTypes {
  private val Mapping: Map[String, String] = Map(
    "tinyint" -> "INTEGER", "smallint" -> "INTEGER", "mediumint" -> "INTEGER",
    "int" -> "INTEGER", "integer" -> "INTEGER", "bigint" -> "INTEGER", "year" -> "INTEGER",
    "decimal" -> "NUMERIC", "dec" -> "NUMERIC", "numeric" -> "NUMERIC", "fixed" -> "NUMERIC",
    "float" -> "FLOAT", "double" -> "FLOAT", "double precision" -> "FLOAT",
    "date" -> "DATE", "datetime" -> "TIMESTAMP", "timestamp" -> "TIMESTAMP")
  def of(sourceType: String, length: Option[String] = None): String = {
    val t = sourceType.toLowerCase
    if (t == "bit" && length.contains("1")) "BOOLEAN"
    else Mapping.getOrElse(t, "STRING")
  }
}
