package graft

import graft.sources.{JdbcMetadata, JdbcSnapshot}
import graft.sources.JdbcSnapshot.SnapshotConfig

/** S2–S4/S6 driven end-to-end against embedded Derby (ships with Spark): real JDBC scans
  * with overrides and partitioned parallel reads, real DatabaseMetaData extraction. */
class JdbcEndToEndSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val conn = {
    val c = java.sql.DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE ITEMS(ID INT NOT NULL PRIMARY KEY, NAME VARCHAR(20), PRICE DOUBLE)")
    (1 to 10).foreach(i => st.execute(s"INSERT INTO ITEMS VALUES ($i, 'item$i', ${i * 1.5})"))
    c
  }

  test("metadata provider: columns, types, nullability, primary key (S6)") {
    val ts = JdbcMetadata.tableSchema(conn, "APP", "ITEMS")
    assert(ts.columns.map(_.name) == Seq("ID", "NAME", "PRICE"))
    assert(ts.primaryKeys == Seq("ID"))
    assert(!ts.columns.head.nullable && ts.columns(1).nullable)
    assert(ts.columns(1).baseType == "STRING" && ts.columns(2).baseType == "STRING") // derby DOUBLE not in pg map
    assert(ts.safeId == "APP_ITEMS")
    assert(JdbcMetadata.tables(conn, "APP") == Seq("ITEMS"))
  }

  test("sync actions: testConnection and schema listing (§3.3)") {
    conn // force setup
    assert(JdbcMetadata.testConnection(url, "", ""))
    assert(JdbcMetadata.schemas(conn).contains("APP"))
  }

  test("heartbeat keepalive executes the action query on an interval (§2.7)") {
    conn.createStatement().execute(
      "CREATE TABLE HEARTBEAT(ID INT GENERATED ALWAYS AS IDENTITY, BEAT_AT TIMESTAMP)")
    val hb = new graft.sources.Heartbeat(conn,
      "INSERT INTO HEARTBEAT(BEAT_AT) VALUES (CURRENT_TIMESTAMP)", intervalMs = 50L)
    try Thread.sleep(400) finally hb.close()
    val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM HEARTBEAT")
    rs.next()
    assert(rs.getInt(1) >= 3 && hb.beatCount >= 3)
    val after = hb.beatCount
    Thread.sleep(150) // closed -> no further beats
    assert(hb.beatCount == after)
  }

  test("snapshot read: full table, statement override, partitioned parallel scan (S2-S4)") {
    conn // force setup
    val cfg = SnapshotConfig(url, "APP.ITEMS", driver = Some(DerbyDriver))
    val full = JdbcSnapshot.read(spark, cfg)
    assert(full.count() == 10)
    assert(full.columns.toSeq == Seq("ID", "NAME", "PRICE"))

    val overridden = JdbcSnapshot.read(spark,
      cfg.copy(statementOverride = Some("SELECT ID, NAME FROM APP.ITEMS WHERE ID > 5")))
    assert(overridden.count() == 5 && overridden.columns.toSeq == Seq("ID", "NAME"))

    val projected = JdbcSnapshot.read(spark, cfg.copy(includeColumns = Seq("ID", "PRICE")))
    assert(projected.columns.toSeq == Seq("ID", "PRICE"))

    val partitioned = JdbcSnapshot.read(spark, cfg.copy(
      partitionColumn = Some("ID"), lowerBound = Some(1L), upperBound = Some(11L),
      numPartitions = 3))
    assert(partitioned.rdd.getNumPartitions == 3)
    assert(partitioned.count() == 10)
  }
}
