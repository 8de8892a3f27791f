package graft.warehouse

import java.sql.DriverManager

import graft.SparkSpec

/** Exercises the JDBC warehouse path (reference `DB_manager.py:107-179`)
  * against an in-JVM Derby database (ships with Spark, zero egress):
  * truncate-and-load keeps the DDL in place, the SCD-0 merge inserts only
  * new keys, and replays are no-ops.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftwh;create=true"
  private val conn = Jdbc.Conn(url, "app", "app",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private def withStatement[T](f: java.sql.Statement => T): T = {
    val c = DriverManager.getConnection(url)
    try { val s = c.createStatement(); try f(s) finally s.close() }
    finally c.close()
  }

  private def ensureTables(): Unit = withStatement { st =>
    def createIfMissing(ddl: String): Unit =
      try st.execute(ddl)
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    createIfMissing(
      """CREATE TABLE stage_markets (
        |  market_stockid VARCHAR(16) NOT NULL,
        |  market_companyname VARCHAR(128))""".stripMargin)
    createIfMissing(
      """CREATE TABLE markets (
        |  market_stockid VARCHAR(16) NOT NULL PRIMARY KEY,
        |  market_companyname VARCHAR(128))""".stripMargin)
    st.execute("TRUNCATE TABLE stage_markets"): Unit
    st.execute("DELETE FROM markets"): Unit
  }

  private def count(table: String): Long = withStatement { st =>
    val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
    rs.next(); rs.getLong(1)
  }

  private def stageDf(rows: (String, String)*) =
    rows.toDF("market_stockid", "market_companyname")

  test("stage truncate-and-load keeps the declared DDL types in place") {
    ensureTables()
    Jdbc.stageLoad(stageDf("AAPL" -> "Apple"), conn, "stage_markets",
      numPartitions = 1)
    Jdbc.stageLoad(stageDf("AAPL" -> "Apple", "MSFT" -> "Microsoft"), conn,
      "stage_markets", numPartitions = 1)
    assert(count("stage_markets") === 2)
    // the column is still the DDL's VARCHAR(16), not a re-created default
    // type — proof the load TRUNCATEd instead of DROP+CREATE
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.getMetaData.getColumns(null, null, "STAGE_MARKETS", "MARKET_STOCKID")
      assert(rs.next())
      assert(rs.getString("TYPE_NAME") === "VARCHAR")
      assert(rs.getInt("COLUMN_SIZE") === 16)
    } finally c.close()
  }

  test("SCD-0 merge into JDBC warehouse inserts only new keys; replay is a no-op") {
    ensureTables()
    Jdbc.mergeAppend(stageDf("AAPL" -> "Apple", "MSFT" -> "Microsoft"), conn,
      "markets", "market_stockid")
    assert(count("markets") === 2)
    // replay the same stage: anti-join drops everything
    Jdbc.mergeAppend(stageDf("AAPL" -> "Apple", "MSFT" -> "Microsoft"), conn,
      "markets", "market_stockid")
    assert(count("markets") === 2)
    // new key plus an existing one: only the new key lands
    Jdbc.mergeAppend(stageDf("MSFT" -> "Microsoft", "GOOG" -> "Alphabet"), conn,
      "markets", "market_stockid")
    assert(count("markets") === 3)
    // in-batch duplicate keys are collapsed before insert (PK stays happy)
    Jdbc.mergeAppend(stageDf("NVDA" -> "NVIDIA", "NVDA" -> "NVIDIA Corp"), conn,
      "markets", "market_stockid")
    assert(count("markets") === 4)
  }
}
