package graft.warehouse

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse sink/source: the reference's actual load target is a
  * Postgres `stage`/`datawarehouse` pair over SQLAlchemy
  * (`DB_manager.py:10-35,107-136`); this is the Spark-native mapping for
  * deployments that keep a relational warehouse. Connection settings come
  * from caller-supplied properties (the reference reads `config.ini`
  * `[DB]`; SURVEY §2.11 — secrets never in code).
  *
  * NOTE: exercised only at compile level here — the build environment is
  * zero-egress with no database; the parquet-backed [[Scd0]]/[[Catalog]]
  * path is the tested equivalent of the same semantics.
  */
object Jdbc {

  final case class Conn(url: String, user: String, password: String,
      driver: String = "org.postgresql.Driver") {
    def props: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p.setProperty("driver", driver)
      p
    }
  }

  /** Stage load = TRUNCATE + append (`save_to_stage`,
    * `DB_manager.py:107-136`): overwrite with `truncate=true` keeps the
    * DDL (and its types) in place, exactly like the reference's explicit
    * TRUNCATE before `to_sql(append)`. `batchsize` bounds round trips;
    * `numPartitions` bounds concurrent connections. */
  def stageLoad(df: DataFrame, conn: Conn, table: String,
      numPartitions: Int = 8, batchSize: Int = 10000): Unit =
    df.coalesce(numPartitions)
      .write.mode(SaveMode.Overwrite)
      .option("truncate", true)
      .option("batchsize", batchSize)
      .jdbc(conn.url, table, conn.props)

  /** Warehouse read for the merge's existing-keys side. Only the key
    * column is selected — predicate/column pushdown happens in the
    * database. */
  def readKeys(spark: SparkSession, conn: Conn, table: String,
      key: String): DataFrame =
    spark.read.jdbc(conn.url, s"(SELECT $key FROM $table) t", conn.props)

  /** SCD-0 merge into a JDBC warehouse: anti-join locally, append only the
    * new rows (`commit_to_warehouse`, `DB_manager.py:140-179`). */
  def mergeAppend(stage: DataFrame, conn: Conn, table: String,
      key: String): Unit = {
    val existing = readKeys(stage.sparkSession, conn, table, key)
    Scd0.newRows(stage, existing, key)
      .write.mode(SaveMode.Append)
      .jdbc(conn.url, table, conn.props)
  }
}
