package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 merge: versioned history with validity intervals — the
  * natural extension of the reference's type-0 ("datos estaticos",
  * `DB_manager.py:139`) for dimensions that DO change. Pure-function
  * formulation: takes the current history and a batch of updates, returns
  * the new history (caller persists; on plain parquet that is an overwrite
  * of the table — a transactional table format turns it into a row-level
  * MERGE, same semantics).
  *
  * History columns: payload + `valid_from` (date string), `valid_to`
  * (null = open), `is_current`.
  */
object Scd2 {

  /** Initialize history from a first snapshot. */
  def init(snapshot: DataFrame, effectiveDate: String): DataFrame =
    snapshot
      .withColumn("valid_from", lit(effectiveDate))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

  /** Merge a batch of updates effective at `effectiveDate`:
    *  - unchanged keys keep their open row;
    *  - changed keys close the open row (`valid_to = effectiveDate`) and
    *    gain a new open version;
    *  - brand-new keys gain their first open version;
    *  - a re-applied identical batch is a no-op (idempotent).
    */
  def merge(history: DataFrame, updates: DataFrame, key: String,
      effectiveDate: String): DataFrame = {
    val payload = updates.columns.filter(_ != key).toSeq
    val open = history.filter(col("is_current"))
    val closed = history.filter(!col("is_current"))

    // value fingerprint over payload columns (null-safe, order-fixed)
    def fp(df: DataFrame) = md5(to_json(struct(payload.sorted.map(col): _*)))

    val openFp = open.withColumn("__fp", fp(open))
    val updFp = updates.withColumn("__fp", fp(updates))

    val changedKeys = updFp.alias("u")
      .join(openFp.alias("o"), Seq(key))
      .filter(col("u.__fp") =!= col("o.__fp"))
      .select(col(key))
    val newKeys = updFp.join(openFp.select(key), Seq(key), "left_anti").select(col(key))

    val stillOpen = openFp.join(changedKeys, Seq(key), "left_anti").drop("__fp")
    val nowClosed = openFp.join(changedKeys, Seq(key)).drop("__fp")
      .withColumn("valid_to", lit(effectiveDate))
      .withColumn("is_current", lit(false))
    val newVersions = updFp
      .join(changedKeys.union(newKeys).distinct(), Seq(key))
      .drop("__fp")
      .withColumn("valid_from", lit(effectiveDate))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

    closed.unionByName(stillOpen).unionByName(nowClosed).unionByName(newVersions)
  }

  /** Point-in-time view: the version of each key valid on `date`. */
  def asOf(history: DataFrame, date: String): DataFrame =
    history.filter(col("valid_from") <= date &&
      (col("valid_to").isNull || col("valid_to") > date))
}
