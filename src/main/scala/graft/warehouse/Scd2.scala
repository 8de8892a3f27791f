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
    *
    * ONE full-outer join on the key decides every branch; each joined row
    * then emits 0-2 history rows (kept/closed open row, new version) via a
    * single explode. The open history and the batch each shuffle exactly
    * once — the earlier formulation re-joined the same two frames five
    * times (changed/new/still-open/closed/new-version), i.e. 5× the
    * shuffle reads of the open set at 100 TB for identical semantics.
    */
  def merge(history: DataFrame, updates: DataFrame, key: String,
      effectiveDate: String): DataFrame = {
    val cols = history.columns.toSeq
    val payload = updates.columns.filter(_ != key).toSeq
    val open = history.filter(col("is_current"))
    val closed = history.filter(!col("is_current"))

    // value fingerprint over payload columns (null-safe, order-fixed)
    def fp(df: DataFrame) = md5(to_json(struct(payload.sorted.map(col): _*)))

    val o = open.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__o"), fp(open).as("__ofp"))
    val u = updates.select(col(key).as("__k"),
      struct(updates.columns.map(col): _*).as("__u"), fp(updates).as("__ufp"))

    val unchanged = col("__ofp") === col("__ufp")
    // emitted rows, all in the history schema/column order
    val keepOpen = col("__o")
    val closeOpen = struct(cols.map {
      case "valid_to" => lit(effectiveDate).as("valid_to")
      case "is_current" => lit(false).as("is_current")
      case c => col(s"__o.`$c`").as(c)
    }: _*)
    val newVersion = struct(cols.map {
      case "valid_from" => lit(effectiveDate).as("valid_from")
      case "valid_to" => lit(null).cast("string").as("valid_to")
      case "is_current" => lit(true).as("is_current")
      case c => col(s"__u.`$c`").as(c)
    }: _*)

    val merged = o.join(u, Seq("__k"), "full_outer")
      .select(explode(array(
        when(col("__u").isNull || unchanged, keepOpen), // open row survives
        when(col("__o").isNotNull && col("__u").isNotNull && !unchanged, closeOpen),
        when(col("__o").isNull || (col("__u").isNotNull && !unchanged), newVersion)
      )).as("__row"))
      .filter(col("__row").isNotNull)
      .select(cols.map(c => col(s"__row.`$c`").as(c)): _*)

    closed.unionByName(merged)
  }

  /** Point-in-time view: the version of each key valid on `date`. */
  def asOf(history: DataFrame, date: String): DataFrame =
    history.filter(col("valid_from") <= date &&
      (col("valid_to").isNull || col("valid_to") > date))
}
