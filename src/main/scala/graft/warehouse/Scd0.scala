package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Two-tier warehouse (reference `DB_manager.py` + `main.py:40-46`):
  * `stage` = truncate-and-load full refresh, `datawarehouse` = append-only
  * with an SCD type-0 merge — insert only keys not already present
  * ("datos estaticos", `DB_manager.py:139`), which is what makes replays
  * idempotent and turns the at-least-once extractor into effectively-once.
  */
object Scd0 {

  /** The merge kernel (`DB_manager.py:142-177`): `stage LEFT JOIN wh ON pk
    * WHERE wh.pk IS NULL` ≡ left_anti. In-batch duplicates are collapsed to
    * the first row per key — the reference delegates that to the Postgres
    * PK; we enforce it behaviorally (SURVEY §1.2). Catalyst picks
    * broadcast-anti when the key side is small, sort-merge-anti otherwise;
    * at 100 TB only (key) columns cross the exchange, never full rows. */
  def newRows(stage: DataFrame, warehouse: DataFrame, key: String): DataFrame =
    stage.dropDuplicates(key)
      .join(warehouse.select(key), Seq(key), "left_anti")

  /** Merge + append in one call; returns number of inserted rows. */
  def mergeAppend(stage: DataFrame, warehousePath: String, key: String): Long = {
    val spark = stage.sparkSession
    val existing = existingOrEmpty(spark, warehousePath, stage)
    val delta = newRows(stage, existing, key)
    // one pass: count and write (cache the narrow delta, not the inputs)
    delta.cache()
    try {
      val n = delta.count()
      if (n > 0)
        delta.write.mode(SaveMode.Append).parquet(warehousePath)
      n
    } finally { delta.unpersist(): Unit }
  }

  /** Stage load = full refresh (`DB_manager.py:107-136`: TRUNCATE + append
    * ≡ overwrite). */
  def stageLoad(df: DataFrame, stagePath: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(stagePath)

  private def existingOrEmpty(spark: SparkSession, path: String, like: DataFrame): DataFrame =
    if (graft.core.Fs.exists(spark, path))
      spark.read.parquet(path)
    else like.filter(lit(false))
}
