package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed warehouse tables: the co-located-join layout for 100 TB
  * (SURVEY §7.4 — "warehouse tables should bucket/sort by key").
  *
  * Writing both sides of a recurring join bucketed by the join key into the
  * same number of buckets lets Spark plan a sort-merge join with NO
  * exchange on either side — the single biggest shuffle eliminated at
  * scale (e.g., fact-to-fact joins, repeated merge keys). Verified by
  * `BucketingSpec` asserting an Exchange-free join plan.
  */
object Bucketing {

  /** Save as a bucketed+sorted managed table (idempotent overwrite). */
  def saveBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir

  /** Join two co-bucketed tables on their bucket key: shuffle-free. */
  def cojoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
