package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gated query: a Spark (DataFrame-API) implementation plus, when
  * the semantics are ANSI-SQL-expressible, an equivalent oracle SQL the
  * driver runs in DuckDB over the same parquet tables. Column names/types and
  * row order must match exactly between the two (the gate hash-compares).
  */
final case class Gated(
    name: String,
    df: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the Bench headline set (sf0.1)? */
    bench: Boolean = true)
