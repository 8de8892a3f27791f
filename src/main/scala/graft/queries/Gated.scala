package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gated query: a Spark (DataFrame-API) implementation plus, when
  * the semantics are ANSI-SQL-expressible, an equivalent oracle SQL the
  * driver runs in DuckDB over the same parquet tables. Column names/types
  * must match exactly; ROW ORDER does not — the compare sorts rows before
  * hashing (proven by the round-7 q10 canary, confirmed in tools/check.py),
  * so gates must NOT carry a terminal ORDER BY: it is a wasted
  * range-exchange + global sort per query. Sorts belong only where they are
  * semantic (top-k LIMIT, OFFSET/LIMIT pagination, window frames).
  */
final case class Gated(
    name: String,
    df: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the Bench set (sf0.1)? Currently every gate opts in —
      * the flag exists so a pathological future gate can be excluded
      * without restructuring the registry. */
    bench: Boolean = true)
