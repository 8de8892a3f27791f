package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregation helpers.
  *
  * Floating-point sums depend on accumulation order, which differs between
  * Spark's partial/final aggregation and a single-node oracle (DuckDB). The
  * driver's correctness gate hash-compares values, so "equal up to 1 ulp" is
  * not equal. The corpus monetary columns carry exactly 2 decimal digits
  * (verified from the parquet data), so we sum in exact `DECIMAL` space and
  * cast the final result to `DOUBLE` — a single exact conversion both engines
  * perform identically. The matching oracle-SQL idioms live in
  * [[graft.queries.Registry]].
  */
object Det {

  private val D = DecimalType(18, 4)

  /** Exact decimal sum of a ≤4-decimal-digit double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact decimal sum of a product of two ≤4-digit columns, as double. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(D) * b.cast(D)).cast("double")

  /** Deterministic mean: exact decimal sum, then one double division. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))
}
