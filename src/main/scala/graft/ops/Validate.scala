package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-quality validation: schema conformance on read (the engine declares
  * schemas up front — SURVEY §1.2 — so drift must be caught, not
  * inferred-around) and row-level expectations evaluated in ONE pass
  * (conditional sums, no per-rule scans).
  */
object Validate {

  final case class Rule(name: String, predicate: Column)

  /** Throws if `df`'s columns/types don't cover the declared schema
    * (extra columns allowed — projection prunes them; missing or
    * type-mismatched ones are structural failures). */
  def requireSchema(df: DataFrame, expected: StructType): DataFrame = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val problems = expected.flatMap { f =>
      actual.get(f.name) match {
        case None => Some(s"missing column ${f.name}")
        case Some(dt) if dt != f.dataType =>
          Some(s"${f.name}: expected ${f.dataType.simpleString}, got ${dt.simpleString}")
        case _ => None
      }
    }
    require(problems.isEmpty, s"schema mismatch: ${problems.mkString("; ")}")
    df
  }

  /** Violation counts for all rules in a single aggregation pass:
    * one row, one column per rule (count of rows FAILING it). */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      rules.map(r =>
        sum(when(!coalesce(r.predicate, lit(false)), 1L).otherwise(0L))
          .as(r.name)): _*)

  /** Common expectation builders. */
  def notNull(c: String): Rule = Rule(s"${c}_not_null", col(c).isNotNull)
  def unique(df: DataFrame, c: String): Boolean =
    df.groupBy(col(c)).count().filter(col("count") > 1).isEmpty
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"${c}_in_range", col(c).between(lo, hi))
  def matches(c: String, regex: String): Rule =
    Rule(s"${c}_format", col(c).rlike(regex))
}
