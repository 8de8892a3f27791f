package graft.functions

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("literature values (Winkler 1990 canon)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333) < 1e-9)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-9)
  }

  test("edge cases: identity, disjoint, empty, boost threshold") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    // DuckDB parity: empty-empty is 0 — verified LIVE against the oracle
    // build (DuckDB 1.0.0: jaro_winkler_similarity('','') = 0.0), not the
    // 1.0 some rapidfuzz-derived implementations return
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    // jaro exactly at/below 0.7 must NOT receive the prefix boost
    val j = jw("abcd", "abxy")      // jaro = 2/3, shared prefix 2
    assert(math.abs(j - 2.0 / 3.0) < 1e-9, s"boost leaked below threshold: $j")
  }

  test("symmetry and SQL registration") {
    val pairs = Seq(("martha", "marhta"), ("kitten", "sitting"),
      ("hello world", "world hello"))
    pairs.foreach { case (a, b) => assert(jw(a, b) === jw(b, a)) }
    TextFunctions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").head().getDouble(0)
    assert(math.abs(got - 0.9611111111) < 1e-9)
    // Column API path
    val viaCol = Seq(("dixon", "dicksonx")).toDF("a", "b")
      .select(TextFunctions.jaro_winkler(col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(viaCol - 0.8133333333) < 1e-9)
  }
}
