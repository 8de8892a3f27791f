package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

class GraftExtensionsSpec extends AnyFunSuite {

  test("dot_f is callable from SQL via session extensions") {
    // fresh session name; getOrCreate would reuse the suite session without
    // extensions, so register on the active one directly too
    val spark = GraftSession.local("graft-ext-test", 2)
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(r === 11.0)
  }

  test("text kernels are callable from SQL via temp-function registration") {
    val spark = GraftSession.local("graft-ext-test", 2)
    graft.functions.TextFunctions.register(spark)
    val mh = spark.sql(
      "SELECT min_hash_slices('a b c d e', 3, 8) AS s").collect().head.getSeq[String](0)
    assert(mh.length === 8 && mh.forall(_.length == 8))
    val sh = spark.sql("SELECT simhash_md5('a b c', 60) AS s").collect().head.getLong(0)
    assert(sh >= 0L)
    val rep = spark.sql(
      "SELECT repetition_stats('a b a b a').max_run AS r").collect().head.getLong(0)
    assert(rep === 1L)
    // span_keys: n - span + 1 keys; the repeated window collides
    val sk = spark.sql(
      "SELECT span_keys(split('p q r s p q r', ' '), 3) AS k")
      .collect().head.getSeq[Long](0)
    assert(sk.length === 5 && sk(0) === sk(4))
    // top_token_freq: split(' ') semantics — empties count as tokens
    val tf = Seq("a b a b a", "x", "", "a  b", "t t t t").map(s =>
      spark.sql(s"SELECT top_token_freq('$s') AS f").collect().head.getLong(0))
    assert(tf === Seq(3L, 1L, 1L, 1L, 4L))
    // 'a  b' splits to [a, '', b]: three distinct tokens, max multiplicity 1
  }

  test("bloom primitives are callable from SQL — compiled, no fallback") {
    val spark = GraftSession.local("graft-ext-test", 2)
    graft.ops.Bloom.registerSql(spark)
    spark.range(0, 100).createOrReplaceTempView("bloom_keys")
    // build over 0..99 via the aggregate kernel, then embed the filter as
    // a hex LITERAL — the foldable shape the surface requires (the
    // mightContainKey discipline, expressed in pure SQL)
    val bytes = spark.sql(
      "SELECT graft_bloom_agg(xxhash64(id), 100L, 960L) AS b FROM bloom_keys")
      .collect().head.getAs[Array[Byte]](0)
    val hex = bytes.map(b => f"$b%02X").mkString
    // PIN: with codegen fallback disabled, a Janino compile failure in the
    // probe projection THROWS instead of silently degrading to interpreted
    // mode — the no-silent-deoptimization guarantee for the SQL surface
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      // probe a member and a non-member: a bloom filter has no false
      // negatives, so the member MUST hit; the non-member check uses 50
      // distant probes and only requires one miss (fpp 3%)
      val hit = spark.sql(
        s"SELECT graft_bloom_contains(X'$hex', xxhash64(42L))")
        .collect().head.getBoolean(0)
      assert(hit, "member key must hit (no false negatives)")
      val misses = spark.sql(
        s"""SELECT count(*) FROM range(1000000, 1000050)
           |WHERE NOT graft_bloom_contains(X'$hex', xxhash64(id))""".stripMargin)
        .collect().head.getLong(0)
      assert(misses > 0, "at least one distant key must miss")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    // the scalar-subquery filter shape fails Janino inside Spark's
    // BloomFilterMightContain and would silently run interpreted — the
    // surface rejects it at analysis with a clear error instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH f AS (SELECT graft_bloom_agg(xxhash64(id), 100L, 960L) AS b
          |           FROM bloom_keys)
          |SELECT graft_bloom_contains((SELECT b FROM f), xxhash64(42L))""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("foldable"),
      s"expected the foldable-filter rejection, got: ${e.getMessage}")
    // the aggregate surface fails loudly when the requested size exceeds
    // the session clamps BloomFilterAggregate would silently apply at
    // execution (under-sizing the filter and degrading fpp toward 1)
    val clampItems = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bloom_agg(xxhash64(id), 100000000L, 960L) " +
        "FROM bloom_keys").collect()
    }
    assert(clampItems.getMessage.contains("maxNumItems"),
      s"expected the items clamp rejection, got: ${clampItems.getMessage}")
    val clampBits = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bloom_agg(xxhash64(id), 100L, 100000000000L) " +
        "FROM bloom_keys").collect()
    }
    assert(clampBits.getMessage.contains("maxNumBits"),
      s"expected the bits clamp rejection, got: ${clampBits.getMessage}")
  }

  test("extensions class registers all native function builders") {
    // getOrCreate would reuse the shared test session (extensions only
    // apply to fresh sessions), so exercise the injection hook directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val spark = GraftSession.local("graft-ext-test", 2)
    val expr = graft.functions.DotProductF(
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.dataType === org.apache.spark.sql.types.DoubleType)
    assert(spark.sessionState != null)
  }
}
