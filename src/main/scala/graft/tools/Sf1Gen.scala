package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Synthesizes an sf1-scale corpus (10× sf0.1) at /tmp/graft_sf1 by
  * key-shifted replication — the honest way to scale the driver corpus
  * for perf sweeps (dev tool; the correctness gate stays on the driver's
  * own sf dirs):
  *
  *  - relational tables replicate with disjoint key ranges per copy, so
  *    join fan-outs and group counts scale linearly (like adding TPC-H
  *    segments); region/nation stay fixed (dimensions don't scale);
  *  - `documents` suffixes every token with the copy tag, giving each
  *    copy a disjoint token/shingle space: dedup workloads scale
  *    linearly instead of every doc gaining 9 cross-copy near-dups
  *    (n_chars is recomputed so quality math stays consistent);
  *  - `embeddings` applies a per-copy deterministic sign-flip vector:
  *    intra-copy dot products (and thus all within-copy similarity
  *    structure) are preserved EXACTLY, while cross-copy cosines drop to
  *    ~N(0, 1/64-ish) noise below the near-dup thresholds.
  *
  * Run: `sbt "runMain graft.tools.Sf1Gen [outDir] [copies]"`.
  */
object Sf1Gen {

  val DefaultOut = "/tmp/graft_sf1"

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(DefaultOut)
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-sf1-gen", 32)
    generate(spark, "/root/testdata/sf0.1", out, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    // this tool rewrites dirs a session may later read through the
    // Tables memo — drop any stale cached listings up front
    graft.core.Tables.invalidate(spark)
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      println(s"[sf1gen] wrote $t")
    }
    def repl(t: String)(shift: (DataFrame, Int) => DataFrame): Unit =
      write((0 until copies).map(i => shift(read(t), i)).reduce(_ unionByName _)
        .repartition(32), t)

    // fixed dimensions
    write(read("region"), "region")
    write(read("nation"), "nation")

    val C = 10000000L   // customer key stride
    val S = 1000000L    // supplier key stride
    val P = 100000000L  // part key stride
    val O = 1000000000L // order key stride
    val U = 10000000L   // user id stride
    val E = 1000000000L // event id stride
    val D = 10000000L   // doc id stride

    repl("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * C)) }
    repl("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * S)) }
    repl("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * P)) }
    repl("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * O))
        .withColumn("o_custkey", col("o_custkey") + lit(i * C)) }
    repl("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
        .withColumn("l_partkey", col("l_partkey") + lit(i * P))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * S)) }
    repl("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * E))
        .withColumn("user_id", col("user_id") + lit(i * U)) }
    repl("documents") { (df, i) =>
      val tagged = df
        .withColumn("doc_id", col("doc_id") + lit(i * D))
        .withColumn("text",
          if (i == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", s"$$1_c$i"))
      tagged.withColumn("n_chars", length(col("text")).cast(
        df.schema("n_chars").dataType)) }
    repl("embeddings") { (df, i) =>
      if (i == 0) df
      else {
        // per-copy ±1 sign vector from a REAL hash of (copy, dim): an
        // exact orthogonal transform within the copy, decorrelating
        // across copies. A multiplicative-xor parity here degenerates —
        // odd multipliers preserve parity, so all even copies would share
        // ONE sign vector and gain exact cross-copy duplicates (caught in
        // round-8 review; it silently corrupted the first sf1 sweep's
        // embedding numbers with cosine-1.0 cross-copy pairs).
        val signs = (0 until 64).map(d =>
          if ((scala.util.hashing.MurmurHash3.productHash((i, d)) & 1) == 0)
            1.0f else -1.0f)
        val signsCol = typedLit(signs)
        df.withColumn("vec_id", col("vec_id") + lit(i * D))
          .withColumn("embedding",
            zip_with(col("embedding"), signsCol, (v, sg) => (v * sg).cast("float")))
      } }
  }
}
