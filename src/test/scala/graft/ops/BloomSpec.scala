package graft.ops

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val corpus =
    (1L to 500L).map(i => (i, s"k${i % 120}")).toDF("cid", "key")
  private val batch =
    (1L to 40L).map(i => (i, s"k${i * 7 % 200}")).toDF("bid", "key")

  test("prunedAntiJoin: identical to the plain anti-join") {
    val plain = batch.join(corpus.select("key"), Seq("key"), "left_anti")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val pruned = Bloom.prunedAntiJoin(batch, corpus, "key",
        expectedItems = 40, fpp = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(pruned === plain)
    assert(plain.nonEmpty, "fixture must exercise both kept and dropped rows")
    assert(plain.size < batch.count(), "some batch keys must hit the corpus")
  }

  test("no false negatives: pruned corpus keeps every batch-shared key") {
    val sharedKeys = corpus.select("key").intersect(batch.select("key"))
      .collect().map(_.getString(0)).toSet
    val prunedKeys = corpus.filter(Bloom.mightContainKey(
        batch, "key", org.apache.spark.sql.functions.col("key"), 40, 0.01))
      .select("key").collect().map(_.getString(0)).toSet
    assert(sharedKeys.subsetOf(prunedKeys))
  }

  test("the probe rides the corpus scan as a might_contain predicate") {
    // a parquet-backed corpus: on a LocalRelation the optimizer folds the
    // literal-bloom filter away entirely (ConvertToLocalRelation), which
    // is correct but leaves no plan to assert on. Against a file source
    // the predicate must appear ON the scan's Filter — pre-shuffle, not
    // as a join
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    corpus.write.mode("overwrite").parquet(dir)
    val fileCorpus = spark.read.parquet(dir)
    val pruned = Bloom.prunedAntiJoin(batch, fileCorpus, "key", 40, 0.01)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // the filter bytes are a LITERAL baked in at build time (ADVICE r10):
    // no scalar subquery, so no execution-time re-read of the sizing confs
    assert(!plan.toLowerCase.contains("subquery"),
      "bloom must embed as a literal, not a subquery\n" + plan.take(2000))
  }

  test("optimalNumBits: standard sizing, guards") {
    // 1M items at 1% -> ~9.6 bits/item
    val bits = Bloom.optimalNumBits(1000000L, 0.01)
    assert(bits > 9000000L && bits < 10000000L, bits.toString)
    intercept[IllegalArgumentException] { Bloom.optimalNumBits(0, 0.01) }
    intercept[IllegalArgumentException] { Bloom.optimalNumBits(10, 1.5) }
  }
}
