package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming document dedup driven synchronously: docs split across two
  * parquet files (two micro-batches), near-dups planted both inside one
  * batch and across batches — both must be dropped, distinct docs kept.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(13)
  // wide vocab: random docs must be far apart in SimHash space, so only
  // the planted reorderings collide
  private val vocab = Vector.tabulate(200)(i => s"w$i")
  private def doc(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 10:$min%02d:00")

  private def mkSource(): (String, Set[Long], Set[Long]) = {
    val base = (0 until 20).map(i => (i.toLong, ts(i), doc(40)))
    // near-dups by token REORDERING: SimHash is bag-of-tokens, so the
    // signature is bit-identical (hamming 0, same bucket — deterministic
    // drop) while the text differs (exact dedup must keep them)
    def reorder(t: String) = t.split(" ").reverse.mkString(" ")
    val inBatchDup = (100L, ts(21), reorder(base(0)._3))
    val crossBatchDup = (200L, ts(22), reorder(base(5)._3))
    val exactDup = (300L, ts(23), base(7)._3)
    assert(inBatchDup._3 != base(0)._3 && crossBatchDup._3 != base(5)._3)
    val dir = tmpDir("docs-src")
    // file 1: first 10 originals + the in-batch near-dup of doc 0
    (base.take(10) :+ inBatchDup).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // file 2: remaining originals + cross-batch near-dup + exact dup
    (base.drop(10) :+ crossBatchDup :+ exactDup).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val all = base.map(_._1).toSet
    (dir, all, Set(100L, 200L, 300L))
  }

  test("streaming near-dup dedup drops planted dups within and across batches") {
    val (dir, originals, dups) = mkSource()
    val q = DocStream.nearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("neardup").select("doc_id").as[Long].collect().toSet
    assert((dups -- kept) === dups, s"dups not dropped: ${dups intersect kept}")
    // every original is either kept or (rarely) a random near-collision;
    // all planted originals must survive at hamming > 3 from each other
    assert(originals.subsetOf(kept), s"originals dropped: ${originals -- kept}")
  }

  test("streaming exact dedup drops only identical content") {
    val (dir, originals, _) = mkSource()
    val q = DocStream.exactDeduped(DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("exactdedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("exactdedup").select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(300L)) // exact copy dropped
    assert(kept.contains(100L) && kept.contains(200L)) // near-dups differ -> kept
    assert(originals.subsetOf(kept))
  }
}
