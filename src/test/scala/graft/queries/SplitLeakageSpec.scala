package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.ops.{Dedup, TrainingMix}

/** q249 semantics the hash gate certifies only in aggregate: the
  * cross-split rows really carry the zero-near-dup invariant, and the
  * audit has POWER — a deliberately leaky split (doc-keyed instead of
  * group-keyed) must light up the same counter. An audit that cannot
  * detect the failure it exists for is decoration.
  */
class SplitLeakageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val fracs =
    Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)

  test("group-keyed split: every cross-split row reports zero near-dup " +
      "pairs; diagonals carry all candidate pairs") {
    val rows = MixQueries.q249SplitLeakage(spark, sf).collect()
    assert(rows.length === 6) // 3 splits -> 3 diagonal + 3 cross rows
    val cross = rows.filter(_.getAs[Boolean]("is_cross"))
    assert(cross.length === 3)
    assert(cross.forall(_.getAs[Long]("n_neardup_pairs") === 0L),
      cross.mkString("; "))
    val total = rows.map(_.getAs[Long]("n_neardup_pairs")).sum
    val expected = Dedup.minhashCandidates(
        Tables.documents(spark, sf), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5).count()
    assert(total === expected, "diagonal rows must account for every pair")
  }

  test("audit power: a doc-keyed (leaky) split of the same corpus " +
      "produces cross-split near-dup pairs the audit counts") {
    val d = Tables.documents(spark, sf)
    val labeled = TrainingMix.assignSplits(
        d.select(col("doc_id")), "doc_id", fracs)
      .select(col("doc_id"), col("split"))
    val cand = Dedup.minhashCandidates(d, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5).select(col("id_a"), col("id_b"))
    val crossPairs = cand
      .join(labeled.select(col("doc_id").as("id_a"), col("split").as("sa")),
        Seq("id_a"))
      .join(labeled.select(col("doc_id").as("id_b"), col("split").as("sb")),
        Seq("id_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(crossPairs > 0L,
      "the control corpus must exhibit leakage under a doc-keyed split " +
        "for the zero-invariant test above to mean anything")
  }
}
