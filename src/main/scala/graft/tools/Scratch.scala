package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.Dedup

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here.
  *
  * Current contents: the q74 hash-family disagreement profile — per
  * source, how many ≥0.5 candidate pairs each family finds, how many
  * disagree, and the found-family estimate of every disagreeing pair —
  * the evidence behind the q74 tolerance band. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    for (dir <- args.toSeq match {
        case Nil => Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
        case ds => ds
      }) {
      val docs = Tables.spread(Tables.documents(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val md5P = Dedup.minhashCandidates(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("est_jaccard").as("est_m"))
      val fastP = Dedup.minhashCandidatesFast(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("est_jaccard").as("est_f"))
      val sym = md5P.join(fastP, Seq("id_a", "id_b"), "full_outer")
      val src = docs.select(col("doc_id").as("id_a"), col("source"))
      val prof = sym.join(src, Seq("id_a"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_union"),
          sum(when(col("est_m").isNotNull, 1L).otherwise(0L)).as("n_md5"),
          sum(when(col("est_m").isNull || col("est_f").isNull, 1L).otherwise(0L))
            .as("n_disagree"),
          sum(when((col("est_m").isNull || col("est_f").isNull) &&
            coalesce(col("est_m"), col("est_f")) > 0.626, 1L).otherwise(0L))
            .as("n_disagree_high"))
        .orderBy(col("source"))
      prof.collect().foreach { r =>
        println(s"SCRATCH $dir q74 ${r.getString(0)} union=${r.getLong(1)} " +
          s"md5=${r.getLong(2)} disagree=${r.getLong(3)} " +
          s"disagreeHigh=${r.getLong(4)}")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
