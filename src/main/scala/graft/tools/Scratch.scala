package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ops._

/** Ad-hoc stage profiler / dump tool (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 8)
    val dir = "/root/testdata/sf0.01"
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // seed order (first 16 by md5 ordering)
    v.orderBy(TrainingMix.hex8(concat(col("id").cast("string"), lit("#ivf"))), col("id"))
      .limit(16).select(col("id"))
      .write.mode("overwrite").parquet("/tmp/ivf_seed_ids")
    val cents = Similarity.trainCentroids(v, 16, 2, "sample")
    cents.select(col("cid"), col("cvec").cast("array<double>"))
      .write.mode("overwrite").parquet("/tmp/ivf_cents")
    val q = v.filter(col("id") < 3).select(col("id").as("qid"), col("vec").as("qvec"))
    Similarity.ivfTopK(v, q, 10, cents, nprobe = 4)
      .withColumnRenamed("id", "neighbor_id")
      .orderBy(col("qid"), col("rank"))
      .write.mode("overwrite").parquet("/tmp/ivf_q35")
    spark.stop()
  }
}
