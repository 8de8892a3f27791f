package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    import org.apache.spark.sql.functions._
    // sf1-scale lineitem: sf0.1 replicated 10x with shifted suppkeys
    // (10x groups, same per-group size) and shifted order/part keys
    val out = "/tmp/graft_scale/lineitem_sf1"
    if (!new java.io.File(out + "/_SUCCESS").exists()) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select("l_suppkey", "l_partkey", "l_orderkey")
      val copies = (0 until 10).map { i =>
        li.select(
          (col("l_suppkey") + lit(i * 100000)).as("l_suppkey"),
          (col("l_partkey") + lit(i * 10000000)).as("l_partkey"),
          (col("l_orderkey") + lit(i * 100000000)).as("l_orderkey"))
      }
      copies.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(out)
    }
    val l = spark.read.parquet(out)
    def q29shape(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_suppkey")).agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
    q29shape(l).write.mode("overwrite").format("noop").save()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      q29shape(l).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] q29 sf1 spark ${ts.map(t => f"$t%.3f").mkString(" ")} s  rows=${l.count()}")
    spark.stop()
  }
}
