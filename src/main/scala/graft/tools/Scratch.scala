package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    import graft.core.Tables

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      noop(df) // warm
      val t0 = System.nanoTime(); noop(df)
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("q29 three-aggs")(graft.queries.Stats.q29DistinctAgg(spark, dir))
    time("q29 expand") {
      val l = Tables.lineitem(spark, dir)
      l.groupBy(col("l_suppkey")).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
        .orderBy(col("l_suppkey"))
    }
    time("q29 two-level") {
      val l = Tables.lineitem(spark, dir)
      // one shuffle on (suppkey): partial distinct via sets? approximate...
      // two-level exact: groupBy(supp, part) then count — for n_parts only
      val p = l.groupBy(col("l_suppkey"), col("l_partkey")).agg(count(lit(1)).as("c"))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"), sum(col("c")).as("ni1"))
      val o = l.groupBy(col("l_suppkey"), col("l_orderkey")).agg(count(lit(1)).as("c"))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_orders"), sum(col("c")).as("ni2"))
      p.join(o, "l_suppkey")
        .select(col("l_suppkey"), col("n_parts"), col("n_orders"), col("ni1").as("n_items"))
        .orderBy(col("l_suppkey"))
    }
    spark.stop()
  }
}
