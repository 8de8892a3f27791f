package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    import org.apache.spark.sql.functions._
    import graft.core.{Det, Tables}
    val dir = "/root/testdata/sf0.1"
    def star(spreadFact: Boolean) = {
      val r = Tables.region(spark, dir); val n = Tables.nation(spark, dir)
      val c = Tables.customer(spark, dir); val o = Tables.orders(spark, dir)
      val l0 = Tables.lineitem(spark, dir)
      val l = if (spreadFact) Tables.spread(l0) else l0
      val dim = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(dim), o("o_custkey") === dim("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(Det.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(star(false)); run(star(true))
    (1 to 3).foreach { i =>
      val a = run(star(false)); val b = run(star(true))
      println(f"[scratch] q3 pass $i plain $a%.3f  spread $b%.3f")
    }
    spark.stop()
  }
}
