package graft

import graft.core.GraftSession
import graft.queries.Registry

/** Dev tool: executes every gated query at a small scale factor and prints
  * physical-plan statistics (exchanges, join strategies, scan pushdown) so
  * plan regressions are visible at a glance. Not part of the driver
  * contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-plan-audit", 8)
    Registry.all.foreach { g =>
      try {
        val df = g.df(spark, sf)
        df.write.mode("overwrite").format("noop").save()
        val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(plan).size
        println(f"${g.name}%-22s exch=${n("Exchange hashpartitioning")}%d " +
          f"bhj=${n("BroadcastHashJoin")}%d smj=${n("SortMergeJoin")}%d " +
          f"bnlj=${n("BroadcastNestedLoopJoin")}%d " +
          f"pushed=${if (plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")) "y" else "-"}%s " +
          f"aqe=${if (plan.contains("AdaptiveSparkPlan")) "y" else "-"}%s")
      } catch {
        case e: Throwable => println(s"${g.name}  FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
