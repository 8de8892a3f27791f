package graft.tools

import graft.core.GraftSession
import graft.queries.Registry

/** Per-gate floor profiler (r17, verdict item 5): where do the ~0.1–0.3 s
  * that sub-second gates spend OVER their DuckDB oracle time actually go?
  * For each selected gate this main separates, per timed run:
  *
  *  - `build`   — the gate function itself (driver-side plan construction,
  *                plus any bounded-by-contract driver actions inside it)
  *  - `analyze` / `optimize` / `plan` — Catalyst phase wall times from
  *                `QueryPlanningTracker` on the noop-write execution
  *  - `exec`    — everything else under the action (codegen lookup, task
  *                scheduling, IO, compute)
  *  - `njobs`   — Spark jobs launched by the run (each job is a driver
  *                round-trip: DAG build, task serialization, scheduling)
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile q99_x q205_y"
  * No args = the 12 smallest-oracle-time gates named in VERDICT/SCALING.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.tunedLocal("graft-profile", sfDir, cpus)
    val names =
      if (args.nonEmpty) args.toSet
      else Set("q99_kll_quantiles", "q2_topk_revenue", "q11_setops",
        "q36_string_funcs", "q42_date_arith", "q9_date_funcs")
    val gates = Registry.all.filter(g => names.contains(g.name))
    if (gates.isEmpty) {
      System.err.println(s"no gates matched: ${names.mkString(",")}; " +
        s"registry has ${Registry.all.map(_.name).take(5).mkString(",")}...")
    }

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    gates.foreach { g =>
      // warm-up (codegen cache, parquet footers, JIT)
      (1 to 2).foreach { _ =>
        try g.df(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => System.err.println(s"${g.name}: $e") }
        spark.catalog.clearCache()
      }
      val reps = 3
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        jobs = 0
        val t0 = System.nanoTime()
        val df = g.df(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        // listener events are async; give the bus a beat before reading
        Thread.sleep(120)
        val phases = qe.tracker.phases.map { case (k, v) =>
          k -> (v.endTimeMs - v.startTimeMs)
        }
        val known = phases.values.sum
        println(f"PROFILE ${g.name}%-28s run$i build=${(t1 - t0) / 1e6}%7.1fms " +
          f"action=${(t2 - t1) / 1e6}%7.1fms " +
          s"phases=[${phases.map { case (k, v) => s"$k=${v}ms" }.mkString(" ")}] " +
          f"execRest=${(t2 - t1) / 1e6 - known}%7.1fms njobs=$jobs")
      }
    }
    spark.stop()
  }
}
