package graft.tools

import graft.core.GraftSession
import graft.queries.Registry

/** Per-query scaling sweep (dev tool): runs every gated query against an
  * arbitrary corpus dir (e.g. the [[Sf1Gen]] output) with one warm-up and
  * two timed passes, printing `SWEEP <name> <min-of-2> s` lines — min is
  * the deliberate estimator here: scaling comparisons want each query's
  * noise floor, not its load luck (Bench uses median-of-3 for the graded
  * number; don't mix the two across tools). Diffing a sweep at sf0.1
  * against one at sf1 gives the per-query scaling factors — the evidence
  * behind the 100 TB design claims in the operator scaladocs.
  *
  * Run: `sbt "runMain graft.tools.ScaleSweep [dir]"`.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(Sf1Gen.DefaultOut)
    // optional 2nd arg: comma-separated gate names to sweep (default all)
    val only = args.drop(1).headOption.map(_.split(',').toSet)
    val spark = GraftSession.local("graft-scale-sweep", 32)
    Registry.all.filter(g => only.forall(_.contains(g.name))).foreach { g =>
      try {
        def run(): Double = {
          val t0 = System.nanoTime()
          g.df(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        run() // warm (also builds per-dir artifacts: IVF centroids, q68 index)
        spark.catalog.clearCache()
        val a = run()
        spark.catalog.clearCache()
        val b = run()
        println(f"SWEEP ${g.name}%-26s ${math.min(a, b)}%8.3f s")
      } catch {
        case e: Throwable =>
          println(s"SWEEP ${g.name}  FAILED ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120))
      }
    }
    spark.stop()
  }
}
