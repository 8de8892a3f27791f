package graft.tools

import java.nio.file.{Files, Paths}

import graft.core.GraftSession
import graft.queries.Registry

/** Dump `.explain("formatted")` for named gates (or all bench gates) to
  * one file each — the plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.tools.PlanDump \
  *     <outDir> [suffix] [gate ...]
  *
  * Writes `<outDir>/<gate>_<suffix>.txt` (suffix defaults to "plan").
  * The dump is the ANALYZED-to-physical explain of the exact DataFrame
  * the bench times, under the same tunedLocal session conf.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = args.drop(1).headOption.getOrElse("plan")
    val names = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.tunedLocal("graft-plandump", sfDir, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val gates = Registry.all.filter(g => names.isEmpty || names.contains(g.name))
    gates.foreach { g =>
      try {
        val df = g.df(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${g.name}_$suffix.txt"), txt)
        println(s"[plandump] ${g.name} -> $outDir/${g.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${g.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
