package graft.tools

import graft.core.GraftSession
import graft.queries.Registry

/** Subset correctness probe (dev tool): run ONLY the named gates and
  * write their parquet + oracle SQL in the same layout `graft.Verify`
  * uses, so `tools/check.py <sf> <out> --skip-verify` can diff just
  * those against DuckDB — seconds instead of the full-registry minutes
  * when iterating on a new gate.
  *
  * Run: `sbt "runMain graft.tools.GateProbe <sfDir> <outDir> q215_pagerank,q216_distinct_n"`
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GateProbe <sfDir> <outDir> <names,csv>")
    val Array(sfDir, outDir, csv) = args
    val names = csv.split(',').toSet
    val gates = Registry.all.filter(g => names.contains(g.name))
    require(gates.size == names.size,
      s"unknown gates: ${names -- gates.map(_.name).toSet}")
    val spark = GraftSession.local("graft-gate-probe", 32)
    gates.foreach { g =>
      g.df(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/${g.name}")
      println(s"PROBE wrote ${g.name}")
    }
    val sql = gates.flatMap(g => g.oracle.map(o => g.name -> o)).toMap
    val json = sql.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper
        .builder().build().writeValueAsString(v)
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
