package graft

import graft.core.GraftSession
import graft.queries.Registry

/** Benchmark main: times the headline gated queries on
  * `SPARK_GRAFT_SF_DIR`, printing one JSON line the driver collects into
  * `BENCH_r{N}.json`. Each query is fully executed (count over the final
  * plan); a warm-up pass primes the JVM/codegen so the measured numbers
  * reflect steady-state execution, not JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-bench", cpus)

    val headline = Registry.all.filter(_.bench)
    // noop sink: full materialization of every output row — a bare count()
    // would let Catalyst prune the projections being measured
    def run(g: graft.queries.Gated, dir: String): Unit =
      g.df(spark, dir).write.mode("overwrite").format("noop").save()
    // warm-up: JIT + codegen cache + parquet footer cache, on the smallest sf
    headline.foreach { g =>
      try run(g, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    }
    // two timed passes, report per-query min: steady-state execution time
    // (single-pass numbers carry ±50% JIT/GC noise in one JVM). A query
    // that throws is recorded as an error and EXCLUDED from the total —
    // it must never bench as ~0s and silently inflate the round.
    def timeOnce(g: graft.queries.Gated): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        run(g, sfDir)
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    // queries that persist() intermediates (curation, SCD2 chains) would
    // otherwise hand their pass-1 cache to pass 2 via canonical-plan
    // matching — the min would then time a cache hit, not the query
    spark.catalog.clearCache()
    val pass1 = headline.map(g => g.name -> timeOnce(g)).toMap
    spark.catalog.clearCache()
    val results = headline.map { g =>
      g.name -> (for (a <- pass1(g.name); b <- timeOnce(g)) yield math.min(a, b))
    }
    // full JSON string escape — exception messages carry newlines, and a
    // control char would split the single machine-readable bench line
    def jstr(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.collect { case (k, Right(v)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(e)) => "\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (results.exists(_._2.isLeft)) System.err.println(
      "BENCH ERRORS: " + results.collect { case (k, Left(e)) => s"$k -> $e" }.mkString("; "))
    spark.stop()
  }
}
