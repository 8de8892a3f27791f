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
  /** 1-minute load average — recorded at start and end of the run so a
    * drifted ratio is ATTRIBUTABLE: this box shows ±15% run-to-run
    * variance under evening co-load (r12 measured 1.08–1.39 on identical
    * code), and without the load field in the artifact a future
    * regression can't be told apart from a busy box. */
  private def load1(): Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val loadStart = load1()
    val spark = GraftSession.tunedLocal("graft-bench", sfDir, cpus)

    // SPARK_GRAFT_ONLY: comma-separated gate names — builder-side subset
    // timing (before/after on one gate); the driver's env-free run
    // benches everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val headline = Registry.all.filter(_.bench)
      .filter(g => only.forall(_.contains(g.name)))
    // noop sink: full materialization of every output row — a bare count()
    // would let Catalyst prune the projections being measured
    def run(g: graft.queries.Gated, dir: String): Unit =
      g.df(spark, dir).write.mode("overwrite").format("noop").save()
    // warm-up: one discarded pass on the TARGET sf — primes JIT, codegen
    // cache, parquet footer cache, and one-time artifacts (q35's trained
    // IVF centroids), so timed passes measure steady-state serving, not
    // first-touch setup
    headline.foreach { g =>
      try run(g, sfDir) catch { case _: Throwable => () }
    }
    // five timed passes, report per-query MEDIAN: steady-state execution
    // time robust to TWO load spikes (this box shows ±15% run-to-run
    // variance; with 3 passes a query hit twice reported the spike —
    // r6's q18 "regression" was exactly that. Median-of-5 = 3rd smallest,
    // immune to a two-pass burst, and still an honest central estimate —
    // unlike min, it never reports a lucky outlier).
    // A query that throws is recorded as an error and EXCLUDED from the
    // total — it must never bench as ~0s and silently inflate the round.
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
    // otherwise hand their cache from one pass to the next via canonical-
    // plan matching — the median would then time cache hits, not the query
    val passes = (1 to 5).map { _ =>
      headline.map { g =>
        // leftover persisted intermediates from the PREVIOUS query (q47's
        // curation barriers, q57's history generations, q65's decode
        // cache) otherwise stack up across the pass and tax later queries
        // with eviction churn — measured 2x inflation on mid-pass queries
        spark.catalog.clearCache()
        g.name -> timeOnce(g)
      }.toMap
    }
    val results = headline.map { g =>
      val runs = passes.map(_(g.name))
      val times = runs.collect { case Right(v) => v }.sorted
      // lower median: with an even count of surviving passes (one pass
      // errored), length/2 would pick the MAX of the two middle-less
      // samples and bias the query upward
      g.name -> (if (times.isEmpty) runs.head
                 else Right(times((times.length - 1) / 2)))
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
    // self-report the oracle comparison when tools/oracle_bench.py has
    // produced the DuckDB side for THIS corpus (same parquet, same SQL):
    // the bench line then carries the gate ratio directly instead of
    // requiring a cross-reference against scaling notes.
    // SUBSET HONESTY: an SPARK_GRAFT_ONLY run times a slice of the
    // registry, so its sum is NOT the headline total and a ratio against
    // the FULL-registry oracle total would be fiction — the subset line
    // carries an explicit "only" field, nulls "value", and suppresses the
    // oracle fields entirely, so it can never be mistaken for (or graded
    // as) a full-registry measurement. Per-query times stay: they are the
    // actual payload of a subset run (before/after and growth diffs).
    val oracleFields = if (only.isDefined) "" else {
      val path = sys.env.getOrElse("SPARK_GRAFT_ORACLE_JSON", "ORACLE_BENCH.json")
      try {
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
        val sfRe = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r
        val totRe = "\"total_s\"\\s*:\\s*([0-9.eE+-]+)".r
        (sfRe.findFirstMatchIn(text).map(_.group(1)),
         totRe.findFirstMatchIn(text).map(_.group(1).toDouble)) match {
          case (Some(sf), Some(t))
              if new java.io.File(sf).getName == new java.io.File(sfDir).getName && t > 0 =>
            f""","oracle_total_s":$t%s,"ratio":${total / t}%.4f"""
          case _ => ""
        }
      } catch { case _: java.io.IOException => "" }
    }
    val loadFields =
      f""","load1_start":$loadStart%.2f,"load1_end":${load1()}%.2f"""
    val onlyFields = only.fold("") { names =>
      s""","only":${jstr(names.toSeq.sorted.mkString(","))},"subset_sum":$total"""
    }
    val totalField = if (only.isDefined) "null" else total.toString
    println(s"""{"metric":"total","value":$totalField,"unit":"sec","queries":$qs,"errors":$errs$oracleFields$loadFields$onlyFields,"sf":"$sfDir"}""")
    if (results.exists(_._2.isLeft)) System.err.println(
      "BENCH ERRORS: " + results.collect { case (k, Left(e)) => s"$k -> $e" }.mkString("; "))
    spark.stop()
  }
}
