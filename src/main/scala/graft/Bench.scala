package graft

import graft.core.GraftSession
import graft.queries.Registry

/** Benchmark main: times the headline gated queries on
  * `SPARK_GRAFT_SF_DIR`, printing one JSON line the driver collects into
  * `BENCH_r{N}.json`. Each query is fully executed (noop sink over the
  * final plan); a warm-up pass primes the JVM/codegen so the measured
  * numbers reflect steady-state execution, not JIT.
  *
  * Timeout-safety (r18 lesson — the driver bench DNF'd at rc=124 with
  * nothing parseable): the run now (a) rewrites `BENCH_partial.json`
  * atomically after EVERY query so even a SIGKILL leaves a parseable
  * cumulative artifact on disk, and (b) registers a shutdown hook that
  * prints the cumulative line (marked `"truncated":true`) to stdout when
  * the JVM dies before the final line — `timeout`'s SIGTERM therefore
  * still yields exactly one parseable JSON line in the driver's capture.
  * In normal completion only the final (untruncated) line ever reaches
  * stdout, so a driver parsing either the first or the last JSON line
  * gets the same, correct, artifact.
  *
  * Wall-time budget (same lesson): r17's warm-up + 5 fixed passes fit the
  * driver budget at 19:31; r18's +25% ambient load did not. Passes are
  * now QUERY-MAJOR and adaptive — 3 timed runs per query, extended to at
  * most 5 only while the observed spread (max/min − 1) exceeds 5% — which
  * cuts steady wall time by ~2 full registry passes while keeping the
  * median robust exactly where it needs to be (the noisy queries get the
  * extra passes; the 95% with tight spread don't pay for them). The
  * DuckDB oracle side (tools/oracle_bench.py) is min-of-3 query-major, so
  * a query-major median here is the conservative side of the comparison.
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

  /** full JSON string escape — exception messages carry newlines, and a
    * control char would split the single machine-readable bench line */
  private def jstr(s: String) = "\"" + s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Oracle pairing stamp (r18 verdict item 2): the committed
    * BENCH_quiet_r18.json carried ratio=1.0021 computed against an oracle
    * file that was later replaced (true committed-pairing ratio 1.326) —
    * a bare ratio is not self-consistent. The bench line now embeds the
    * oracle file's total AND its mtime + content hash, all read at emit
    * time, so any artifact's ratio can be re-verified against the exact
    * oracle bytes it was computed from, and a swapped oracle file is
    * detectable from the JSONs alone. */
  private def oracleStamp(sfDir: String, total: Double): String = {
    val path = sys.env.getOrElse("SPARK_GRAFT_ORACLE_JSON", "ORACLE_BENCH.json")
    try {
      val p = java.nio.file.Paths.get(path)
      val bytes = java.nio.file.Files.readAllBytes(p)
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val sfRe = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r
      val totRe = "\"total_s\"\\s*:\\s*([0-9.eE+-]+)".r
      (sfRe.findFirstMatchIn(text).map(_.group(1)),
       totRe.findFirstMatchIn(text).map(_.group(1).toDouble)) match {
        case (Some(sf), Some(t))
            if new java.io.File(sf).getName == new java.io.File(sfDir).getName && t > 0 =>
          val mtime = java.nio.file.Files.getLastModifiedTime(p).toMillis
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).take(8).map(b => f"$b%02x").mkString
          f""","oracle_total_s":$t%s,"oracle_file":${jstr(path)},""" +
            f""""oracle_mtime_ms":$mtime%d,"oracle_sha256_16":"$sha%s",""" +
            f""""ratio":${total / t}%.4f"""
        case _ => ""
      }
    } catch { case _: java.io.IOException => "" }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val loadStart = load1()
    val spark = GraftSession.tunedLocal("graft-bench", sfDir, cpus)
    // WARN spam (WindowExec single-partition notices on grid-sized
    // windows, locally-checkpointed-RDD unpersist notes) dominated the
    // r18 driver capture; the bench line is the artifact, not the log
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_ONLY: comma-separated gate names — builder-side subset
    // timing (before/after on one gate); the driver's env-free run
    // benches everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val headline = Registry.all.filter(_.bench)
      .filter(g => only.forall(_.contains(g.name)))

    // cumulative state for incremental emission; guarded by `lock` because
    // the shutdown hook reads it from another thread
    val lock = new Object
    val done = scala.collection.mutable.LinkedHashMap
      .empty[String, Either[String, Double]]
    @volatile var finalPrinted = false

    /** Serialize the cumulative state to one bench JSON line. */
    def renderLine(truncated: Boolean): String = {
      val snap = lock.synchronized { done.toVector }
      val qs = snap.collect { case (k, Right(v)) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val errs = snap.collect { case (k, Left(e)) => "\"" + k + "\":" + jstr(e) }
        .mkString("{", ",", "}")
      val total = snap.collect { case (_, Right(v)) => v }.sum
      // SUBSET HONESTY: an SPARK_GRAFT_ONLY run times a slice of the
      // registry, so its sum is NOT the headline total and a ratio against
      // the FULL-registry oracle total would be fiction — the subset line
      // carries an explicit "only" field, nulls "value", and suppresses
      // the oracle fields entirely. The same logic nulls the total of a
      // TRUNCATED full run: a partial sum is a subset sum, whatever cut it
      // short, and must never be graded as the headline number.
      val partial = only.isDefined || truncated
      val oracleFields = if (partial) "" else oracleStamp(sfDir, total)
      val loadFields =
        f""","load1_start":$loadStart%.2f,"load1_end":${load1()}%.2f"""
      val onlyFields = only.fold("") { names =>
        s""","only":${jstr(names.toSeq.sorted.mkString(","))}"""
      }
      val subsetField =
        if (partial) s""","subset_sum":$total,"n_timed":${snap.size},"n_headline":${headline.size}"""
        else ""
      val truncField = s""","truncated":$truncated"""
      val totalField = if (partial) "null" else total.toString
      s"""{"metric":"total","value":$totalField,"unit":"sec","queries":$qs,"errors":$errs$oracleFields$loadFields$onlyFields$subsetField$truncField,"sf":"$sfDir"}"""
    }

    /** Atomic rewrite of the on-disk partial after every query: even a
      * SIGKILL (timeout -k, OOM killer) leaves a parseable cumulative
      * artifact with an explicit truncated marker. Deleted on clean
      * completion — its presence IS the DNF signal. */
    val partialPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PARTIAL_JSON", "BENCH_partial.json"))
    def writePartial(): Unit =
      try {
        val tmp = java.nio.file.Files.createTempFile(
          partialPath.toAbsolutePath.getParent, ".bench", ".tmp")
        java.nio.file.Files.write(tmp,
          (renderLine(truncated = true) + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, partialPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      } catch { case _: java.io.IOException => () }

    // timeout(1) delivers SIGTERM → JVM shutdown hooks run → the driver's
    // capture still ends with one parseable (truncated) bench line
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // under `lock`: either the main thread already printed the final
      // line (flag set, hook is a no-op) or the hook prints the truncated
      // one — never zero lines, never two
      lock.synchronized {
        if (!finalPrinted) {
          println(renderLine(truncated = true))
          System.out.flush()
        }
      }
    }))

    // noop sink: full materialization of every output row — a bare count()
    // would let Catalyst prune the projections being measured
    def run(g: graft.queries.Gated, dir: String): Unit =
      g.df(spark, dir).write.mode("overwrite").format("noop").save()
    /** Drop EVERY block a previous run left in the executor store: the
      * catalog cache (persist) AND the localCheckpoint RDDs, which
      * `clearCache()` does not see — they only die when the ContextCleaner
      * gets around to their GC'd references. Measured (r19): under the
      * query-major pass order all 3 samples of the early-registry gates
      * landed in the post-warm-up window while ~256 gates' checkpoint
      * blocks still occupied unified memory, and the squeezed execution
      * side spilled — q8_rolling_mean timed 7.82 s in the full run vs
      * 0.88 s isolated (q9 1.68 vs 0.17, q12 1.26 vs 0.22). Explicit
      * blocking unpersist makes every sample start from the same empty
      * block store, which is what "cold-cache steady state" meant. */
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // warm-up: one discarded pass on the TARGET sf — primes JIT, codegen
    // cache, parquet footer cache, and one-time artifacts (q35's trained
    // IVF centroids), so timed passes measure steady-state serving, not
    // first-touch setup. Quiesce between gates: without it the block
    // store carries the whole registry's persists by the end of the pass.
    headline.foreach { g =>
      try run(g, sfDir) catch { case _: Throwable => () }
      quiesce()
    }

    def timeOnce(g: graft.queries.Gated): Either[String, Double] = {
      // leftover persisted intermediates (q47's curation barriers, q57's
      // history generations, q65's decode cache) would otherwise hand
      // their cache to the next run via canonical-plan matching — the
      // median must time cold-cache steady state, not cache hits
      quiesce()
      val t0 = System.nanoTime()
      try {
        run(g, sfDir)
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }

    // Adaptive per-query passes: 3 runs; while max/min − 1 > 5% and fewer
    // than 5 runs taken, add a run (a load spike shows up as spread, and
    // the extra runs recover the median the spike would otherwise bias).
    // Lower median on an even count: length/2 would pick the MAX of the
    // two middle samples and bias the query upward. A run that throws is
    // recorded as an error and EXCLUDED from the total — it must never
    // bench as ~0s and silently inflate the round.
    headline.foreach { g =>
      val runs = scala.collection.mutable.Buffer.empty[Either[String, Double]]
      while (runs.size < 3) runs += timeOnce(g)
      def spreadHigh: Boolean = {
        val ts = runs.collect { case Right(v) => v }
        ts.nonEmpty && ts.min > 0 && (ts.max / ts.min - 1.0) > 0.05
      }
      while (runs.size < 5 && (spreadHigh || runs.forall(_.isLeft)))
        runs += timeOnce(g)
      val times = runs.collect { case Right(v) => v }.sorted
      val med =
        if (times.isEmpty) runs.head
        else Right(times((times.length - 1) / 2))
      lock.synchronized { done(g.name) = med }
      writePartial()
    }

    val line = renderLine(truncated = false)
    lock.synchronized {
      finalPrinted = true
      println(line)
      System.out.flush()
    }
    try java.nio.file.Files.deleteIfExists(partialPath): Unit
    catch { case _: java.io.IOException => () }
    val errors = lock.synchronized {
      done.toVector.collect { case (k, Left(e)) => s"$k -> $e" } }
    if (errors.nonEmpty)
      System.err.println("BENCH ERRORS: " + errors.mkString("; "))
    spark.stop()
  }
}
