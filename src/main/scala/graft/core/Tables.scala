package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated corpus (`TESTDATA.md`): one parquet file
  * per table under a scale-factor directory. Schemas are declared in
  * [[Schemas]]; reads stay schema-on-file (parquet footers are authoritative)
  * so Catalyst's vectorized reader + filter/column pushdown apply untouched.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, path): a DataFrame is an immutable analyzed
    * plan, and re-building it per query call pays the parquet footer
    * read + relation resolution every time — measured 60-300 ms per
    * gated query at sf0.1 (q3 touches five tables), a real slice of each
    * sub-second query. A catalog resolves a table once per session; this
    * map is the code-path equivalent. The outer map holds sessions
    * WEAKLY, so a stopped-and-collected session releases its cached
    * plans instead of pinning them (and itself) for the JVM's life.
    *
    * CONTRACT: a memoized relation pins the file listing from first
    * resolution — correct for the driver corpus (immutable per session);
    * a tool that rewrites a dir it already read must call
    * [[invalidate]] (Sf1Gen does). */
  // values hold the DataFrame WEAKLY: a cached plan strongly references
  // its session (Dataset -> SparkSession), so strong values would pin the
  // WeakHashMap key forever and the per-session eviction could never
  // fire. Weakly-held plans may be collected under GC pressure — then the
  // memo just re-resolves (it is a perf cache, not a correctness one).
  private val cache = new java.util.WeakHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.WeakReference[DataFrame]]]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      cache.computeIfAbsent(spark, _ => new java.util.concurrent.ConcurrentHashMap[
        String, java.lang.ref.WeakReference[DataFrame]]())
    }
    val key = s"$sfDir/$name.parquet"
    val cached = Option(perSession.get(key)).flatMap(r => Option(r.get))
    cached.getOrElse {
      val df = spark.read.parquet(key)
      perSession.put(key, new java.lang.ref.WeakReference(df))
      df
    }
  }

  /** Drop this session's memoized relations (after rewriting a dir). */
  def invalidate(spark: SparkSession): Unit =
    cache.synchronized { cache.remove(spark): Unit }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS): with
    * `spark.sql.legacy.parquet.nanosAsLong` it surfaces as a long of nanos
    * since epoch; convert to a µs timestamp via integer division (a double
    * division would lose precision above 2^53 ns). Truncation toward zero
    * matches the oracle, which floors ns → µs/s on format/trunc.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Rebalance a frame whose upstream has (far) fewer partitions than the
    * cluster has cores, so a compute-bound kernel downstream (md5-per-
    * shingle, per-row text scoring) is not serialized by the source split
    * count. Parquet can only split at row-group boundaries, so a
    * single-row-group file — the corpus here, and any small dimension
    * snapshot at scale — scans as ONE task no matter how many cores exist.
    * The exchange moves each row once; when the scan already has at least
    * half a task per core (every real 100 TB table) this is the identity
    * and adds nothing to the plan. */
  def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= cores) df.repartition(cores) else df
  }
}
