package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are chosen for the driver environment (single JVM, `local[32]`,
  * 128 GiB) but every knob here is what we would also set on a real
  * multi-executor cluster: AQE on (runtime coalesce + skew-join handling),
  * shuffle partitions sized to cores rather than the 200 default, UTC
  * session time zone for oracle parity.
  */
object GraftSession {

  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // native functions + the as-of join planner strategy, SQL-visible
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", math.max(cores, 8).toString))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing is byte-based; the text/dedup kernels are
      // compute-bound (md5 per shingle), so the default 1 MiB floor
      // collapses their few-MB shuffles to 1-3 partitions and serializes
      // the expensive map work AFTER the shuffle (and any persist() then
      // caches that serial layout). A 64 KiB floor keeps parallelism-first
      // coalescing at ~core count for small-byte/high-CPU stages; at
      // cluster scale shuffles are GBs and the floor never binds.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom filters prune the fact side of selective joins
      // before the shuffle — a large win on 100 TB star joins, but the
      // filter BUILD costs more than it saves below ~10M-row fact sides
      // (measured +8% on the sf0.1 bench), so off for local; flip on for
      // cluster deployments
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        sys.env.getOrElse("GRAFT_RUNTIME_BLOOM", "false"))
      // push MIN/MAX/COUNT straight to parquet footers (e.g., the
      // scalar max-date subquery scans metadata, not data)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the corpus `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4
      // rejects by default; read as long and convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = builder(appName, cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
