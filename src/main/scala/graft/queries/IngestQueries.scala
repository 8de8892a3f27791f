package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Ingest-robustness gates: what happens when the feed is NOT the clean
  * declared-schema parquet every other source in this engine reads.
  *
  * The reference ingests third-party JSON whose shape it does not
  * control (`API_manager.py:44-65` wraps the decode in try/except and
  * maps failures to typed errors); at 100 TB that policy has to be
  * row-granular, not file-granular — one malformed record in a billion
  * must quarantine itself, not kill the job or silently vanish. Spark's
  * contract for exactly this is PERMISSIVE mode + a corrupt-record
  * column: the parser yields every row, malformed payloads land intact
  * in the quarantine column (null everywhere else), fields absent from
  * a record default to null, and numeric fields read under a WIDER
  * declared type than the writer used (int token → double column) are
  * widened per row. All three policies are exercised here against a
  * deterministic dirty feed derived in-plan from `documents`, so the
  * DuckDB oracle can replay the identical corruption and the identical
  * parse outcomes with its own JSON kernel (`json_valid` /
  * `json_extract`) — two independent parsers agreeing on the same
  * quarantine set is the point of the gate.
  *
  * Scale shape: one corpus scan, one codegen'd projection building +
  * parsing the feed (`from_json` is a per-row expression — no shuffle),
  * one partial-aggregated groupBy on the handful of report buckets.
  * Nothing here is corpus-size-sensitive beyond the scan itself.
  */
object IngestQueries {

  /** The declared read schema. Deliberately WIDER and LARGER than what
    * the feed carries: `n_chars` is declared double (writers emit
    * integer tokens — per-row widening), `quality` is declared but no
    * record carries it (missing-column defaulting → null), and
    * `_corrupt` is the quarantine column PERMISSIVE mode fills. */
  private val readSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", DoubleType),
    StructField("source", StringType),
    StructField("quality", DoubleType),
    StructField("_corrupt", StringType)))

  /** The deterministic dirty feed, as a `(doc_id, raw)` projection:
    * every 7th doc's JSON is truncated 2 bytes short (an unterminated
    * string — unambiguously malformed to any parser), every remaining
    * 5th doc omits the `source` field entirely, and all records emit
    * `n_chars` as a bare integer token against the double-declared
    * read schema. Shared by the gate and [[graft.etl]]-side tests.
    *
    * Total over NULL inputs: the source columns are nullable in the
    * parquet schema, and a NULL reaching `concat` would NULL the whole
    * payload — Spark's `from_json(NULL)` then yields a null struct
    * (quarantine flag NULL → row counted valid) while DuckDB's
    * `json_valid(NULL)` is NULL (row routed corrupt) — a silent
    * engine/oracle divergence. Each field is therefore coalesced to a
    * fixed sentinel BEFORE serialization, identically on both sides,
    * so a future generator that plants NULLs cannot split the gate. */
  private[graft] def dirtyFeed(docs: DataFrame): DataFrame = {
    val id = coalesce(col("doc_id"), lit(-1L))
    val lang = coalesce(col("lang"), lit("und"))
    val chars = coalesce(col("n_chars"), lit(0L))
    val source = coalesce(col("source"), lit("unknown"))
    val full = concat(
      lit("{\"doc_id\":"), id,
      lit(",\"lang\":\""), lang,
      lit("\",\"n_chars\":"), chars,
      lit(",\"source\":\""), source, lit("\"}"))
    val noSource = concat(
      lit("{\"doc_id\":"), id,
      lit(",\"lang\":\""), lang,
      lit("\",\"n_chars\":"), chars, lit("}"))
    docs.select(id.as("feed_id"),
      when(id % 7 === 0, full.substr(lit(1), length(full) - 2))
        .when(id % 5 === 0, noSource)
        .otherwise(full).as("raw"))
  }

  /** q245: the ingest report over the dirty feed — one row per language
    * (plus the `__corrupt__` quarantine bucket) with the row count, the
    * missing-`source` count, the defaulted-`quality` count, the widened
    * char mass, and the byte mass of the ORIGINAL payloads (proving the
    * quarantine channel preserves malformed records verbatim — the
    * replayability requirement: a fixed upstream means quarantined rows
    * re-ingest from the quarantine table, not from a re-crawl).
    *
    * Membership in every report column is gated on `_corrupt IS NULL`
    * alone — never on a parsed field — because PERMISSIVE mode may
    * PARTIALLY fill fields of a malformed record (whatever prefix
    * parsed before the error), and partial-parse shape is parser
    * implementation detail the oracle's independent JSON kernel need
    * not share. Gating on the quarantine flag makes the report a pure
    * function of the valid/invalid partition, which both parsers agree
    * on by JSON's grammar. */
  def q245IngestRobust(spark: SparkSession, dir: String): DataFrame = {
    val feed = dirtyFeed(Tables.spread(Tables.documents(spark, dir)))
    val parsed = feed.select(col("raw"),
      from_json(col("raw"), readSchema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("rec"))
    val valid = col("rec.`_corrupt`").isNull
    val asLong: Column => Column = c => c.cast("int").cast("long")
    parsed
      .select(
        when(valid, col("rec.lang")).otherwise(lit("__corrupt__")).as("bucket"),
        asLong(valid && col("rec.source").isNull).as("miss_src"),
        asLong(valid && col("rec.quality").isNull).as("def_q"),
        when(valid, col("rec.n_chars")).otherwise(lit(0.0)).as("chars"),
        length(col("raw")).cast("long").as("len"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("miss_src")).as("n_missing_source"),
        sum(col("def_q")).as("n_quality_defaulted"),
        sum(col("chars")).as("sum_chars_wide"),
        sum(col("len")).as("quarantine_len"))
  }

  /** The unified lake-read contract for [[q246SchemaEvolution]]: what a
    * catalog would declare over every epoch ever written. `n_chars` is
    * LONG (old writers emitted int32 — widened per row on read),
    * `source` exists only in epoch-0 files and `quality` only in
    * epoch-1 files (each null-defaults where absent), `epoch` is the
    * partition column with a pinned type. */
  private val lakeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("source", StringType),
    StructField("quality", DoubleType),
    StructField("epoch", IntegerType)))

  /** q246: schema evolution across lake write epochs — the OTHER half of
    * the 100 TB ingest story next to [[q245IngestRobust]]'s dirty rows:
    * clean rows whose FILES were written by different generations of the
    * producer. The gate materializes two real parquet epochs from
    * `documents` (epoch 0: an old writer — `n_chars` int32, has
    * `source`, no `quality`; epoch 1: a new writer — `n_chars` int64,
    * has `quality` with occasional real NULLs, dropped `source`) and
    * reads them back through ONE declared unified schema, exercising
    * Spark's per-row int32→long widening, absent-column null
    * defaulting in BOTH directions, and partition-column typing.
    *
    * Deliberately NOT `mergeSchema`: footer-merge cannot reconcile
    * int32/int64 (CANNOT_MERGE_SCHEMAS) and, at a million files, even
    * working footer inference is a driver-side O(files) stall — the
    * scale answer is a catalog-declared schema, which is what this gate
    * certifies. The report distinguishes physically-missing-column
    * defaulting from real in-file NULLs (epoch 1's planted doc_id%3
    * nulls), because at 100 TB those are different bugs.
    *
    * The oracle never touches the files: epoch content is a pure
    * function of `documents` (parity `doc_id % 2`), so DuckDB rebuilds
    * the logical rows from the view and must agree with what Spark
    * read back through the physical epoch files — the round trip IS
    * the property under test. */
  /** One materialized epoch tree per input dir per JVM. The first
    * invocation writes the two epochs; bench replays (min-of-N sweeps)
    * and repeated plan builds reuse it — the gate certifies the READ
    * path, so re-writing identical files per call bought nothing and
    * leaked them: `deleteOnExit` cannot remove a non-empty directory,
    * so every sweep stranded a full corpus copy in /tmp. A single
    * shutdown hook walks each root deepest-first instead. */
  private[graft] val epochRoots =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private def deleteTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  private def epochRoot(spark: SparkSession, dir: String): java.nio.file.Path =
    epochRoots.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_q246_lake")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try deleteTree(root) catch { case _: Exception => () }))
      val docs = Tables.spread(Tables.documents(spark, dir))
      // epoch 0 — the OLD writer's physical layout (int32 n_chars,
      // source present, quality not yet invented)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("int").as("n_chars"), col("source"))
        .write.parquet(s"$root/epoch=0")
      // epoch 1 — the NEW writer (int64 n_chars, quality added with
      // real NULLs every third doc, source dropped)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"),
          when(col("doc_id") % 3 =!= 0, col("n_chars").cast("double") / 4.0)
            .as("quality"))
        .write.parquet(s"$root/epoch=1")
      root
    })

  def q246SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = epochRoot(spark, dir)
    spark.read.schema(lakeSchema).parquet(root.toString)
      .groupBy(col("epoch"), col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum((col("quality").isNull).cast("int").cast("long"))
          .as("n_quality_null"),
        sum((col("source").isNull).cast("int").cast("long"))
          .as("n_source_null"),
        sum(col("n_chars")).as("sum_chars_wide"),
        sum(coalesce(col("quality"), lit(0.0))).as("sum_quality"))
  }

  /** Epoch content is `documents` split by doc_id parity, so the oracle
    * rebuilds the unified rows from the view: epoch 0 rows default
    * `quality` (physically absent), epoch 1 rows default `source` and
    * carry `n_chars/4.0` quality except the planted `doc_id % 3` NULLs.
    * Agreement certifies Spark's file-level widening/defaulting
    * round-trip against content that never left the view. */
  val q246SchemaEvolutionSql: String =
    """SELECT
      |  CAST(doc_id % 2 AS INT) AS epoch,
      |  lang,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN doc_id % 2 = 0 OR doc_id % 3 = 0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_null,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_source_null,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars_wide,
      |  sum(CASE WHEN doc_id % 2 = 1 AND doc_id % 3 <> 0
      |      THEN n_chars / 4.0 ELSE 0.0 END) AS sum_quality
      |FROM documents GROUP BY 1, 2
      |""".stripMargin

  /** The oracle rebuilds the identical dirty feed with string concat and
    * replays the parse with DuckDB's JSON kernel: `json_valid` decides
    * the quarantine partition (both parsers agree by JSON's grammar —
    * the truncation leaves an unterminated string), `json_extract*`
    * NULLs on the missing field, and the double CAST widens the integer
    * token exactly as the double-declared Spark schema does. */
  val q245IngestRobustSql: String =
    """WITH feed AS (
      |  SELECT CASE
      |      WHEN doc_id % 7 = 0 THEN substr(j_full, 1, length(j_full) - 2)
      |      WHEN doc_id % 5 = 0 THEN j_nosrc
      |      ELSE j_full END AS raw
      |  FROM (
      |    -- same NULL sentinels as the engine's dirtyFeed: the feed
      |    -- must be a total function of the row on BOTH sides
      |    SELECT COALESCE(doc_id, -1) AS doc_id,
      |      '{"doc_id":' || COALESCE(doc_id, -1) || ',"lang":"' ||
      |        COALESCE(lang, 'und') || '","n_chars":' ||
      |        COALESCE(n_chars, 0) || ',"source":"' ||
      |        COALESCE(source, 'unknown') || '"}' AS j_full,
      |      '{"doc_id":' || COALESCE(doc_id, -1) || ',"lang":"' ||
      |        COALESCE(lang, 'und') || '","n_chars":' ||
      |        COALESCE(n_chars, 0) || '}' AS j_nosrc
      |    FROM documents)
      |), parsed AS (
      |  -- extracts guarded behind json_valid: DuckDB's json_extract
      |  -- THROWS on malformed input (its quarantine decision is the
      |  -- validity check itself), and CASE evaluates lazily per row
      |  SELECT raw, json_valid(raw) AS ok,
      |    CASE WHEN json_valid(raw)
      |      THEN json_extract_string(raw, '$.lang') END AS lang,
      |    CASE WHEN json_valid(raw)
      |      THEN json_extract_string(raw, '$.source') END AS src,
      |    CASE WHEN json_valid(raw)
      |      THEN CAST(json_extract(raw, '$.n_chars') AS DOUBLE) END
      |      AS n_chars
      |  FROM feed)
      |SELECT
      |  CASE WHEN ok THEN lang ELSE '__corrupt__' END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN ok AND src IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing_source,
      |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_quality_defaulted,
      |  sum(CASE WHEN ok THEN n_chars ELSE 0.0 END) AS sum_chars_wide,
      |  CAST(sum(length(raw)) AS BIGINT) AS quarantine_len
      |FROM parsed GROUP BY 1
      |""".stripMargin
}
