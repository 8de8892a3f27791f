package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Identity proofs for [[ShardedOrder]]: each sharded form must equal the
  * plain single-ordering window it replaces, row for row — on the real
  * events table AND on adversarial synthetics (heavy ties sitting exactly
  * on cut values, single-row keys, keys smaller than the bucket count).
  * The gates' unchanged DuckDB oracles certify the same identity
  * engine-vs-engine; these pin it per-operator with pathological shapes
  * the generated corpus never produces.
  */
class ShardedOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Deterministic synthetic: 3 keys, values drawn from a TINY domain
    * (0..9) so every quantile cut lands ON a tied value — the exact shape
    * where a bucket function that is not value-pure would split ties and
    * corrupt ranks. Key "c" has a single row; key "d" has two. */
  private def tieHeavy: DataFrame = {
    import spark.implicits._
    val rows =
      (1 to 200).map(i => ("a", i.toLong, (i * 7 % 10).toLong)) ++
      (1 to 57).map(i => ("b", i.toLong, (i * 3 % 4).toLong)) ++
      Seq(("c", 1L, 5L), ("d", 1L, 9L), ("d", 2L, 9L))
    rows.toDF("k", "id", "v")
  }

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    val cols = want.columns.sorted.map(col(_))
    assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).isEmpty &&
      want.select(cols: _*).exceptAll(got.select(cols: _*)).isEmpty,
      s"sharded form diverges from the plain window:\n" +
        s"got-only: ${got.select(cols: _*).exceptAll(want.select(cols: _*)).take(5).mkString("; ")}\n" +
        s"want-only: ${want.select(cols: _*).exceptAll(got.select(cols: _*)).take(5).mkString("; ")}")
  }

  test("shardedRowNumber == plain row_number + count (tie-heavy, 4 buckets)") {
    val df = tieHeavy
    val wOrd = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val wAll = Window.partitionBy(col("k"))
    val want = df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
    val got = ShardedOrder.shardedRowNumber(
      df, Seq("k"), "v", Seq("id"), "rn", "n", nBuckets = 4)
    assertSameRows(got, want)
  }

  test("shardedRowNumber == plain row_number + count (NULL-heavy key, " +
      "adaptive buckets)") {
    // ADVICE r14: the adaptive per-key mass must count NON-NULL value
    // rows only (percentile_approx excludes NULLs from the cuts, and
    // NULL rows all land in bucket 0 regardless) — this pins the output
    // invariance on a key that is 80% NULLs, under the DEFAULT adaptive
    // path (nBuckets = 0), where the mass feeds the bucket-count clamp
    import spark.implicits._
    val rows =
      (1 to 40).map(i => ("nullish", i.toLong,
        if (i % 5 == 0) Some((i % 7).toLong) else None)) ++
      (1 to 60).map(i => ("mixed", i.toLong, Some((i * 3 % 5).toLong)))
    val df = rows.toDF("k", "id", "v")
    val wOrd = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val wAll = Window.partitionBy(col("k"))
    val want = df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
    val got = ShardedOrder.shardedRowNumber(
      df, Seq("k"), "v", Seq("id"), "rn", "n")
    assertSameRows(got, want)
  }

  test("shardedRank2 == plain 2*rank + tie - 1 (tie-heavy, 8 buckets)") {
    val df = tieHeavy
    val want = df.withColumn("r2",
      (lit(2) * rank().over(Window.partitionBy(col("k")).orderBy(col("v")))
        + count(lit(1)).over(Window.partitionBy(col("k"), col("v")))
        - 1).cast("long"))
    val got = ShardedOrder.shardedRank2(df, Seq("k"), "v", "r2", nBuckets = 8)
    assertSameRows(got, want)
  }

  test("shardedValueAtRank == plain crossing median (tie-heavy, 4 buckets)") {
    val df = tieHeavy
    val wOrd = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val wAll = Window.partitionBy(col("k"))
    val want = df.withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") * 2 >= col("n"))
      .groupBy(col("k")).agg(min(col("v")).as("med"))
    val got = ShardedOrder.shardedValueAtRank(df, Seq("k"), "v", Seq("id"),
      n => shiftright(n + 1L, 1), "med", nBuckets = 4)
    assertSameRows(got, want)
    // and an off-center rank: the 3rd-smallest of every key that has one
    val want3 = df.withColumn("rn", row_number().over(wOrd))
      .filter(col("rn") === 3)
      .select(col("k"), col("v").as("third"))
    // keys with fewer than 3 rows must vanish from BOTH sides
    val got3 = ShardedOrder.shardedValueAtRank(df, Seq("k"), "v", Seq("id"),
      _ => lit(3L), "third", nBuckets = 4)
    assertSameRows(got3, want3)
  }

  test("shardedRangeSum == plain ranked trim (tie-heavy, 4 buckets)") {
    val df = tieHeavy
    val wOrd = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val wAll = Window.partitionBy(col("k"))
    def nDiv20(n: org.apache.spark.sql.Column) =
      ((n - pmod(n, lit(20L))) / 20L).cast("long")
    val ranked = df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
    val want = ranked
      .filter(col("rn") > nDiv20(col("n")) &&
        col("rn") <= col("n") - nDiv20(col("n")))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_kept"), sum(col("v")).as("s_kept"))
      .join(df.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s_all")), Seq("k"))
    val got = ShardedOrder.shardedRangeSum(df, Seq("k"), "v", Seq("id"),
      loOf = nDiv20, hiOf = n => n - nDiv20(n), nBuckets = 4)
    assertSameRows(got, want.select("k", "n", "s_all", "n_kept", "s_kept"))
    // degenerate cuts: keep everything (lo=0, hi=n) — no boundary buckets
    val gotAll = ShardedOrder.shardedRangeSum(df, Seq("k"), "v", Seq("id"),
      loOf = _ => lit(0L), hiOf = n => n, nBuckets = 4)
    val wantAll = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s_all"))
      .select(col("k"), col("n"), col("s_all"), col("n").as("n_kept"),
        col("s_all").as("s_kept"))
    assertSameRows(gotAll, wantAll)
  }

  test("shardedRank2Sum == plain grouped rank sums (tie-heavy, 8 buckets)") {
    val df = tieHeavy.withColumn("arm", pmod(col("id"), lit(2L)))
    val r2 = (lit(2) * rank().over(Window.partitionBy(col("k")).orderBy(col("v")))
      + count(lit(1)).over(Window.partitionBy(col("k"), col("v")))
      - 1).cast("long")
    val want = df.withColumn("r2", r2)
      .groupBy(col("k"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("r2")).as("r2_sum"))
    val got = ShardedOrder.shardedRank2Sum(df, Seq("k"), "v", Seq("arm"),
      nBuckets = 8)
    assertSameRows(got, want)
  }

  test("shardedGapStats == plain lag-gap moments (events, sf0.001)") {
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val want = e
      .select(col("event_type"), (col("us") - lag(col("us"), 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("s"),
        sum(col("gap").cast(DecimalType(19, 0)) * col("gap")).as("ss"))
    val got = ShardedOrder.shardedGapStats(
      e, Seq("event_type"), "us", "event_id", nBuckets = 16)
    // align decimal precision before the set compare
    val cast = Seq(col("event_type"), col("n_gaps"), col("s"),
      col("ss").cast(DecimalType(38, 0)).as("ss"))
    assertSameRows(got.select(cast: _*), want.select(cast: _*))
  }

  test("shardedGapStats drops single-row keys like the plain filtered form") {
    import spark.implicits._
    val df = Seq(("solo", 1L, 100L), ("pair", 1L, 10L), ("pair", 2L, 25L))
      .toDF("k", "id", "us")
    val got = ShardedOrder.shardedGapStats(df, Seq("k"), "us", "id", nBuckets = 4)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("k") === "pair")
    assert(got.head.getAs[Long]("n_gaps") === 1L)
    assert(got.head.getAs[Long]("s") === 15L)
  }

  test("shardedPrefixMax == plain running max over the prior frame (events)") {
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = e.withColumn("pm_us", max(col("us")).over(w))
    val got = ShardedOrder.shardedPrefixMax(
      e, Seq("event_type"), "event_id", col("us"), "pm_us", nBuckets = 16)
    assertSameRows(got, want)
  }

  test("shardedPrefixMax: first row per key stays null across bucket boundaries") {
    import spark.implicits._
    // key "x": strictly increasing value, so every prefix max = previous
    // value; the FIRST row has no prior frame and must be null even when
    // it sits alone in bucket 0
    val df = (1 to 40).map(i => ("x", i.toLong, i.toLong * 10))
      .toDF("k", "id", "v")
    val got = ShardedOrder.shardedPrefixMax(
        df, Seq("k"), "id", col("v"), "pm", nBuckets = 8)
      .orderBy(col("id")).collect()
    assert(got.head.isNullAt(got.head.fieldIndex("pm")))
    got.tail.foreach { r =>
      assert(r.getAs[Long]("pm") === (r.getAs[Long]("id") - 1) * 10)
    }
  }

  test("shardedPrefixSum == plain running sum + row_number (tie-heavy)") {
    // signed increments so the walk crosses zero repeatedly — the SPRT
    // shape; ties on v share a bucket and the (v, id) tie-break totals
    // the order, so the global cum is well-defined row-for-row
    val df = tieHeavy.withColumn("inc", pmod(col("id") * 13L, lit(7L)) - 3L)
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("k"))
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("cum", sum(col("inc")).over(w))
      .withColumn("n", count(lit(1)).over(wAll))
    val got = ShardedOrder.shardedPrefixSum(df, Seq("k"), "v", Seq("id"),
      col("inc"), "cum", "rn", "n", nBuckets = 4)
    assertSameRows(got, want)
  }

  test("shardedRangeSum clamps out-of-range cuts so n_kept matches s_kept") {
    // ADVICE r13: hiOf beyond the per-key row count (or negative loOf)
    // must clamp into [0, n] — n_kept counts the rows actually summed
    val df = tieHeavy
    val got = ShardedOrder.shardedRangeSum(df, Seq("k"), "v", Seq("id"),
        loOf = n => n - n - 5L, hiOf = n => n * 2L, nBuckets = 4)
      .collect()
    val wantTotals = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.length === wantTotals.size)
    got.foreach { r =>
      val (n, s) = wantTotals(r.getAs[String]("k"))
      assert(r.getAs[Long]("n_kept") === n, s"key ${r.getAs[String]("k")}")
      assert(r.getAs[Long]("s_kept") === s)
    }
  }

  test("ADAPTIVE default path == plain window (events, coalesced cuts)") {
    // gates take the nBuckets=0 default, where the per-key bucket count
    // adapts to row mass (coalesced cut slices); the identity must hold
    // there too, not just at the specs' pinned explicit counts
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val want = e.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
    val got = ShardedOrder.shardedRowNumber(
      e, Seq("event_type"), "us", Seq("event_id"), "rn", "n")
    assertSameRows(got, want)
  }

  test("rewired gates shuffle on (type, bucket), not on the bare type") {
    // the 100 TB claim lives HERE: the corpus exchange must carry the
    // shard column so the sort runs at types x cores parallelism.
    // q174's medians sit behind type-sized localCheckpoint barriers, so
    // its FINAL plan can't show them — its median kernel is asserted
    // directly instead.
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 1e6).cast("long").as("v_us"))
    Seq(
      ShardedOrder.shardedValueAtRank(e, Seq("event_type"), "v_us",
        Seq("event_id"), n => shiftright(n + 1L, 1), "med_us"),
      graft.queries.MonitorQueries.q194RankSumAb(spark, sf),
      graft.queries.Events.q175Burstiness(spark, sf),
      graft.queries.Events.q164Orderliness(spark, sf),
      graft.queries.MonitorQueries.q225Sprt(spark, sf)
    ).foreach { df =>
      df.count()
      val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(plan.contains("_so_bucket"),
        s"no sharded exchange in plan:\n${plan.take(2000)}")
    }
  }
}
