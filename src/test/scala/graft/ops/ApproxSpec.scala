package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("HLL distinct within 5% of exact on lineitem keys") {
    val l = Tables.lineitem(spark, sf)
    val r = l.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      Approx.distinctCount(col("l_orderkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx percentiles straddle the exact interpolated values") {
    val l = Tables.lineitem(spark, sf)
    val r = l.agg(
      expr("percentile(l_quantity, 0.5)").as("exact_p50"),
      Approx.percentiles(col("l_quantity"), Seq(0.5)).as("ap")).collect().head
    val exact = r.getDouble(0)
    val approx = r.getSeq[Double](1).head
    assert(math.abs(approx - exact) <= 1.0, s"exact=$exact approx=$approx")
  }

  test("profile emits one row per group with sane fields") {
    val p = Approx.profile(Tables.lineitem(spark, sf), Seq("l_returnflag"), "l_quantity")
      .collect()
    assert(p.length === 3)
    p.foreach { r => assert(r.getLong(1) > 0 && r.getLong(2) > 0) }
  }

  test("Misra-Gries: exact when vocabulary fits, theorem bounds when not") {
    import spark.implicits._
    // zipf-ish stream: item i appears 1000/i times, i = 1..40
    val stream = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"it$i"))
    val n = stream.size.toLong
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // shuffled + repartitioned: the merge path runs across 8 partials
    val ds = new scala.util.Random(7).shuffle(stream).toDS().repartition(8)

    // capacity ≥ vocabulary → the sketch IS the exact histogram
    val full = Approx.heavyHitters(ds, k = 64)
    assert(full === exact)

    // capacity 10 < 40: ≤ k entries; never overcounts; undercount ≤
    // N/(k+1); every item above that threshold present — regardless of
    // partition/merge order (deterministic theorem, not luck)
    val k = 10
    val mg = Approx.heavyHitters(ds, k)
    val bound = n.toDouble / (k + 1)
    assert(mg.size <= k)
    mg.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert(exact(t) - est <= bound, s"$t undercut past the bound")
    }
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(mg.contains(t), s"heavy item $t missing (bound $bound)")
    }
  }

  test("Misra-Gries composes per group via groupBy + graft_heavy_hitters") {
    import spark.implicits._
    // two groups with different dominant items; k=2 per group
    val rows = (Seq.fill(60)(("g1", "a")) ++ Seq.fill(25)(("g1", "b")) ++
      (1 to 15).map(i => ("g1", s"x$i")) ++
      Seq.fill(50)(("g2", "z")) ++ (1 to 10).map(i => ("g2", s"y$i")))
    val df = new scala.util.Random(5).shuffle(rows).toDF("g", "item")
      .repartition(4)
    val perGroup = df.groupBy(col("g"))
      .agg(graft.functions.TextFunctions.heavy_hitters(col("item"), 2).as("hh"))
      .select(col("g"), col("hh.items").as("items"), col("hh.n").as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getMap[String, Long](1).toMap, r.getLong(2))))
      .toMap
    // per-group N and bound: g1 N=100 bound=100/3; g2 N=60 bound=20 —
    // the dominant item must survive its group's sketch with est ≥
    // true − bound (theorem, any partial order); n is EXACT per group
    assert(perGroup("g1")._2 === 100L)
    assert(perGroup("g2")._2 === 60L)
    assert(perGroup("g1")._1.contains("a") && perGroup("g1")._1("a") >= 60 - 100 / 3)
    assert(perGroup("g2")._1.contains("z") && perGroup("g2")._1("z") >= 50 - 20)
    assert(perGroup.values.forall(_._1.size <= 2))
  }

  test("graft_heavy_hitters aggregates a STREAM per group (complete mode)") {
    // the live-dashboard shape: top tokens per source over an unbounded
    // stream — the sketch buffer serializes through the state store
    // between micro-batches, so this exercises serialize/deserialize/
    // merge across batches, not just within one job
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val agg = in.toDF().toDF("g", "item")
      .groupBy(col("g"))
      .agg(graft.functions.TextFunctions.heavy_hitters(col("item"), 3).as("hh"))
    val q = agg.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      in.addData(("g1", "a"), ("g1", "a"), ("g1", "b"))
      q.processAllAvailable()
      in.addData(("g1", "a"), ("g2", "z"))
      q.processAllAvailable()
      val rows = spark.table("hh_stream")
        .select(col("g"), col("hh.items"), col("hh.n")).collect()
        .map(r => r.getString(0) -> ((r.getMap[String, Long](1).toMap, r.getLong(2))))
        .toMap
      assert(rows("g1") === ((Map("a" -> 3L, "b" -> 1L), 4L)))
      assert(rows("g2") === ((Map("z" -> 1L), 1L)))
    } finally q.stop()
  }

  test("graft_heavy_hitters is SQL-callable in a GROUP BY") {
    import spark.implicits._
    graft.functions.TextFunctions.register(spark)
    Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "z"))
      .toDF("g", "item").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      """SELECT g, graft_heavy_hitters(item, 4) AS hh FROM hh_in GROUP BY g""")
      .select(col("g"), col("hh.items"), col("hh.n"))
      .collect().map(r => r.getString(0) -> ((r.getMap[String, Long](1).toMap, r.getLong(2))))
      .toMap
    assert(rows("g1") === ((Map("a" -> 2L, "b" -> 1L), 3L)))
    assert(rows("g2") === ((Map("z" -> 1L), 1L)))
  }
}
