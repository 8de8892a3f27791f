package graft

import org.apache.spark.sql.functions.col

import graft.etl.{StateStore, Transforms}
import graft.warehouse.Scd0

/** Property-style invariants (SURVEY §5.2 item 4) over seeded random
  * inputs: SCD-0 merge idempotence and key uniqueness, watermark
  * monotonicity, stock_key format round-trip. (Plain seeded sampling — the
  * scalatest/scalacheck bridge artifact isn't in the offline cache.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  private def randKeys(): List[String] =
    List.fill(rng.nextInt(20))(rng.nextInt(30).toString)

  test("scd0: merge is idempotent, keys unique, batch fully represented") {
    (1 to 10).foreach { _ =>
      val whKeys = randKeys(); val batchKeys = randKeys()
      val wh = whKeys.distinct.map(k => (k, s"wh-$k")).toDF("k", "v")
      val batch = batchKeys.map(k => (k, s"b-$k")).toDF("k", "v")
      val merged = wh.union(Scd0.newRows(batch, wh, "k"))
      assert(Scd0.newRows(batch, merged, "k").isEmpty)            // idempotent
      assert(merged.count() === merged.select("k").distinct().count()) // unique
      val missing = batch.select("k").distinct()
        .join(merged.select("k"), Seq("k"), "left_anti")
      assert(missing.isEmpty)                                      // complete
    }
  }

  test("state: watermark is monotone under any update sequence") {
    (1 to 5).foreach { _ =>
      val updates = List.fill(5)(f"2024-01-${rng.nextInt(28) + 1}%02d")
      val st = new StateStore(spark, tmpDir("prop-state") + "/s.json")
      var high = StateStore.Sentinel
      updates.foreach { d =>
        st.advance("Stock", "T", d)
        high = if (d > high) d else high
        assert(st.watermark("Stock", "T") === high)
      }
    }
  }

  test("minhash native kernel equals declarative form on random corpora") {
    import org.apache.spark.sql.functions.col
    (1 to 3).foreach { round =>
      val vocab = Vector.fill(8)("w" + rng.nextInt(1000))
      val docs = (0 until 40).map { i =>
        // lengths straddle the shingle width, incl. empty and 1-2 tokens
        val n = rng.nextInt(12)
        (i.toLong, Vector.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val native = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text")
        .as[(Long, Int, String)].collect().toSet
      val decl = graft.ops.Dedup.minhashSignaturesViaShuffle(docs, "doc_id", "text")
        .as[(Long, Int, String)].collect().toSet
      assert(native === decl, s"round $round")
      // docs with >= 3 tokens contribute exactly 8 seed rows
      val expectDocs = docs.filter(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")) >= 3)
        .count()
      assert(native.size === expectDocs * 8)
    }
  }

  test("incremental dedup equals full recompute on random corpora and splits") {
    import org.apache.spark.sql.functions.col
    (1 to 3).foreach { round =>
      // small vocab forces real shingle collisions; random split point
      val vocab = Vector.fill(6)("w" + rng.nextInt(100))
      val docs = (0 until 50).map { i =>
        val n = 3 + rng.nextInt(10)
        (i.toLong, Vector.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val split = 5L + rng.nextInt(40)
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_prop_idx_$round").toString + "/idx"
      val index = graft.ops.Dedup.signatureIndexArtifact(
        docs.filter(col("doc_id") < split), "doc_id", "text", tmp)
      val inc = graft.ops.Dedup.minhashCandidatesIncremental(
          docs.filter(col("doc_id") >= split), "doc_id", "text", index)
        .as[(Long, Long, Double)].collect().toSet
      val full = graft.ops.Dedup.minhashCandidates(docs, "doc_id", "text")
        .filter(col("id_b") >= split)
        .as[(Long, Long, Double)].collect().toSet
      assert(inc === full, s"round $round split $split: " +
        s"inc-only=${inc -- full} full-only=${full -- inc}")
    }
  }

  test("BMP round-trips random pixels at random dimensions") {
    (1 to 12).foreach { _ =>
      val w = rng.nextInt(9) + 1
      val h = rng.nextInt(9) + 1
      val px = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val (dw, dh, out) = graft.ops.Multimodal.Bmp.decode(
        graft.ops.Multimodal.Bmp.encode(w, h, px))
      assert((dw, dh) === ((w, h)))
      assert(out.toSeq === px.toSeq)
    }
  }

  test("stratified sampling is a pure per-row predicate: subset-stable") {
    val rows = (0 until 300).map(i => (i.toLong, Seq("a", "b")(i % 2))).toDF("id", "s")
    val rates = Map("a" -> 0.4)
    val full = graft.ops.TrainingMix.stratifiedSample(rows, "id", "s", rates, 0.7)
      .select("id").as[Long].collect().toSet
    // sampling any subset yields exactly the intersection — proves the
    // decision depends only on the row, never on the dataset (the property
    // that makes it reproducible at any scale/partitioning)
    val subset = rows.filter(org.apache.spark.sql.functions.col("id") < 100)
    val sampled = graft.ops.TrainingMix.stratifiedSample(subset, "id", "s", rates, 0.7)
      .select("id").as[Long].collect().toSet
    assert(sampled === full.filter(_ < 100))
  }

  test("stock_key round-trips to (date, ticker) and fits VARCHAR(20)") {
    (1 to 10).foreach { _ =>
      val ticker = List.fill(rng.nextInt(6) + 1)(
        ('A' + rng.nextInt(26)).toChar).mkString
      val date = f"2024-03-${rng.nextInt(28) + 1}%02d"
      val raw = Seq((date, 1.0, 2.0, 0.5, 1.5, 1.4, 100L))
        .toDF("date", "open", "high", "low", "close", "adjusted_close", "volume")
      val out = Transforms.transformStock(raw, ticker).collect().head
      val key = out.getAs[String]("stock_key")
      assert(key === s"$date/$ticker")
      assert(key.length <= 20)
      val Array(d2, t2) = key.split("/")
      assert(d2 === date && t2 === ticker)
    }
  }

  test("repetition stats: range/consistency invariants on random docs") {
    import org.apache.spark.sql.functions._
    (1 to 3).foreach { round =>
      val vocab = Vector.fill(4)("w" + rng.nextInt(100)) // tiny vocab → repeats
      val docs = (0 until 60).map { i =>
        val n = rng.nextInt(15) + 1
        (i.toLong, Vector.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val got = docs.select(
          size(split(col("text"), " ")).as("n"),
          graft.ops.TextOps.repetitionStats(col("text")).as("r"))
        .select(col("n"), col("r.top_bigram_frac"), col("r.dup_trigram_frac"),
          col("r.max_run"))
        .collect()
      got.foreach { r =>
        val n = r.getInt(0)
        if (n < 2) assert(r.isNullAt(1)) else {
          val tf = r.getDouble(1)
          // the mode occupies between 1/(n-1) and all bigram slots
          assert(tf >= 1.0 / (n - 1) - 1e-12 && tf <= 1.0, s"tf=$tf n=$n")
        }
        if (n < 3) assert(r.isNullAt(2)) else {
          val df = r.getDouble(2)
          assert(df >= 0.0 && df < 1.0, s"df=$df n=$n") // ≥1 distinct trigram
        }
        val run = r.getLong(3)
        assert(run >= 1 && run <= n, s"run=$run n=$n")
      }
      // token-level bijective renaming leaves every statistic unchanged
      val renamed = docs.withColumn("text",
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit("x"), t))))
      val a = docs.select(graft.ops.TextOps.repetitionStats(col("text")).as("r"))
        .collect().toSeq
      val b = renamed.select(graft.ops.TextOps.repetitionStats(col("text")).as("r"))
        .collect().toSeq
      assert(a === b, s"round $round: stats not invariant under renaming")
    }
  }

  test("heavy hitters: theorem bounds + exact n under random k, skew, and partitioning") {
    // the MG theorem must hold for ANY (k, stream, partition layout) —
    // each round draws all three at random and re-checks the three facts
    // the q63/q64 gates state, plus the buffer-carried exact count
    (1 to 6).foreach { round =>
      val k = 2 + rng.nextInt(40)
      val vocab = 5 + rng.nextInt(80)
      val stream = List.fill(500 + rng.nextInt(3000))(s"t${(math.pow(rng.nextDouble(), 2.5) * vocab).toInt}")
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val parts = 1 + rng.nextInt(12)
      val row = stream.toDF("item").repartition(parts)
        .agg(graft.functions.TextFunctions.heavy_hitters(col("item"), k).as("hh"))
        .select(col("hh.items"), col("hh.n")).collect().head
      val mg = row.getMap[String, Long](0).toMap
      val n = row.getLong(1)
      assert(n === stream.size.toLong, s"round $round: n wrong")
      val bound = n.toDouble / (k + 1)
      assert(mg.size <= k, s"round $round: ${mg.size} > k=$k")
      mg.foreach { case (t, est) =>
        assert(est <= exact(t), s"round $round: $t overcounted")
        assert(exact(t) - est <= bound, s"round $round: $t undercut past $bound")
      }
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(mg.contains(t), s"round $round: heavy $t missing (k=$k, parts=$parts)")
      }
    }
  }

  test("top-token-freq kernel equals exact multiplicity on random token strings") {
    val vocab = Vector("a", "bb", "ccc", "dd", "", "ef", "zz")
    (1 to 200).foreach { round =>
      val toks = List.fill(rng.nextInt(40))(vocab(rng.nextInt(vocab.size)))
      val s = toks.mkString(" ")
      // reference: split-on-space semantics (empties survive)
      val exact = s.split(" ", -1).groupBy(identity).values.map(_.length).max
      val got = graft.functions.TopTokenFreqUtil.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got === exact.toLong, s"round $round: '$s'")
    }
  }

  test("theta union is order- and grouping-invariant on random key sets") {
    import graft.functions.ThetaOps
    (1 to 5).foreach { round =>
      val keys = List.fill(500 + rng.nextInt(500))(rng.nextInt(300).toLong)
      val distinct = keys.distinct.size
      // one-shot
      val u1 = ThetaOps.emptyUnion(12)
      keys.foreach(u1.update)
      // random 3-way grouping, merged in shuffled order
      val groups = keys.groupBy(_ => rng.nextInt(3)).values.toList
      val parts = rng.shuffle(groups).map { g =>
        val u = ThetaOps.emptyUnion(12); g.foreach(u.update)
        u.getResult.toByteArray
      }
      val merged = ThetaOps.emptyUnion(12)
      parts.foreach(b => merged.union(ThetaOps.fromBytes(b)))
      assert(u1.getResult.getEstimate === distinct.toDouble, s"round $round")
      assert(merged.getResult.getEstimate === distinct.toDouble, s"round $round")
    }
  }

  test("sharded windows equal plain windows on random skewed corpora") {
    // the ShardedOrder identity claim, randomized: key cardinality 1-6,
    // value domain 2-2000 (tiny domains force quantile cuts ONTO tied
    // values), bucket count 2-40 (above AND below the key sizes), skewed
    // key masses. Every form must match its plain window exactly.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.ops.ShardedOrder
    (1 to 4).foreach { round =>
      val nKeys = 1 + rng.nextInt(6)
      val domain = 2 + rng.nextInt(1999)
      val nb = 2 + rng.nextInt(39)
      val rows = (0 until nKeys).flatMap { k =>
        val sz = 1 + rng.nextInt(if (k == 0) 800 else 120) // skewed key 0
        (0 until sz).map(i => (s"k$k", k * 100000L + i,
          rng.nextInt(domain).toLong))
      }
      val df = rows.toDF("k", "id", "v")
      // join-backs reorder columns: align by sorted name before comparing
      def same(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Boolean = {
        val cols = b.columns.sorted.map(col(_))
        a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
          b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty
      }
      val wOrd = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
      val wAll = Window.partitionBy(col("k"))
      val wantRn = df.withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
      val gotRn = ShardedOrder.shardedRowNumber(
        df, Seq("k"), "v", Seq("id"), "rn", "n", nBuckets = nb)
      assert(same(gotRn, wantRn), s"rowNumber diverged (round $round)")
      val wantR2 = df.withColumn("r2",
        (lit(2) * rank().over(Window.partitionBy(col("k")).orderBy(col("v")))
          + count(lit(1)).over(Window.partitionBy(col("k"), col("v")))
          - 1).cast("long"))
      val gotR2 = ShardedOrder.shardedRank2(df, Seq("k"), "v", "r2", nBuckets = nb)
      assert(same(gotR2, wantR2), s"rank2 diverged (round $round)")
      val wantMed = wantRn.filter(col("rn") * 2 >= col("n"))
        .groupBy(col("k")).agg(min(col("v")).as("med"))
      val gotMed = ShardedOrder.shardedValueAtRank(df, Seq("k"), "v",
        Seq("id"), n => shiftright(n + 1L, 1), "med", nBuckets = nb)
      assert(same(gotMed, wantMed), s"valueAtRank diverged (round $round)")
      val wPm = Window.partitionBy(col("k")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wantPm = df.withColumn("pm", max(col("v")).over(wPm))
      val gotPm = ShardedOrder.shardedPrefixMax(
        df, Seq("k"), "id", col("v"), "pm", nBuckets = nb)
      assert(same(gotPm, wantPm), s"prefixMax diverged (round $round)")
      // random trim cuts (exclusive lo, inclusive hi) as fractions of n
      val (fLo, fHi) = { val a = rng.nextInt(50); val b = 50 + rng.nextInt(51)
        (a.toLong, b.toLong) }
      def cut(f: Long)(n: org.apache.spark.sql.Column) =
        ((n * f - pmod(n * f, lit(100L))) / 100L).cast("long")
      val wantRs = wantRn
        .filter(col("rn") > cut(fLo)(col("n")) &&
          col("rn") <= cut(fHi)(col("n")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_kept"), sum(col("v")).as("s_kept"))
        .join(df.groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s_all")), Seq("k"))
        .select("k", "n", "s_all", "n_kept", "s_kept")
      val gotRs = ShardedOrder.shardedRangeSum(df, Seq("k"), "v", Seq("id"),
          loOf = cut(fLo), hiOf = cut(fHi), nBuckets = nb)
        // an empty kept range drops the key from the plain form's counts
        .filter(col("n_kept") > 0)
      assert(same(gotRs, wantRs), s"rangeSum diverged (round $round lo=$fLo hi=$fHi)")
      val wantR2s = wantR2.withColumn("arm", pmod(col("id"), lit(3L)))
        .groupBy(col("k"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("r2_sum"))
      val gotR2s = ShardedOrder.shardedRank2Sum(
        df.withColumn("arm", pmod(col("id"), lit(3L))),
        Seq("k"), "v", Seq("arm"), nBuckets = nb)
      assert(same(gotR2s, wantR2s), s"rank2Sum diverged (round $round)")
    }
  }
}
