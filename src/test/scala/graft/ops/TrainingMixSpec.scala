package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingMixSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = (0 until 2000).map { i =>
    val lang = Seq("en", "es", "de")(i % 3)
    (i.toLong, lang, s"tok$i word${i % 7} text sample number $i end")
  }.toDF("doc_id", "lang", "text")

  test("stratified sampling hits the per-stratum rates and is deterministic") {
    val rates = Map("en" -> 0.5, "es" -> 0.1)
    val s1 = TrainingMix.stratifiedSample(corpus(), "doc_id", "lang", rates, 0.9)
    val s2 = TrainingMix.stratifiedSample(corpus(), "doc_id", "lang", rates, 0.9)
    assert(s1.select("doc_id").as[Long].collect().toSet ===
      s2.select("doc_id").as[Long].collect().toSet) // deterministic
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    // ~667 docs per stratum; Bernoulli(1/3·2000, p) stays well within ±0.1
    assert(math.abs(byLang("en") / 667.0 - 0.5) < 0.1, byLang)
    assert(byLang("es") / 667.0 < 0.2, byLang)
    assert(math.abs(byLang("de") / 667.0 - 0.9) < 0.1, byLang) // default rate
  }

  test("sequence packing: budget respected at starts, offsets contiguous per shard") {
    val packed = TrainingMix.packSequences(corpus(), "doc_id", "text",
      budgetTokens = 50L, shards = 4).collect()
    assert(packed.length === 2000)
    val byShard = packed.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("id"))
      // offsets are the running sum of preceding docs' tokens
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_start") === cum)
        // a doc's sequence is where its first token lands
        assert(r.getAs[Long]("seq") === cum / 50L)
        cum += r.getAs[Long]("tokens")
      }
    }
  }

  test("weighted sample: deterministic, k-exact, zero-weight rows never drawn") {
    val df = (1L to 500L).map(i => (i, if (i % 10 == 0) 0L else i % 7 + 1))
      .toDF("id", "w")
    val a = TrainingMix.weightedTopKSample(df.repartition(11), "id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = TrainingMix.weightedTopKSample(df.coalesce(1), "id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 50)
    assert(a.forall(_._3 > 0), "a zero-weight row was sampled")
    // ranks are 1..k in key order
    assert(a.map(_._1).toSeq === (1L to 50L))
    assert(a.map(_._4).toSeq === a.map(_._4).sortBy(-_).toSeq)
  }

  test("weighted sample: heavy rows are drawn proportionally more often") {
    // 200 light rows (w=1) + 200 heavy rows (w=20): in a 100-draw A-ES
    // sample the heavy class should dominate decisively (expected ~95)
    val df = ((1L to 200L).map(i => (i, 1L)) ++ (201L to 400L).map(i => (i, 20L)))
      .toDF("id", "w")
    val got = TrainingMix.weightedTopKSample(df, "id", "w", k = 100).collect()
    val heavy = got.count(_.getLong(1) > 200L)
    assert(heavy > 75, s"heavy class drawn only $heavy/100 times")
  }

  test("mixToBudget: over-represented sources downsample, under-represented keep whole") {
    // a: 1000 tokens, target 10% of a 500-token budget -> rate 0.05
    // b: 100 tokens, target 90% of 500 -> budget 450 > 100 -> rate clamps 1.0
    val df = ((1L to 100L).map(i => (i, "a", 10L)) ++
      (1001L to 1010L).map(i => (i, "b", 10L))).toDF("id", "src", "tok")
    val got = TrainingMix.mixToBudget(df, "id", "src", "tok",
      Map("a" -> 0.10, "b" -> 0.90), defaultFrac = 0.0, budgetTokens = 500L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (as, bs) = got.partition(_._2 == "a")
    assert(bs.length === 10, "under-represented source must keep every row")
    assert(as.length < 30, s"rate-0.05 source kept ${as.length}/100 rows")
    // deterministic across partitionings
    val again = TrainingMix.mixToBudget(df.repartition(7), "id", "src", "tok",
      Map("a" -> 0.10, "b" -> 0.90), defaultFrac = 0.0, budgetTokens = 500L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
  }

  test("mixToBudget: unmapped strata fall to defaultFrac; zero default drops them") {
    val df = Seq((1L, "x", 5L), (2L, "y", 5L)).toDF("id", "src", "tok")
    val kept = TrainingMix.mixToBudget(df, "id", "src", "tok",
      Map("x" -> 1.0), defaultFrac = 0.0, budgetTokens = 100L)
      .collect().map(_.getString(1)).toSet
    assert(kept === Set("x"))
  }

  test("capPerStratum: big strata trimmed to cap, small kept whole, deterministic") {
    val df = ((1L to 50L).map(i => (i, "big")) ++
      (100L to 104L).map(i => (i, "small"))).toDF("id", "src")
    val got = TrainingMix.capPerStratum(df, "id", "src", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (big, small) = got.partition(_._2 == "big")
    assert(big.length === 10 && big.map(_._3).sorted.toSeq === (1L to 10L))
    assert(small.length === 5, "stratum under the cap must keep every row")
    val again = TrainingMix.capPerStratum(df.repartition(7), "id", "src", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
  }

  test("temperatureMix: alpha<1 flattens shares, targets cap at n_s, deterministic") {
    // skewed sources: 1000 / 100 / 10 rows
    val df = ((0 until 1000).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (1100 until 1110).map(i => (i.toLong, "rare"))).toDF("doc_id", "src")
    val out = TrainingMix.temperatureMix(df, "doc_id", "src", 0.5, 200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // sqrt weights: 31.62/10/3.16 -> targets ~141/45/14, rare capped at 10
    assert(bySrc("rare") === 10, s"rare source must keep all (cap at n_s): $bySrc")
    assert(bySrc("mid") > 30 && bySrc("mid") < 60, bySrc.toString)
    assert(bySrc("big") > 100 && bySrc("big") < 180, bySrc.toString)
    // alpha=0.5 flattens: rare share 1% of corpus, but > 4% of the sample
    val total = out.length.toDouble
    assert(bySrc("rare") / total > 0.04)
    // rank contract: per-source rk is 1..t_src, t_src constant per source
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ts = rows.map(_._4).distinct
      assert(ts.length === 1 && rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // deterministic
    val again = TrainingMix.temperatureMix(df, "doc_id", "src", 0.5, 200L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === out.map(t => (t._1, t._2)).toSet)
    // alpha=1 recovers proportional sampling (no flattening)
    val prop = TrainingMix.temperatureMix(df, "doc_id", "src", 1.0, 200L)
      .collect().map(r => r.getString(1))
    val propBig = prop.count(_ == "big").toDouble / prop.length
    assert(propBig > 0.8, s"alpha=1 must keep the big source's ~90% share: $propBig")
  }

  test("assignSplits: total partition, stable under append, ~right fractions") {
    val splits = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)
    val df = (1L to 2000L).toDF("id")
    val got = TrainingMix.assignSplits(df, "id", splits)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size === 2000, "every row gets exactly one label")
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "validation", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts("validation") > 140 && counts("validation") < 260)
    // append-stability: labeling a superset never relabels an old row
    val grown = TrainingMix.assignSplits((1L to 3000L).toDF("id"), "id", splits)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.forall { case (id, s) => grown(id) == s })
    // threshold arithmetic is exact-integer and covers the full range
    val thrs = TrainingMix.splitThresholds(splits)
    assert(thrs.last._2 === 4294967296L)
    intercept[IllegalArgumentException] {
      TrainingMix.splitThresholds(Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("curriculumPhases: quartile buckets, columns ride through, no sort") {
    // keys 1..100: p25=25.75, p50=50.5, p75=75.25
    val df = (1L to 100L).map(i => (i, s"s${i % 3}", i)).toDF("id", "src", "k")
    val got = TrainingMix.curriculumPhases(df, "id", "k")
    assert(got.columns.toSeq === Seq("id", "src", "k", "phase"),
      "input columns must ride through")
    val byPhase = got.collect().map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    assert(byPhase(0L) === (1L to 25L) && byPhase(1L) === (26L to 50L))
    assert(byPhase(2L) === (51L to 75L) && byPhase(3L) === (76L to 100L))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SortExec") || !plan.contains("rangepartitioning"),
      "phasing must never globally sort the corpus\n" + plan.take(1500))
  }

  test("contamination: planted benchmark overlap found, clean docs absent") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "prefix alpha beta gamma delta epsilon suffix tail"), // shares 5-grams
      (101L, "completely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val hits = TrainingMix.contamination(corpus, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(100L) && hits(100L) >= 1)
    assert(!hits.contains(101L))
  }

  test("length batching: caps are pow-2 bounds, batches dense and in order") {
    val docs = (0 until 500).map { i =>
      (i.toLong, Seq.fill(1 + i % 100)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TrainingMix.lengthBucketBatches(docs, "doc_id", "text",
      batchSize = 8, shards = 4).cache()
    val rows = out.as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 500)
    rows.foreach { case (_, tokens, cap, shard, seq, slot, pad) =>
      assert(Set(32L, 64L, 128L)(cap), s"cap=$cap")
      assert(tokens <= cap && pad == cap - tokens)
      assert(shard >= 0 && shard < 4 && slot >= 0 && slot < 8 && seq >= 0)
    }
    // within each (cap, shard): slots/seqs are the dense doc-id ranking
    rows.groupBy(r => (r._3, r._4)).foreach { case (_, g) =>
      val ordered = g.sortBy(_._1).map(r => r._5 * 8 + r._6)
      assert(ordered.toSeq == ordered.indices.map(_.toLong).toSeq,
        "batch numbering must be the dense per-(cap,shard) doc-id rank")
    }
    // every batch except possibly the last per stream is exactly full
    rows.groupBy(r => (r._3, r._4)).foreach { case (_, g) =>
      val bySeq = g.groupBy(_._5).map { case (s, b) => s -> b.length }
      val maxSeq = bySeq.keys.max
      bySeq.foreach { case (s, n) => if (s < maxSeq) assert(n == 8) }
    }
  }
}
