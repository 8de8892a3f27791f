package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native dot kernel is bit-identical to the HOF reference") {
    val v = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").as("a"))
    val paired = v.withColumn("b", reverse(col("a")))
    val diff = paired.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
    // length mismatch yields NULL in BOTH forms (a malformed embedding
    // must surface, not flow on as a plausible truncated dot product)
    val mism = Seq((Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect().head
    assert(mism.isNullAt(0) && mism.isNullAt(1))
  }

  test("cosine kernel: known vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), -1.0),
      (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f), 1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("sim"), col("expected")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  private def planted() = {
    // 40 random base vectors + near-duplicates of the first 5 (tiny noise)
    val rng = new scala.util.Random(7)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, vec().toSeq))
    val dups = (0 until 5).map { i =>
      (100L + i, base(i)._2.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("id", "vec")
  }

  test("hard negatives: top-k conflicting-label neighbors, planted pair found") {
    // planted near-dup pairs with CONFLICTING labels: the canonical hard
    // negative — must surface as each other's rank-1 negative
    val withLabels = planted().withColumn("label",
      (col("id") % 2).cast("int"))
      .withColumn("label",
        when(col("id") >= 100L, lit(9)).otherwise(col("label")))
    val out = Similarity.hardNegatives(withLabels, k = 3,
      targetBucketRows = 64)
    val rows = out.select("id", "label", "rank", "neg_id", "neg_label", "sim")
      .as[(Long, Int, Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    // never a same-label row; never more than k per id; rank contiguous
    assert(rows.forall { case (_, l, _, _, nl, _) => l != nl })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // each planted dup (label 9) finds its base (label 0/1) at rank 1
    val rank1 = rows.filter(r => r._1 >= 100L && r._3 == 1L)
      .map(r => r._1 -> r._4).toMap
    (0 until 5).foreach { i =>
      assert(rank1.get(100L + i).contains(i.toLong),
        s"dup ${100 + i} should have base $i as its top hard negative")
    }
  }

  test("LSH near-dup candidates find planted duplicates (high-sim regime)") {
    val found = Similarity.lshNearDupCandidates(planted(), nTables = 4,
        bitsPerTable = 12, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(expected.subsetOf(found), s"missing: ${expected -- found}")
  }

  test("auto-sized LSH: density rule holds occupancy, recall preserved") {
    // the rule: bits = ceil(log2(n / target)), clamped
    assert(Similarity.autoBits(2000) === 7)     // 2000/30 ≈ 64-bucket rule
    assert(Similarity.autoBits(20000) === 10)
    assert(Similarity.autoBits(1000000000L) === 25)
    assert(Similarity.autoBits(10) === 4)        // clamp low
    assert(Similarity.autoBits(Long.MaxValue) === 28) // clamp high
    // auto path still finds the planted dups (45 vectors -> 4 bits, tiny
    // buckets, but near-identical vectors agree on every plane ~always)
    val found = Similarity.lshNearDupCandidatesAuto(planted(), nTables = 8,
        threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(expected.subsetOf(found), s"missing: ${expected -- found}")
  }

  test("centroid artifact refuses a parameter-mismatched serve; Lloyd keeps k") {
    val v = planted()
    val tmp = java.nio.file.Files.createTempDirectory("graft_cent_spec")
      .toString + "/cents"
    val trained = Similarity.centroidArtifact(v, tmp, k = 8, iters = 1, init = "sample")
    assert(trained.count() === 8)
    // same params: served from the artifact
    assert(Similarity.centroidArtifact(v, tmp, k = 8, iters = 1, init = "sample")
      .count() === 8)
    // different k: must fail, not silently serve the 8-centroid table
    val e = intercept[IllegalArgumentException] {
      Similarity.centroidArtifact(v, tmp, k = 16, iters = 1, init = "sample")
    }
    assert(e.getMessage.contains("k=16"))
    // empty clusters keep their previous centroid — k rows survive even
    // when k exceeds the effective distinct points (5 dup pairs planted)
    val many = Similarity.trainCentroids(v, k = 32, iters = 2, init = "sample")
    assert(many.count() === 32)
  }

  test("LSH top-k recall vs brute force on planted duplicates") {
    val v = planted()
    val q = v.filter(col("id") < 5).select(col("id").as("qid"), col("vec").as("qvec"))
    val bf = Similarity.bruteForceTopK(v, q, 1)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(v, q, 1, nTables = 8, bitsPerTable = 8)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    // the planted duplicate is each query's top-1 and must survive LSH
    assert(bf === (0 until 5).map(i => (i.toLong, 100L + i)).toSet)
    assert((bf intersect lsh).size >= 4, s"recall too low: $lsh")
  }

  test("IVF: clustered data recalls planted neighbors with pruned probes") {
    // 4 well-separated clusters of 12 vectors each
    val rng = new scala.util.Random(3)
    val centers = Seq.fill(4)(Array.fill(64)(rng.nextGaussian().toFloat * 5))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 12
    } yield ((ci * 100 + j).toLong,
      c.map(x => x + rng.nextGaussian().toFloat * 0.1f).toSeq)
    val v = pts.toDF("id", "vec")
    val q = v.filter(col("id") % 100 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val cents = Similarity.trainCentroids(v, 4, iters = 2)
    assert(cents.count() === 4)
    val ivf = Similarity.ivfTopK(v, q, 5, cents, nprobe = 1)
      .select("qid", "id").as[(Long, Long)].collect()
    // every neighbor comes from the query's own cluster
    assert(ivf.nonEmpty && ivf.forall { case (qid, id) => id / 100 == qid / 100 })
    val bf = Similarity.bruteForceTopK(v, q, 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = ivf.count(bf.contains).toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("native LSH signature kernel equals the declarative expression form") {
    val v = planted()
    val (t, b, d) = (16, 6, 64)
    val ps = Similarity.planes(t, b, d)
    val decl = v.select(col("id") +: (0 until t).map(i =>
      Similarity.signature(col("vec"), ps(i)).as(s"s$i")): _*)
    val native = v.select(col("id"),
      graft.functions.VectorFunctions.lsh_signatures(col("vec"), t, b, d).as("sigs"))
    val joined = decl.join(native, "id").collect()
    joined.foreach { r =>
      val sigs = r.getSeq[Long](r.fieldIndex("sigs"))
      (0 until t).foreach { i =>
        assert(r.getLong(r.fieldIndex(s"s$i")) === sigs(i), s"table $i")
      }
    }
    assert(joined.length === 45)
  }

  test("LSH candidates are a sound subset of exact all-pairs (same sims)") {
    val v = planted()
    val exact = Similarity.nearDupPairs(v, 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val lsh = Similarity.lshNearDupCandidates(v, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    // every blocked pair exists in the exact set with a bit-identical sim
    lsh.foreach { case (a, b, s) =>
      assert(exact.get((a, b)).contains(s), s"($a,$b,$s) not in exact set")
    }
    // the planted high-sim duplicates all survive blocking (design regime)
    val dupPairs = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    val found = lsh.map { case (a, b, _) => (a, b) }.toSet
    assert(dupPairs.subsetOf(found), s"missing ${dupPairs -- found}")
  }

  test("native centroid assignment equals declarative struct-min assignment") {
    val v = planted()
    val cents = v.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val decl = Similarity.assign(v, cents)
      .as[(Long, Long)].collect().toMap
    val centSeq = cents.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val matrix = centSeq.sortBy(_._1).map(_._2.toArray).toArray
    val ids = centSeq.sortBy(_._1).map(_._1).toArray
    val native = v.select(col("id"),
        graft.functions.VectorFunctions.nearest_centroids(col("vec"), matrix, ids, 1)
          .getItem(0).as("cid"))
      .as[(Long, Long)].collect().toMap
    assert(native === decl)
  }

  test("native centroid assignment tolerates NaN vectors (lowest cid, no crash)") {
    val v = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(Float.NaN, 1f, 0f, 0f)) // bad upstream embedding
    ).toDF("id", "vec")
    val matrix = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val got = v.select(col("id"),
        graft.functions.VectorFunctions.nearest_centroids(col("vec"), matrix, Array(10L, 20L), 1)
          .getItem(0).as("cid"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 10L)
    assert(got(2L) === 10L) // all-NaN distances: lowest cid, like struct-min
  }

  test("NaN CENTROID never beats a finite one, regardless of position") {
    // the NaN sits in the centroid matrix (bad training artifact), not the
    // vector: only that one distance is NaN, and struct-min sorts NaN last
    // — so the finite centroid must win even from position 1
    val v = Seq((1L, Seq(0f, 1f, 0f, 0f))).toDF("id", "vec")
    val matrix = Array(Array(Float.NaN, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val got = v.select(
        graft.functions.VectorFunctions.nearest_centroids(col("vec"), matrix, Array(10L, 20L), 2)
          .as("cids"))
      .as[Seq[Long]].collect().head
    assert(got === Seq(20L, 10L)) // finite first, NaN centroid last
  }

  test("min-rep keep-first dedup equals pair-exhaustive dedup on planted dups") {
    val v = planted()
    val viaPairs = graft.ops.Curation.curateEmbeddings(v, 0.9, method = "lsh")
      .select("id").as[Long].collect().toSet
    val viaMinRep = graft.ops.Curation.curateEmbeddings(v, 0.9, method = "lsh-minrep")
      .select("id").as[Long].collect().toSet
    // dup clusters here are (base_i, dup_i) stars around the min id, where
    // bucket-min verification is exhaustive — the two strategies agree
    assert(viaMinRep === viaPairs)
    assert((0 until 5).forall(i => !viaMinRep.contains(100L + i))) // dups dropped
    assert((0 until 40).forall(i => viaMinRep.contains(i.toLong))) // bases kept
  }

  test("int8 quantization: round-trip error bounded, quantized top-1 recalls planted dup") {
    val v = planted()
    val qz = graft.ops.Quantize.quantize(v, "vec").collect()
    qz.foreach { r =>
      val vec = r.getSeq[Float](r.fieldIndex("vec"))
      val s = r.getDouble(r.fieldIndex("qscale"))
      val q = r.getSeq[Int](r.fieldIndex("qvec"))
      assert(q.forall(x => x >= -127 && x <= 127))
      vec.zip(q).foreach { case (x, xq) =>
        assert(math.abs(x - xq / s) <= 0.5 / s + 1e-9, s"dequant error at scale $s")
      }
    }
    // planted near-identical dup must survive quantization as the top-1
    val q = v.filter(col("id") < 5).select(col("id").as("qid"), col("vec").as("qvec"))
    val top1 = graft.ops.Quantize.bruteForceTopKQ(v, q, 1)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(top1 === (0 until 5).map(i => (i.toLong, 100L + i)).toSet)
  }

  test("PQ: codes well-formed, dup encodes identically, ADC ranks planted dup top") {
    val v = planted()
    val cb = graft.ops.Quantize.pqCodebook(v, m = 4, k = 16, dim = 64)
    assert(cb.length === 4 && cb.forall(_.length === 16) &&
      cb.forall(_.forall(_.length === 16)))
    val codes = graft.ops.Quantize.pqEncode(v, cb, dim = 64)
    val byId = codes.as[(Long, Seq[Long])].collect().toMap
    assert(byId.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 16)))
    // a near-identical duplicate must land on the same codewords
    (0 until 5).foreach(i => assert(byId(i.toLong) === byId(100L + i),
      s"dup ${100 + i} should encode like base $i"))
    // ADC: the planted dup of each query shares its codes, so it scores the
    // maximum possible LUT sum and must appear in the top ranks
    val queries = v.filter(col("id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
    val top = graft.ops.Quantize.pqAdcTopK(codes, queries, cb, k = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 3).foreach(i =>
      assert(top(i.toLong).contains(100L + i),
        s"ADC top-3 of query $i should contain its planted dup"))
  }

  test("near-dup pairs: threshold filters and i<j ordering") {
    val pairs = Similarity.nearDupPairs(planted(), 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.length >= 5)
  }

  test("semDedup: autoK density rule, keep-first semantics match brute force") {
    assert(Similarity.autoK(200) === 4)
    assert(Similarity.autoK(201) === 5)          // ceil division
    assert(Similarity.autoK(2000) === 40)
    assert(Similarity.autoK(10) === 4)           // clamp low
    assert(Similarity.autoK(1000000000L) === 4096) // codebook cap
    val v = planted() // 40 bases + near-identical dups of the first 5
    val tmp = java.nio.file.Files.createTempDirectory("graft_semdedup_spec")
      .toString + "/cents"
    val survivors = Similarity.semDedup(v, tmp, threshold = 0.9,
      targetClusterRows = 10).select("id", "cid")
      .as[(Long, Long)].collect().toMap
    // brute-force the contract: b is dropped iff some lower-id vector in
    // b's OWN cluster has cosine > t (keep-first at cluster scope) —
    // recompute assignments from the same trained artifact
    val k = Similarity.autoK(v.count(), 10)
    val cents = Similarity.centroidCodebook(v, tmp, k, iters = 2, init = "sample")
    val asg = Similarity.assign(v,
        cents.toSeq.toDF("cid", "cvec"))
      .as[(Long, Long)].collect().toMap
    val vecs = v.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val expectedSurvivors = vecs.keySet.filter { b =>
      !vecs.keySet.exists(a => a < b && asg(a) == asg(b) &&
        cos(vecs(a), vecs(b)) > 0.9)
    }
    assert(survivors.keySet === expectedSurvivors)
    // the planted near-identical dup of each base shares its cluster, so
    // keep-first must drop every 100+i and keep every base
    assert((0 until 5).forall(i => !survivors.contains(100L + i)))
    assert((0 until 40).forall(i => survivors.contains(i.toLong)))
    // survivors carry the same assignment the codebook produces
    survivors.foreach { case (id, cid) => assert(asg(id) === cid) }
  }

  test("kNN graph: planted dups are each other's top-1, ranks contiguous, k respected") {
    val g = Similarity.knnGraphLsh(planted(), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byId = g.groupBy(_._1)
    // every planted (base i, dup 100+i) pair ranks the other first with sim ~ 1
    (0 until 5).foreach { i =>
      val top = byId(i.toLong).minBy(_._2)
      assert(top._3 === 100L + i && top._4 > 0.99,
        s"base $i top-1 should be its planted dup: $top")
      val dtop = byId(100L + i).minBy(_._2)
      assert(dtop._3 === i.toLong && dtop._4 > 0.99)
    }
    // per-vector contract: <= k rows, ranks 1..m contiguous, sims non-increasing
    byId.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.length <= 3)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq.reverse.sorted.reverse === sorted.map(_._4).toSeq)
    }
  }

  test("two-level IVF: assignment bounded by probed cells, agrees with flat on clustered data") {
    // 8 well-separated modes x 25 members: fine centroids land on modes,
    // the coarse level groups them, and the coarse->fine path must find
    // the same fine cell as the flat scan for every vector
    val dim = 16
    val md = java.security.MessageDigest.getInstance("MD5")
    def mode(s: Int): Array[Float] = Array.tabulate(dim) { d =>
      val dg = md.digest(s"tl:$s:$d".getBytes("UTF-8")); dg(0) / 16.0f
    }
    val v = (0 until 200).map { i =>
      val m = mode(i % 8)
      (i.toLong, m.zipWithIndex.map { case (x, d) =>
        x + (if ((i + d) % 5 == 0) 0.01f else -0.01f) }.toSeq)
    }.toDF("id", "vec")
    val tmpF = java.nio.file.Files.createTempDirectory("graft_tl_f").toString + "/f"
    val tmpC = java.nio.file.Files.createTempDirectory("graft_tl_c").toString + "/c"
    val fine = Similarity.centroidCodebook(v, tmpF, k = 16, iters = 2, init = "sample")
    val fineDf = fine.toSeq.toDF("id", "vec")
    val coarse = Similarity.centroidCodebook(fineDf, tmpC, k = 4, iters = 2, init = "sample")
    // every fine centroid maps to exactly one coarse cell
    val f2c = Similarity.fineToCoarse(fine, coarse)
    assert(f2c.length === fine.length)
    assert(f2c.map(_._2).toSet.subsetOf(coarse.map(_._1).toSet))
    val two = Similarity.twoLevelAssign(v, fine, coarse, nprobe = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(two.size === 200, "every vector must be assigned")
    // ccid must be consistent with the chosen fine centroid's mapping
    val f2cMap = f2c.toMap
    two.foreach { case (_, (ccid, fcid)) => assert(f2cMap(fcid) === ccid) }
    // flat-scan agreement on cleanly clustered data: the probed path must
    // find the true cell for the overwhelming majority (boundary cases
    // only exist when modes straddle coarse cells)
    val fs = fine.sortBy(_._1)
    val flat = v.select(col("id"),
      graft.functions.VectorFunctions.nearest_centroids(col("vec"),
        fs.map(_._2.toArray), fs.map(_._1), 1).getItem(0).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = two.count { case (id, (_, fcid)) => flat(id) == fcid }
    assert(agree >= 190, s"expected >=95% flat agreement on separated modes, got $agree/200")
  }

  test("semDedup planted megacluster: per-cluster pair work bounded, min-id survives") {
    // one semantic mode 3x over the split cap (60 near-identical vectors,
    // cap = splitFactor 2 x target 10 = 20), plus 20 well-spread singles.
    // VERDICT r9 #1: past the autoK saturation point the exact in-cluster
    // all-pairs join would do n_c^2 work; the oversized cluster must
    // instead route through min-rep LSH verification
    val dim = 64
    def base(seed: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { d =>
        val dg = md.digest(s"mega:$seed:$d".getBytes("UTF-8"))
        (dg(0).toInt / 128.0f)
      }
    }
    val mode = base(0)
    val mega = (0 until 60).map { i =>
      // tiny deterministic perturbation: cosine to the mode stays ~1
      (i.toLong, mode.zipWithIndex.map { case (x, d) =>
        x + (if ((i + d) % 7 == 0) 1e-4f else 0f) }.toSeq)
    }
    val spread = (0 until 20).map(i => (1000L + i, base(i + 1).toSeq))
    val v = (mega ++ spread).toDF("id", "vec")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mega_spec")
      .toString + "/cents"
    val survivors = Similarity.semDedup(v, tmp, threshold = 0.9,
      targetClusterRows = 10, splitFactor = 2)
      .select("id", "cid").as[(Long, Long)].collect().toMap
    // keep-first: the megacluster collapses to its min id; every spread
    // single survives (nothing near it)
    assert(survivors.contains(0L))
    assert((1 until 60).count(i => survivors.contains(i.toLong)) === 0,
      s"megacluster members besides id 0 must all drop; got ${survivors.keySet}")
    assert((0 until 20).forall(i => survivors.contains(1000L + i)))
    // bounded work: the candidate set of the oversized cluster is
    // O(n_c * tables), nowhere near the n_c(n_c-1)/2 = 1770 of all-pairs —
    // near-identical vectors share every bucket, so it collapses to ~n_c-1
    val withCid = v.withColumn("cid", lit(0L))
    val cand = Similarity.minRepCandidatesInClusters(
      withCid.filter(col("id") < 60), lshTables = 16, bits = 6, dim = dim)
    val nCand = cand.count()
    assert(nCand <= 60L * 16, s"candidate count $nCand exceeds n_c*tables")
    assert(nCand < 1770 / 2, s"candidate count $nCand is not bounded below all-pairs")
  }

  test("mmrSelect: relevance leads, diversity penalizes the near-duplicate") {
    import spark.implicits._
    // pool for one query: ids 1,2 nearly identical (pair sim 0.99), id 3
    // less relevant but diverse. Greedy at lambda=0.7:
    //   r1: 0.7*0.95 = 0.665 -> id 1
    //   r2: id 2 = 0.7*0.94 - 0.3*0.99 = 0.361  vs id 3 = 0.7*0.80 - 0.3*0.10 = 0.53 -> id 3
    //   r3: id 2 (last one standing)
    val cand = Seq((7L, 1L, 0.95), (7L, 2L, 0.94), (7L, 3L, 0.80))
      .toDF("qid", "id", "simq")
    val ps = Seq(
      (7L, 1L, 2L, 0.99), (7L, 2L, 1L, 0.99),
      (7L, 1L, 3L, 0.10), (7L, 3L, 1L, 0.10),
      (7L, 2L, 3L, 0.12), (7L, 3L, 2L, 0.12))
      .toDF("qid", "id_x", "id_y", "sim")
    val got = Similarity.mmrSelect(cand, ps, lambda = 0.7, k = 3)
      .orderBy("sel_rank")
      .select("sel_rank", "id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // pure-relevance order would have been 1, 2, 3 — the penalty is live
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(cand, ps, lambda = 0.7, k = 0)
    }
  }

  test("mmrSelect: sparse pairSims — unmeasured pairs score penalty 0, not drop") {
    import spark.implicits._
    // id 3 has NO pairSims row against anything: an inner penalty join
    // would silently evict it from every round after the first; the
    // contract is penalty 0 (no measured overlap). Greedy at lambda=0.7:
    //   r1: id 1 (0.7*0.95). r2: id 2 = 0.7*0.94 - 0.3*0.99 = 0.361
    //       vs id 3 = 0.7*0.80 - 0 = 0.56 -> id 3. r3: id 2.
    val cand = Seq((7L, 1L, 0.95), (7L, 2L, 0.94), (7L, 3L, 0.80))
      .toDF("qid", "id", "simq")
    val ps = Seq((7L, 1L, 2L, 0.99), (7L, 2L, 1L, 0.99))
      .toDF("qid", "id_x", "id_y", "sim")
    val got = Similarity.mmrSelect(cand, ps, lambda = 0.7, k = 3)
      .orderBy("sel_rank")
      .select("sel_rank", "id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 3L), (3L, 2L)),
      "a candidate with no pair rows must survive with penalty 0")
  }
}
