package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * North-star extension (SURVEY §1.3/§7.3): brute-force cosine top-k as the
  * exact baseline, and a random-hyperplane LSH variant as the 100 TB scale
  * path (bucket-join instead of cross-join: candidates shrink from |Q|·|V|
  * to the bucket collision set; each table is one shuffle on a short
  * signature key).
  *
  * All kernels are higher-order-function expressions (`zip_with` /
  * `aggregate`) — codegen'd, no UDFs, and the sequential fold order makes
  * results bit-deterministic across engines.
  */
object Similarity {

  /** Dot product of two float-array columns, in double: codegen'd native
    * expression ([[graft.functions.DotProductF]]); same sequential fold as
    * the HOF form ([[dotHof]]), so results are bit-identical. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_f(a, b)

  /** Reference HOF implementation (interpreted; kept for cross-checking the
    * native kernel in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column, in double. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two numeric array columns, in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param vectors (id, vec) candidate set — the big side; scanned once
    * @param queries (qid, qvec) query set — must be small; broadcast
    *
    * Plan shape: broadcast-nested-loop of the tiny query side against the
    * distributed candidate scan, then a per-qid top-k window. At scale the
    * window shuffles only (qid, id, sim) triples, never the vectors.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms once per vector, not once per pair: cosine = dot/(norm·qnorm)
    // is the same arithmetic (sqrt of the same sums), just hoisted
    val v = vectors.withColumn("norm", l2Norm(col("vec")))
    val q = queries.withColumn("qnorm", l2Norm(col("qvec")))
    val joined = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (dot(col("vec"), col("qvec")) / (col("norm") * col("qnorm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("sim"))
  }

  /** All pairs (i < j) with cosine above `threshold` — embedding near-dup
    * detection. O(n²) pairs: correct-but-small-scale baseline; at 100 TB use
    * [[lshCandidates]] to block first. */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val withNorm = vectors.withColumn("norm", l2Norm(col("vec")))
    val a = withNorm.select(col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a"))
    val b = withNorm.select(col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b"))).as("sim"))
      .filter(col("sim") > threshold)
  }

  /** Deterministic ±1 hyperplanes derived from md5 — engine-portable, so an
    * external engine (the DuckDB oracle) can reproduce every signature:
    * coefficient (t, b, d) is +1 iff the low bit of the first hex digit of
    * `md5("hp:t:b:d")` is set. Random-sign projections are a standard LSH
    * family for cosine (agreement probability 1 − θ/π per bit, like
    * Gaussian hyperplanes), and ±1 coefficients keep every dot product an
    * exact ± fold of the input floats — no rounding asymmetry between
    * engines at the sign decision. */
  private[graft] def planes(nTables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Array[Float]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(nTables)(t => Seq.tabulate(bitsPerTable)(b => Array.tabulate(dim) { d =>
      val dg = md.digest(s"hp:$t:$b:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (((dg(0) >> 4) & 1) == 1) 1f else -1f
    }))
  }

  /** Sign-random-projection signature: one integer per table whose bits
    * are `sign(vec · plane_b)`. Declarative form — used only as the spec
    * cross-check of the native kernel ([[graft.functions.LshSigUtil]]):
    * at production table counts the expression tree falls out of
    * whole-stage codegen and runs interpreted, ~100× slower. */
  private[graft] def signature(vec: Column, tablePlanes: Seq[Array[Float]]): Column =
    tablePlanes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (idc, vc, table, sig) rows: all `nTables` signatures computed by the
    * native kernel in ONE scan, posexploded — not a per-table union (which
    * would rescan the input nTables times), not an expression tree (which
    * would fall out of codegen). */
  private def withSignatures(df: DataFrame, idc: String, vc: String,
      nTables: Int, bitsPerTable: Int, dim: Int): DataFrame =
    df.select(col(idc), col(vc),
      posexplode(graft.functions.VectorFunctions.lsh_signatures(
        col(vc), nTables, bitsPerTable, dim)).as(Seq("table", "sig")))

  /** LSH near-dup pairs: vectors sharing a full signature in any table,
    * with exact cosine verified above `threshold`. Each table is an
    * equi-join on (table, sig) — never a cross join; cosine is computed
    * per collision and only (id_a, id_b, sim) survives to the distinct,
    * so the shuffles carry triples, not vectors.
    *
    * Default 16 tables × 6 bits targets the high-sim dedup regime: recall
    * ≈ 99.97% at cosine 0.9, ≈ 99% at 0.8 (1−(1−p^6)^16, p = 1−θ/π). At
    * the noise floor (θ → 90°) recall decays — candidates-then-verify is
    * a blocking scheme, not an exact all-pairs search ([[nearDupPairs]]
    * stays the exact baseline for tests).
    *
    * Sizing at scale: per-table work is Σ_buckets n_b², so `bitsPerTable`
    * must grow with log₂(n) to keep bucket density (n/2^bits) constant —
    * the defaults give ~30 rows/bucket at n=2000; use ~25 bits at n=10⁹
    * and raise `nTables` to hold the recall target. */
  def lshNearDupCandidates(vectors: DataFrame, nTables: Int = 16,
      bitsPerTable: Int = 6, dim: Int = 64, threshold: Double = 0.0): DataFrame = {
    val sigs = withSignatures(vectors, "id", "vec", nTables, bitsPerTable, dim)
    // candidate pairs DISTINCT first, verify after: near-dup corpora are
    // clustered, so a pair collides in up to nTables buckets — verifying
    // per collision multiplies the cosine work nTables× (measured 28s vs
    // 3s at 20k clustered vectors). The distinct shuffles bare (id_a,
    // id_b) longs; vectors join back once per unique pair.
    val a = sigs.select(col("table"), col("sig"), col("id").as("id_a"))
    val b = sigs.select(col("table"), col("sig"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("table", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(vectors.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vectors.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("sim"))
      .filter(col("sim") > threshold)
  }

  /** Density-ruled signature width: the smallest b in [4, 28] with
    * targetBucketRows·2ᵇ ≥ n (= ceil(log₂(n / targetBucketRows)) clamped).
    * Holding expected bucket occupancy constant keeps per-table verify
    * work Σ n_b² LINEAR in n — with a fixed width, occupancy grows with n
    * and in-bucket pairs grow ~n²/2^bits (the superlinear q21/q65 growth
    * SCALING_r8.md measures at the pinned gate geometry). 28 bits caps
    * the signature well inside the long.
    *
    * Deliberately INTEGER arithmetic, not a floating log: the width is
    * part of the q73 oracle contract, and `ceil(log2(n/target))` computed
    * in doubles can flip by one when n/target sits on a power of two —
    * the integer comparison is exact in any engine. */
  def autoBits(n: Long, targetBucketRows: Int = 30): Int = {
    var b = 4
    while (b < 28 && (targetBucketRows.toLong << b) < n) b += 1
    b
  }

  /** [[lshNearDupCandidates]] with the signature width chosen by the
    * density rule from the ACTUAL corpus size (one count job up front —
    * the production entry point when n is not known a priori; the fixed-
    * width overload remains for oracle-pinned geometries). Recall at a
    * given cosine depends on bitsPerTable (p^bits per table), so
    * `nTables` may need to rise with the width to hold a recall target:
    * 1 − (1 − p^bits)^nTables. */
  def lshNearDupCandidatesAuto(vectors: DataFrame, nTables: Int = 16,
      dim: Int = 64, threshold: Double = 0.0,
      targetBucketRows: Int = 30): DataFrame =
    lshNearDupCandidates(vectors, nTables,
      autoBits(vectors.count(), targetBucketRows), dim, threshold)

  /** Approximate kNN GRAPH over the whole corpus — every vector's top-k
    * cosine neighbors among its LSH-bucket candidates (the structure
    * graph-based curation builds on: degree/connectivity audits,
    * diversity sampling, SemDeDup-style neighborhood analysis). Unlike
    * [[lshTopK]] there is no broadcastable query side — every vector is
    * a query — so candidates come from the symmetric bucket join
    * (distinct (a,b) pairs in BOTH directions), exact cosine re-ranks
    * them, and a per-vector window keeps k. Signature width follows the
    * [[autoBits]] density rule, so candidate work stays linear in n;
    * the shuffles carry (id, id, sim) triples, never vectors.
    *
    * Recall caveat (the q21 note): vectors whose true neighbors never
    * share a bucket miss them — candidates-then-rerank is the blocking
    * scheme, and isolated vectors may return < k (or zero) rows. */
  def knnGraphLsh(vectors: DataFrame, k: Int, nTables: Int = 16,
      dim: Int = 64, targetBucketRows: Int = 30): DataFrame = {
    val bits = autoBits(vectors.count(), targetBucketRows)
    val sigs = withSignatures(vectors, "id", "vec", nTables, bits, dim)
      .select(col("table"), col("sig"), col("id"))
    val a = sigs.select(col("table"), col("sig"), col("id").as("id_a"))
    val b = sigs.select(col("table"), col("sig"), col("id").as("id_b"))
    val cand = a.join(b, Seq("table", "sig"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val scored = cand
      .join(vectors.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vectors.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("sim"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("sim").desc, col("id_b"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id_a").as("id"), col("rank"),
        col("id_b").as("neighbor_id"), col("sim"))
  }

  /** Contrastive hard-negative mining: for each vector, the `k` most
    * cosine-similar vectors carrying a DIFFERENT label — the standard
    * candidate generator for metric-learning / contrastive training sets
    * (a near neighbor under a conflicting label is exactly the pair the
    * loss needs most). Candidates come from the same symmetric
    * auto-geometry bucket join as [[knnGraphLsh]]; the label rides the
    * signature rows (one int per row) so conflicting-label filtering runs
    * on the bucket join output BEFORE any vector re-join — same-label
    * pairs (the vast majority inside a semantic bucket) are never scored.
    * Shuffles carry (id, label, id, label) quads and then scored triples,
    * never vectors. Same recall caveat as [[knnGraphLsh]]: this is
    * blocking + rerank, not exact search.
    *
    * @param vectors (id, vec, label)
    */
  def hardNegatives(vectors: DataFrame, k: Int, nTables: Int = 16,
      dim: Int = 64, targetBucketRows: Int = 30): DataFrame = {
    val bits = autoBits(vectors.count(), targetBucketRows)
    val sigs = vectors.select(col("id"), col("label"),
      posexplode(graft.functions.VectorFunctions.lsh_signatures(
        col("vec"), nTables, bits, dim)).as(Seq("table", "sig")))
    val a = sigs.select(col("table"), col("sig"), col("id"), col("label"))
    val b = sigs.select(col("table"), col("sig"),
      col("id").as("neg_id"), col("label").as("neg_label"))
    val cand = a.join(b, Seq("table", "sig"))
      .filter(col("label") =!= col("neg_label"))
      .select(col("id"), col("label"), col("neg_id"), col("neg_label"))
      .distinct()
    val scored = cand
      .join(vectors.select(col("id"), col("vec")), Seq("id"))
      .join(vectors.select(col("id").as("neg_id"), col("vec").as("neg_vec")),
        Seq("neg_id"))
      .select(col("id"), col("label"), col("neg_id"), col("neg_label"),
        cosine(col("vec"), col("neg_vec")).as("sim"))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("neg_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("label"), col("rank"),
        col("neg_id"), col("neg_label"), col("sim"))
  }

  /** Loser ids for keep-first near-dup dedup at bucket granularity: each
    * vector is verified only against the MIN-id member of each bucket it
    * lands in (≤ nTables comparisons per vector), never pair-exhaustively.
    * In a tight duplicate cluster the min member verifies against all
    * others, so per-cluster work drops from O(c²) to O(c·nTables) — at
    * 20k clustered vectors that is ~300k cosines instead of ~4M pairs
    * (the pair-enumeration op [[lshNearDupCandidates]] is output-bound
    * there by the 4M-pair answer itself). Slightly conservative: a vector
    * is dropped only when it matches a bucket-min — the standard
    * large-scale keep-first practice. */
  def lshNearDupLosersMinRep(vectors: DataFrame, nTables: Int = 16,
      bitsPerTable: Int = 6, dim: Int = 64, threshold: Double = 0.0): DataFrame = {
    val sigs = withSignatures(vectors, "id", "vec", nTables, bitsPerTable, dim)
      .select(col("table"), col("sig"), col("id")) // window shuffles no vectors
    val w = Window.partitionBy(col("table"), col("sig"))
    val cand = sigs.withColumn("min_id", min(col("id")).over(w))
      .filter(col("id") =!= col("min_id"))
      .select(col("id"), col("min_id"))
      .distinct()
    cand
      .join(vectors.select(col("id"), col("vec")), Seq("id"))
      .join(vectors.select(col("id").as("min_id"), col("vec").as("min_vec")), Seq("min_id"))
      .filter(cosine(col("vec"), col("min_vec")) > threshold)
      .select(col("id"))
      .distinct()
  }

  // ---- IVF (inverted-file) ANN: the partition-pruned scale path --------

  /** Lloyd-refined centroids from a deterministic init. All steps are
    * DataFrame ops: assignment is an argmin over a broadcast centroid
    * table (min over (dist, cid) structs — deterministic tie-break), the
    * update step averages per (cid, dim) via posexplode and rebuilds the
    * arrays. Returns (cid, cvec: array<float>).
    *
    * init = "parallel" (default): k-means‖; ceil(log₂ k) (≤5) distributed
    * rounds, each ONE Spark job ending in a bounded ≤2k-row collect —
    * driver work no longer scales with k the way the former per-centroid
    * farthest-point loop did (k sequential jobs). init = "sample": one
    * job, deterministic hash-ordered pseudo-random sample — the right
    * choice for k ≳ 4096, where the ‖-init's O(k·candidates) driver-side
    * reduction would dominate. */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int = 2,
      init: String = "parallel"): DataFrame = {
    val spark = vectors.sparkSession
    val chosen: Vector[Seq[Float]] = init match {
      case "sample" =>
        // md5-ordered pseudo-random sample — engine-portable (the IVF
        // oracle replays the same ordering), deterministic at any
        // parallelism
        vectors
          .orderBy(TrainingMix.hex8(concat(col("id").cast("string"), lit("#ivf"))), col("id"))
          .limit(k).select(col("vec"))
          .collect().map(_.getSeq[Float](0)).toVector
      case "parallel" => parallelInit(vectors, k)
      case other => throw new IllegalArgumentException(
        s"unknown init '$other' (expected 'parallel' or 'sample'; " +
          "the former 'farthest' init was replaced by 'parallel')")
    }
    import spark.implicits._
    // centroids live on the driver between iterations (k rows, k·dim
    // floats — driver-bounded by design): each Lloyd pass is then ONE
    // distributed job whose assignment is a native projection against the
    // constant centroid matrix — no vectors×centroids row explosion, no
    // extra shuffle — and the returned table is already materialized, so
    // consumers never re-run training through a lazy lineage (measured
    // 12× recompute at 20k vectors / k=64 before).
    var cents: Vector[(Long, Seq[Float])] =
      chosen.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    (0 until iters).foreach { _ =>
      val assigned = assignByMatrix(vectors, cents)
      // mean per (cid, dim) with an ORDER-FREE exact sum: values rounded
      // to 6 decimals and summed as DECIMAL, so the result is identical
      // under any partitioning/ordering — and in any engine (same trick
      // as the q22 centroid gate); one cast back to float at the end
      val updated = assigned.join(vectors, "id")
        .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(round(col("v").cast("double"), 6).cast("decimal(18,6)"))
          .cast("double") / count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m").cast("float")).as("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
      // a centroid that attracted zero vectors keeps its previous
      // position — the standard Lloyd convention; rebuilding only from
      // assigned clusters would silently SHRINK the codebook below k on
      // duplicate-heavy corpora and skew every consumer sized against k
      cents = cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    cents.toDF("cid", "cvec")
  }

  /** Train-once centroid ARTIFACT: production IVF trains offline and
    * serves search against a stored centroid table — the q35 gate now
    * mirrors that split (round-6 "do this" #3: training ran inside the
    * timed query every pass). Trains and writes the parquet artifact at
    * `path` only when absent (checked via the `_SUCCESS` marker, so a
    * half-written dir retrains), then reads it back. Floats round-trip
    * parquet bit-exactly and training is deterministic, so results are
    * identical whether this run trained or reused. */
  def centroidArtifact(vectors: DataFrame, path: String, k: Int,
      iters: Int = 2, init: String = "parallel"): DataFrame = {
    val spark = vectors.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaPath = new org.apache.hadoop.fs.Path(path, "_graft_centroid_meta")
    val meta = s"kmeans k=$k iters=$iters init=$init"
    // rebuild when absent OR when the parameter fingerprint is missing
    // (a pre-guard artifact has unknowable parameters); a present-but-
    // mismatched fingerprint is a caller error and fails fast below
    val complete = fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
    if (!complete || !fs.exists(metaPath)) {
      trainCentroids(vectors, k, iters, init)
        .write.mode("overwrite").parquet(path)
      val out = fs.create(metaPath, true)
      try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else {
      // serving an existing artifact with different training parameters
      // must fail, not silently hand back e.g. a 16-centroid table to a
      // caller who asked for 64 (same guard as Dedup.sigIndexMeta)
      val in = fs.open(metaPath)
      val stored =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      require(stored == meta,
        s"centroid artifact at $path was built with [$stored] but is being " +
          s"served with [$meta]; delete the artifact or match the parameters")
    }
    // memoized: the artifact path is content-keyed (or parameter-guarded
    // above), so the file set behind it is immutable — see
    // Tables.readCachedParquet
    graft.core.Tables.readCachedParquet(spark, Seq(path))
  }

  /** Driver-resident codebook memo: production IVF serving holds the
    * (k-row) centroid matrix in memory — re-reading the artifact and
    * re-collecting it per query would add two driver jobs to every
    * search. Keyed by artifact path, which embeds the source data's
    * len+mtime ([[graft.queries.Embeddings]]), so a regenerated dataset
    * can never hit a stale entry; bounded by the handful of distinct
    * codebooks a JVM serves. */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Seq[Float])]]()

  /** [[centroidArtifact]] collected to the driver once per JVM: the
    * serving-side codebook for [[ivfTopK]]'s array overload. */
  def centroidCodebook(vectors: DataFrame, path: String, k: Int,
      iters: Int = 2, init: String = "parallel"): Array[(Long, Seq[Float])] =
    // keyed by path AND parameters: the artifact guard rejects a
    // parameter mismatch on disk, and this key prevents the in-JVM memo
    // from serving a codebook trained under different parameters
    codebookCache.computeIfAbsent(s"$path|k=$k|iters=$iters|init=$init", _ =>
      centroidArtifact(vectors, path, k, iters, init)
        .select(col("cid"), col("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1))

  /** Native nearest-centroid assignment: (id, cid) via a single projection
    * against the driver-held centroid matrix (sorted by cid, so the
    * kernel's position tie-break equals the (−dot, cid) struct-min
    * ordering of [[assign]], which specs cross-check). */
  /** Incremental IVF ingest: assign a NEW embedding batch to an EXISTING
    * codebook (no retrain — the codebook is the stable artifact; postings
    * accrue per ingest) and append (id, cid, batch_id) posting rows to the
    * index at `indexPath` with the exactly-once [[BatchIndex]] protocol.
    * Re-ingesting a committed batch is a no-op; a crashed ingest's
    * partial files are invisible to serving and cleaned on retry.
    *
    * 100 TB shape: per-ingest cost is ONE projection over the batch
    * against the driver-held k-row matrix — the corpus-sized index is
    * never read, rewritten, or shuffled on append. Serving reads the
    * committed posting rows ([[readIvfIndex]]) and joins them to vectors
    * on id, or keeps vectors alongside postings by widening the batch
    * frame before ingest. */
  def ivfIngest(batch: DataFrame, indexPath: String,
      cents: Array[(Long, Seq[Float])], batchId: Long): Unit =
    BatchIndex.appendBatch(
      assignByMatrix(batch, cents.toSeq)
        .withColumn("batch_id", lit(batchId)),
      indexPath, batchId, meta = s"ivf_postings k=${cents.length}")

  /** Committed view of an [[ivfIngest]] posting index. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame =
    BatchIndex.readCommitted(spark, indexPath)

  private def assignByMatrix(vectors: DataFrame,
      cents: Seq[(Long, Seq[Float])]): DataFrame = {
    val sorted = cents.sortBy(_._1)
    val matrix = sorted.map(_._2.toArray).toArray
    val ids = sorted.map(_._1).toArray
    vectors.select(col("id"),
      graft.functions.VectorFunctions.nearest_centroids(col("vec"), matrix, ids, 1)
        .getItem(0).as("cid"))
  }

  /** k-means‖ seeding (Bahmani et al., VLDB'12, public algorithm):
    * ceil(log₂ k) rounds of distance-weighted oversampling (ℓ = 2k per
    * round, A-Res weighted reservoir keys from a salted hash — fully
    * deterministic), then a deterministic weighted farthest-point
    * reduction of the ~ℓ·rounds candidates to k on the driver. Every
    * round is one distributed pass; no per-centroid jobs. */
  private def parallelInit(vectors: DataFrame, k: Int): Vector[Seq[Float]] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    if (k <= 1)
      return Vector(vectors.orderBy(col("id")).limit(1)
        .select(col("vec")).collect().head.getSeq[Float](0))
    val l = 2 * k
    val rounds = math.min(5, 32 - Integer.numberOfLeadingZeros(k - 1)) // ceil(log2 k)
    var chosen: Vector[Seq[Float]] = Vector(
      vectors.orderBy(col("id")).limit(1)
        .select(col("vec")).collect().head.getSeq[Float](0))
    for (r <- 1 to rounds) {
      val cents = chosen.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("cid", "cvec")
      val d2 = vectors.crossJoin(broadcast(cents))
        .select(col("id"), col("vec"),
          (dot(col("vec"), col("vec")) - lit(2.0) * dot(col("vec"), col("cvec")) +
            dot(col("cvec"), col("cvec"))).as("dd"))
        .groupBy(col("id"))
        .agg(min(col("dd")).as("d2"), first(col("vec")).as("vec"))
      // A-Res weighted sampling: top-ℓ by ln(u)/weight with u hashed from
      // (id, round) — selection probability ∝ d², reproducible everywhere
      val u = (pmod(xxhash64(col("id"), lit(r)), lit(1000000007L)).cast("double") + lit(1.0)) /
        lit(1000000009.0)
      val sampled = d2.filter(col("d2") > 1e-12)
        .select(col("id"), col("vec"), (log(u) / col("d2")).as("key"))
        .orderBy(col("key").desc, col("id")).limit(l)
        .select(col("vec")).collect().map(_.getSeq[Float](0))
      chosen = chosen ++ sampled
    }
    // weight candidates by the number of points they attract, then reduce
    // deterministically: heaviest first, then argmax weight·dist²-to-chosen
    val weights = assignByMatrix(vectors,
        chosen.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .groupBy(col("cid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cands = chosen.map(_.toArray).toArray
    val w = Array.tabulate(cands.length)(i => weights.getOrElse(i.toLong, 0L).toDouble)
    def dist2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val picked = scala.collection.mutable.ArrayBuffer(
      w.indices.minBy(i => (-w(i), i)))
    val minD2 = Array.tabulate(cands.length)(i => dist2(cands(i), cands(picked.head)))
    while (picked.size < k && picked.size < cands.length) {
      val next = minD2.indices.minBy(i => (-w(i) * minD2(i), i))
      if (w(next) * minD2(next) <= 0) {
        // remaining candidates are duplicates of picked ones — stop early
        picked ++= minD2.indices.filterNot(picked.contains).take(k - picked.size)
      } else {
        picked += next
        var i = 0
        while (i < cands.length) {
          val d = dist2(cands(i), cands(next))
          if (d < minD2(i)) minD2(i) = d
          i += 1
        }
      }
    }
    picked.map(i => cands(i).toSeq).toVector
  }

  /** Declarative nearest-centroid assignment: cross join + argmin via min
    * over (negDot, cid) structs. Kept as the spec cross-check of
    * [[assignByMatrix]] — the cross join materializes |V|·k rows, which
    * the native projection avoids entirely. */
  private[graft] def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .select(col("id"),
        struct((-dot(col("vec"), col("cvec"))).as("d"), col("cid")).as("dc"))
      .groupBy(col("id"))
      .agg(min(col("dc")).getField("cid").as("cid"))

  /** IVF top-k: vectors are bucketed by nearest centroid once (build
    * side); each query probes its `nprobe` nearest centroids and reranks
    * exactly inside those buckets only — candidate count drops from |V| to
    * |V|·nprobe/k, and the bucket join replaces the cross join. Both
    * assignments run as native projections against the (k-row,
    * driver-bounded) centroid matrix. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      centroids: DataFrame, nprobe: Int = 2): DataFrame =
    ivfTopK(vectors, queries, k,
      centroids.select(col("cid"), col("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1),
      nprobe)

  /** [[ivfTopK]] against a driver-resident codebook (serving shape: no
    * centroid job at all — the search is ONE distributed pass). */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      cents: Array[(Long, Seq[Float])], nprobe: Int): DataFrame = {
    val matrix = cents.map(_._2.toArray)
    val ids = cents.map(_._1)
    val buckets = vectors.select(col("id"), col("vec"),
      l2Norm(col("vec")).as("norm"),
      graft.functions.VectorFunctions.nearest_centroids(col("vec"), matrix, ids, 1)
        .getItem(0).as("cid"))
    val probes = queries.select(col("qid"), col("qvec"),
        l2Norm(col("qvec")).as("qnorm"),
        explode(graft.functions.VectorFunctions.nearest_centroids(
          col("qvec"), matrix, ids, nprobe)).as("cid"))
    val cand = buckets.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (dot(col("vec"), col("qvec")) / (col("norm") * col("qnorm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("sim"))
  }

  // ---- Two-level (coarse→fine) IVF codebook ----------------------------

  /** Driver-side nearest-coarse mapping for each FINE centroid — the same
    * (−dot, cid) selection (and the same sequential double fold) as
    * [[graft.functions.CentroidUtil.nearest]], so the mapping the engine
    * serves is bit-replayable by the oracle's `row_number` ordering.
    * ≤ 4096 × 4096 dots, driver-bounded by the per-level codebook caps. */
  private[graft] def fineToCoarse(fine: Array[(Long, Seq[Float])],
      coarse: Array[(Long, Seq[Float])]): Array[(Long, Long)] = {
    val cs = coarse.sortBy(_._1)
    fine.map { case (fcid, fv) =>
      var bestCid = -1L
      var bestD = 0.0
      var first = true
      cs.foreach { case (ccid, cv) =>
        val m = math.min(fv.length, cv.length)
        var s = 0.0
        var i = 0
        while (i < m) { s += fv(i).toDouble * cv(i).toDouble; i += 1 }
        val dj = -s
        if (first || (!dj.isNaN && (bestD.isNaN || dj < bestD))) {
          bestD = dj; bestCid = ccid; first = false
        }
      }
      (fcid, bestCid)
    }
  }

  /** Two-level IVF assignment (VERDICT r9 #3 — the k ≫ 4096 scale path):
    * a vector first picks its `nprobe` nearest COARSE cells (one native
    * projection against the ≤4096-row coarse matrix), then the nearest
    * FINE centroid among those mapped to the probed cells (a broadcast
    * equi-join on the cell id + a struct-min —
    * |V| · nprobe · k_fine/k_coarse expected rows, not |V| · k_fine).
    * Per-vector work falls from O(k_fine) to
    * O(k_coarse + nprobe · k_fine/k_coarse) ≈ O(√k_fine) at the balanced
    * setting, which is what lets the codebook grow past the flat-scan
    * cap toward billion-vector corpora (the standard IVF
    * coarse-quantizer layout; nprobe > 1 recovers the cell-boundary
    * vectors a single probe misassigns).
    *
    * Returns (id, ccid, fcid) where `ccid` is the cell of the CHOSEN
    * fine centroid. A vector none of whose probed cells attracted a fine
    * centroid is dropped (inner join) — the oracle replays the same
    * rule; with the balanced k settings the case does not arise at the
    * gated scale factors. */
  def twoLevelAssign(vectors: DataFrame, fine: Array[(Long, Seq[Float])],
      coarse: Array[(Long, Seq[Float])], nprobe: Int = 4): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val f2c = fineToCoarse(fine, coarse).toMap
    val cs = coarse.sortBy(_._1)
    val cMatrix = cs.map(_._2.toArray)
    val cIds = cs.map(_._1)
    val fineDf = fine.map { case (fcid, fv) => (fcid, fv, f2c(fcid)) }
      .toSeq.toDF("fcid", "fvec", "ccid")
    val vc = vectors.select(col("id"), col("vec"),
      explode(graft.functions.VectorFunctions.nearest_centroids(
        col("vec"), cMatrix, cIds, nprobe)).as("ccid"))
    val chosen = vc.join(broadcast(fineDf), Seq("ccid"))
      .select(col("id"),
        struct((-dot(col("vec"), col("fvec"))).as("d"), col("fcid")).as("dc"))
      .groupBy(col("id"))
      .agg(min(col("dc")).getField("fcid").as("fcid"))
    chosen
      .join(broadcast(f2c.toSeq.toDF("fcid", "ccid")), Seq("fcid"))
      .select(col("id"), col("ccid"), col("fcid"))
  }

  /** Approximate top-k via LSH tables: candidates = vectors sharing any
    * table signature with the query; exact cosine re-rank within them.
    * Signatures are md5-derived ([[planes]]) so the result is
    * oracle-reproducible; cosine is computed per collision and distinct
    * runs on (qid, id, sim) triples, never on vectors. */
  def lshTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      nTables: Int = 16, bitsPerTable: Int = 6, dim: Int = 64): DataFrame = {
    // distinct (qid, id) before the exact cosine — same collision-
    // multiplicity argument as [[lshNearDupCandidates]]
    val cand = withSignatures(vectors.select("id", "vec"), "id", "vec", nTables, bitsPerTable, dim)
      .join(broadcast(withSignatures(queries, "qid", "qvec", nTables, bitsPerTable, dim)),
        Seq("table", "sig"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
      .distinct()
    val scored = cand
      .join(vectors.select(col("id"), col("vec")), Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"), cosine(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("sim"))
  }

  // ---- SemDeDup: cluster-scoped semantic dedup -------------------------

  /** Density-ruled cluster count for [[semDedup]]: k = ceil(n / target)
    * clamped to [4, 4096]. The same occupancy argument as [[autoBits]] in
    * cluster space — holding expected cluster size constant keeps the
    * within-cluster pair enumeration Σ n_c² LINEAR in n (≈ n·target),
    * where a fixed k would grow it ~n²/k. Integer arithmetic so the
    * oracle derives the identical k from COUNT(*). The 4096 cap bounds
    * the driver-resident codebook (4096·dim floats), not the data. */
  def autoK(n: Long, targetClusterRows: Int = 50): Int = {
    val k = (n + targetClusterRows - 1) / targetClusterRows
    math.max(4L, math.min(4096L, k)).toInt
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public algorithm):
    * k-means-cluster the embedding corpus, then WITHIN each cluster drop
    * every vector whose cosine to a lower-id cluster-mate exceeds
    * `threshold` (keep-first). Semantic duplicates land in the same
    * cluster, so the pair enumeration is an equi-join on cid — never
    * corpus-wide all-pairs — and with [[autoK]] the expected per-cluster
    * work is constant, total work linear in n.
    *
    * Training reuses the q35-certified deterministic pipeline
    * ([[centroidCodebook]], "sample" init, order-free decimal Lloyd
    * updates), stored as a parquet artifact at `artifactPath` — at 100 TB
    * the codebook is trained once (typically on a sample) and served to
    * every ingest; serving here is one count + one projection + one
    * cid-equi-join.
    *
    * Skew hardening (VERDICT r9 #1): with [[autoK]] capped at 4096, a
    * 100-TB corpus (or one pathological semantic mode) grows expected
    * cluster size as n/4096, and the exact within-cluster pair join goes
    * Σ n_c² ≈ n²/4096 — quadratic exactly where huge inputs live. So the
    * pair enumeration is TWO-TIER by cluster size, split at
    * `splitFactor · targetClusterRows` rows:
    *
    *  - clusters at or under the cap (every cluster the density rule
    *    produces in the un-saturated regime — measured max 61 rows at
    *    sf0.1 vs the default cap of 400) run the exact all-pairs
    *    equi-join, unchanged: the oracle-certified semantics;
    *  - clusters OVER the cap switch to [[lshNearDupLosersMinRep]]-style
    *    min-rep verification scoped inside the cluster: each member is
    *    verified only against the min-id member of each (table, sig) LSH
    *    bucket it lands in, ≤ nTables cosines per vector — per-cluster
    *    work O(n_c · nTables) instead of O(n_c²), which is what survives
    *    a planted megacluster (near-identical vectors collide in EVERY
    *    bucket, so pair-enumeration there would re-create all-pairs; the
    *    min-rep form caps it by construction). Signature width follows
    *    the [[autoBits]] density rule on the largest oversized cluster.
    *    Slightly conservative (a member drops only on a bucket-min
    *    match) — the standard large-scale keep-first practice, and a
    *    megacluster above the cap means the corpus left the regime the
    *    exact form was certified for anyway.
    *
    * Returns the SURVIVORS as (id, cid) — keep-list plus cluster
    * assignment, so downstream can audit per-cluster retention. */
  def semDedup(vectors: DataFrame, artifactPath: String, threshold: Double,
      targetClusterRows: Int = 50, iters: Int = 2, splitFactor: Int = 8,
      lshTables: Int = 16, dim: Int = 64): DataFrame = {
    val k = autoK(vectors.count(), targetClusterRows)
    val cents = centroidCodebook(vectors, artifactPath, k, iters, init = "sample")
    val withCid = vectors
      .join(assignByMatrix(vectors, cents.toSeq), Seq("id"))
      .select(col("id"), col("vec"), col("cid"))
    // ≤ k ≤ 4096 rows by construction — driver-bounded
    val sizes = withCid.groupBy(col("cid")).agg(count(lit(1)).as("csize"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cap = splitFactor.toLong * targetClusterRows
    val bigCids = sizes.filter(_._2 > cap).map(_._1)
    val losersSmall = {
      val scoped =
        if (bigCids.isEmpty) withCid
        else withCid.filter(!col("cid").isInCollection(bigCids))
      val a = scoped.select(col("cid"), col("id").as("id_a"), col("vec").as("vec_a"))
      val b = scoped.select(col("cid"), col("id").as("id_b"), col("vec").as("vec_b"))
      a.join(b, Seq("cid"))
        .filter(col("id_a") < col("id_b") &&
          cosine(col("vec_a"), col("vec_b")) > threshold)
        .select(col("id_b").as("id"))
    }
    val losers =
      if (bigCids.isEmpty) losersSmall.distinct()
      else {
        val big = withCid.filter(col("cid").isInCollection(bigCids))
        val bits = autoBits(sizes.map(_._2).max)
        val cand = minRepCandidatesInClusters(big, lshTables, bits, dim)
        val losersBig = cand
          .join(vectors.select(col("id"), col("vec")), Seq("id"))
          .join(vectors.select(col("id").as("min_id"), col("vec").as("min_vec")),
            Seq("min_id"))
          .filter(cosine(col("vec"), col("min_vec")) > threshold)
          .select(col("id"))
        losersSmall.union(losersBig).distinct()
      }
    withCid.join(losers, Seq("id"), "left_anti")
      .select(col("id"), col("cid"))
  }

  /** The oversized-cluster candidate set of [[semDedup]], exposed for the
    * planted-megacluster spec: (id, min_id) pairs where `min_id` is the
    * minimum id of some (cid, table, sig) LSH bucket `id` lands in. At
    * most `lshTables` distinct rows per member BY CONSTRUCTION — a
    * megacluster of near-identical vectors (identical signatures in every
    * table) yields exactly n_c − 1 candidates, where pair enumeration
    * would yield n_c(n_c−1)/2. */
  private[graft] def minRepCandidatesInClusters(big: DataFrame,
      lshTables: Int, bits: Int, dim: Int): DataFrame = {
    val sigs = big.select(col("cid"), col("id"),
      posexplode(graft.functions.VectorFunctions.lsh_signatures(
        col("vec"), lshTables, bits, dim)).as(Seq("table", "sig")))
    val w = Window.partitionBy(col("cid"), col("table"), col("sig"))
    sigs.withColumn("min_id", min(col("id")).over(w))
      .filter(col("id") =!= col("min_id"))
      .select(col("id"), col("min_id"))
      .distinct()
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily select `k` results maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` — the diversity
    * re-rank RAG retrieval applies so the context window doesn't fill
    * with five copies of the same passage.
    *
    * Inputs: `cand(qid, id, simq)` — the per-query candidate pool (top-N
    * from any first-stage retriever) — and `pairSims(qid, id_x, id_y,
    * sim)` over that pool. `pairSims` need NOT be dense or symmetric:
    * a (candidate, selected) pair with no row scores penalty 0 (sims
    * are non-negative, so an absent pair means "no measured overlap"),
    * but a one-directional input must put `id_x` = the candidate side.
    * The greedy loop is inherently sequential in k
    * but each round is pool-sized dataframe work partitioned BY QUERY, so
    * a million queries re-rank in parallel and nothing ever leaves the
    * executors; k is small and fixed (the oracle unrolls it). Ties break
    * by id; round 1 has no penalty term by definition.
    *
    * @return (qid, sel_rank, id, score) — `score` the raw MMR objective
    */
  def mmrSelect(cand: DataFrame, pairSims: DataFrame,
      lambda: Double, k: Int): DataFrame = {
    require(k >= 1, s"mmrSelect: k must be >= 1, got $k")
    // packed per-query greedy (graft.functions.MmrUtil): ONE shuffle to
    // group each query's pool and pair rows, then the whole k-round
    // loop runs per row inside the executor. The previous k-round
    // dataframe form (window + join + checkpoint per round) computed
    // the same selection with 3k shuffles and k driver barriers —
    // measured ~6x slower at q179's shape and strictly worse at a
    // million queries, where per-query state is register-sized.
    // Penalty semantics unchanged and spec-pinned: absent pair rows
    // contribute nothing; no measured pair at all -> penalty 0.
    val pool = cand.groupBy(col("qid")).agg(
      sort_array(collect_list(struct(col("id"), col("simq")))).as("pool"))
    val pairs = pairSims.groupBy(col("qid")).agg(
      collect_list(struct(col("id_x"), col("id_y"), col("sim"))).as("pairs"))
    pool.join(pairs, Seq("qid"), "left")
      .select(col("qid"),
        explode(graft.functions.RerankFunctions.mmr_select(
          col("pool"), col("pairs"), lambda, k)).as("s"))
      .select(col("qid"), col("s.sel_rank"), col("s.id"), col("s.score"))
  }
}
