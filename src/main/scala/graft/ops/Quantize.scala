package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the memory/bandwidth
  * lever of a 100 TB vector store: a 64-dim float32 embedding is 256 B;
  * quantized to int8-range ints plus one scale it carries the same
  * ranking signal at a quarter of the scan bytes (int8 storage), and the
  * similarity kernel becomes EXACT integer arithmetic.
  *
  * Quantization: scale = 127 / max|v_i| (zero vectors guarded), q_i =
  * floor(v_i·scale + 0.5) — round-half-up spelled as floor(+0.5) because
  * engines disagree on round()'s tie rule but never on floor.
  *
  * Ranking: cosine is SCALE-FREE over the quantized vectors —
  * cos(q_a, q_b) = dot_i(q_a,q_b) / (√dot_i(q_a,q_a)·√dot_i(q_b,q_b)) —
  * so top-k needs no dequantization at all; every dot is an order-free
  * long sum, which makes quantized queries trivially engine-portable
  * (the DuckDB oracle reproduces them exactly, no float-fold contract).
  */
object Quantize {

  /** Per-row quantization: adds `qvec` (array<int> in [-127, 127]) and
    * `qscale` (double; dequantize with v ≈ q / qscale). */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = lit(127.0) / greatest(maxAbs, lit(1e-30))
    df.withColumn("qscale", scale)
      .withColumn("qvec",
        transform(v, x => floor(x.cast("double") * col("qscale") + lit(0.5)).cast("int")))
  }

  /** Exact integer dot of two quantized vectors (long). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_i(a, b)

  /** Scale-free cosine over quantized vectors. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  // ---- Product quantization (PQ): the billion-scale ANN memory format ---

  /** Deterministic PQ codebook: `k` codewords per subspace, the s-th
    * subvectors of the hex8-ranked seed sample (the q35/q92 "sample"-init
    * discipline, tag '#pq'). Training-free by design — the gate certifies
    * encode + ADC serving arithmetic and the serving plan shape; Lloyd
    * refinement would move the codewords, not the plan. Returned shape:
    * cb(s)(c) = subvector (dim/m floats); driver-bounded at m·k·dim/m =
    * k·dim floats. */
  def pqCodebook(vectors: DataFrame, m: Int, k: Int, dim: Int): Array[Array[Array[Float]]] = {
    val sub = dim / m
    val seeds = vectors
      .orderBy(TrainingMix.hex8(concat(col("id").cast("string"), lit("#pq"))), col("id"))
      .limit(k).select(col("vec"))
      .collect().map(_.getSeq[Float](0).toArray)
    Array.tabulate(m)(s => seeds.map(v => v.slice(s * sub, (s + 1) * sub)))
  }

  /** PQ encode: per subspace, the argmax-dot codeword id (the IVF
    * assignment metric, [[graft.functions.CentroidUtil]] tie-break = min
    * code on equal dot). One native codegen'd projection per subspace —
    * the corpus is scanned ONCE, nothing shuffles; at 100 TB the encoded
    * table is dim/m·⌈log₂k⌉ bits per subspace vs 32·dim bits raw (64× for
    * 4×16 over 64 float dims). Output: (id, codes: array<bigint>[m]). */
  def pqEncode(vectors: DataFrame, cb: Array[Array[Array[Float]]], dim: Int): DataFrame = {
    val m = cb.length
    val sub = dim / m
    val ids = Array.tabulate(cb(0).length)(_.toLong)
    val codeCols = (0 until m).map { s =>
      graft.functions.VectorFunctions.nearest_centroids(
        slice(col("vec"), s * sub + 1, sub), cb(s), ids, 1).getItem(0)
    }
    vectors.select(col("id"), array(codeCols: _*).as("codes"))
  }

  /** ADC (asymmetric distance computation) top-k: per query, a lookup
    * table w[s][c] = ⟨q_s, cb(s)(c)⟩ is computed driver-side (m·k doubles
    * — tiny by construction) and broadcast; each encoded vector's score is
    * then a pure m-term table lookup — no float vector is ever touched at
    * serving time. Scores are fp9 fixed-point longs so the m-term sum is
    * reduction-order-free and engine-portable. Plan: one projection over
    * the codes table + a per-query top-k window on (qid, id, score)
    * triples. */
  def pqAdcTopK(codes: DataFrame, queries: Seq[(Long, Array[Float])],
      cb: Array[Array[Array[Float]]], k: Int): DataFrame = {
    val m = cb.length
    val sub = cb(0)(0).length
    val spark = codes.sparkSession
    import spark.implicits._
    val lutRows = queries.map { case (qid, qv) =>
      val lut: Seq[Seq[Long]] = cb.zipWithIndex.map { case (cws, s) =>
        cws.map { cw =>
          var acc = 0.0
          var i = 0
          while (i < sub) { acc += qv(s * sub + i).toDouble * cw(i).toDouble; i += 1 }
          // HALF_UP (away from zero) = SQL round() on both engines;
          // math.round would differ on negative half-ties
          java.math.BigDecimal.valueOf(acc * 1e9)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        }.toSeq
      }.toSeq
      (qid, lut)
    }
    val luts = lutRows.toDF("qid", "lut")
    val score = aggregate(
      sequence(lit(0), lit(m - 1)), lit(0L),
      (acc, s) => acc + element_at(element_at(col("lut"), s + 1),
        (element_at(col("codes"), s + 1) + 1).cast("int")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("score_fp9").desc, col("id"))
    codes.crossJoin(broadcast(luts))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), score.as("score_fp9"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("vec_id"), col("score_fp9"))
  }

  /** Brute-force top-k by quantized cosine: same plan shape as
    * [[Similarity.bruteForceTopK]] (broadcast query side, WindowGroupLimit
    * top-k) with the int kernel; at equal plans the scan side is 4× fewer
    * bytes when vectors are stored quantized. */
  def bruteForceTopKQ(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = quantize(vectors, "vec")
      .select(col("id"), col("qvec"),
        sqrt(dotQ(col("qvec"), col("qvec")).cast("double")).as("qnorm"))
    val q = quantize(queries, "qvec")
      .select(col("qid"), col("qvec").as("qqvec"),
        sqrt(dotQ(col("qvec"), col("qvec")).cast("double")).as("qqnorm"))
    val joined = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (dotQ(col("qvec"), col("qqvec")).cast("double") /
          (col("qnorm") * col("qqnorm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("sim"))
  }
}
