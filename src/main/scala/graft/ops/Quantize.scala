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
