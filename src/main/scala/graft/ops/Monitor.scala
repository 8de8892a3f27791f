package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-monitoring operators: distribution-drift metrics a training-data
  * pipeline runs on every snapshot (did src3's length profile shift since
  * the last crawl? is one source suddenly dominating a length band?).
  *
  * Population Stability Index (the standard model-monitoring drift score):
  * for each group g with per-bucket shares p_b and reference shares q_b,
  * PSI(g) = Σ_b (p_b − q_b) · ln(p_b / q_b). Buckets here are FIXED-WIDTH
  * (caller-supplied bucket expression), not quantile-derived: quantile
  * edges would need a second corpus pass, interpolate differently across
  * engines, and drift themselves — fixed edges keep the metric one-shuffle
  * and bit-reproducible. Laplace smoothing (+0.5 per bucket) makes empty
  * buckets finite, the standard PSI practice.
  *
  * Scale shape (100 TB): ONE corpus shuffle — `groupBy(group, bucket)
  * .count` with map-side partial aggregation — and everything downstream
  * operates on the (groups × buckets) grid, which is KB-sized by
  * construction. The grid cross-join broadcasts both sides.
  *
  * Float discipline: each bucket term is fixed-point-rounded to 1e-9
  * BEFORE the per-group sum, so the sum is an integer sum — associative,
  * partition-order-free, and identical in any engine (the q76 BM25
  * discipline).
  */
object Monitor {

  /** Per-group PSI of `bucket`'s distribution vs the whole-frame
    * distribution. Returns (group, n_docs, psi_fp9) — psi_fp9 is the PSI
    * scaled by 1e9 and summed as integers.
    *
    * @param bucket deterministic integral bucketing expression (e.g.
    *               `expr("n_chars div 100")`); transcendental-free edges
    *               keep it engine-reproducible.
    */
  def psiByGroup(df: DataFrame, groupCol: String, bucket: Column): DataFrame = {
    // the single corpus pass: counts per (group, bucket), partial-agg'd.
    // grp feeds FOUR consumers (src/bkt/tot and the grid's left join);
    // Spark does no common-subplan reuse across DataFrame references, so
    // without this barrier each branch would re-scan and re-aggregate the
    // corpus — 4 passes instead of 1 (PlanSpec pins the single scan). The
    // cached block is grid-sized (groups × buckets), KBs at any corpus.
    val grp = df.groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // everything below is grid-sized (groups × buckets)
    val src = grp.groupBy(col(groupCol)).agg(sum(col("c")).as("n_g"))
    val bkt = grp.groupBy(col("bucket")).agg(sum(col("c")).as("n_b"))
    val tot = bkt.agg(sum(col("n_b")).as("n"), count(lit(1)).as("nb"))

    val p = (coalesce(col("c"), lit(0L)) + lit(0.5)) /
      (col("n_g") + lit(0.5) * col("nb"))
    val q = (col("n_b") + lit(0.5)) / (col("n") + lit(0.5) * col("nb"))
    broadcast(src)
      .crossJoin(broadcast(bkt))
      .crossJoin(broadcast(tot))
      .join(grp, Seq(groupCol, "bucket"), "left")
      .select(
        col(groupCol), col("n_g"),
        round((p - q) * log(p / q) * lit(1e9)).cast("long").as("term_fp9"))
      .groupBy(col(groupCol))
      .agg(
        first(col("n_g")).as("n_docs"),
        sum(col("term_fp9")).as("psi_fp9"))
  }
}
