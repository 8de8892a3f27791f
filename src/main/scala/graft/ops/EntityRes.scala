package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked entity resolution (record linkage): candidate pairs are generated
  * ONLY within a blocking key, then scored with a normalized edit-distance
  * similarity and thresholded. This is the classic Fellegi–Sunter-style
  * blocking+comparison pipeline, the step a catalog/ingest pipeline runs to
  * find listings that describe the same real-world entity under slightly
  * different names.
  *
  * Scale shape (the 100 TB argument): the ONLY shuffle is the equi-join on
  * the blocking key, and pair work is Σ_b n_b² over block sizes — bounded by
  * the blocking key's selectivity, never corpus². Blocking keys must be
  * chosen so blocks stay small (the gate's brand × size-bucket × type-word
  * key measures max 9 rows per block at sf0.1); a skewed block would be
  * visible in the block-size histogram and handled by refining the key, the
  * same discipline as LSH band tuning in [[Dedup]]. The similarity kernel
  * (`levenshtein`) is a codegen'd Spark built-in evaluated only on
  * surviving candidates.
  */
object EntityRes {

  /** Normalized Levenshtein similarity: 1 − lev(a,b) / max(len(a), len(b)).
    * One subtraction and one division over exact integers — bit-identical
    * in any IEEE engine, so oracle SQL can mirror it verbatim. */
  def nameSimilarity(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") / greatest(length(a), length(b))

  /** Candidate pairs within a blocking key, scored and thresholded.
    *
    * @param records  input with `idCol` (orderable id), `nameCol` (the
    *                 compared attribute), and `blockCols` (already-computed
    *                 blocking key columns)
    * @param minSim   keep pairs with similarity ≥ this
    * @return (id_a, id_b, sim_fp6) with id_a < id_b; sim_fp6 = sim × 1e6
    *         as a long (fixed-point, hash-stable cross-engine)
    */
  def blockedMatches(records: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double): DataFrame = {
    val base = records.select(
      (col(idCol) +: col(nameCol) +: blockCols.map(col)): _*)
    val a = base.select(
      (col(idCol).as("id_a") +: col(nameCol).as("name_a") +: blockCols.map(col)): _*)
    val b = base.select(
      (col(idCol).as("id_b") +: col(nameCol).as("name_b") +: blockCols.map(col)): _*)
    val sim = nameSimilarity(col("name_a"), col("name_b"))
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(sim * lit(1e6)).cast("long").as("sim_fp6"))
      .filter(col("sim_fp6") >= math.round(minSim * 1e6))
  }
}
