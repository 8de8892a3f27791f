package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native kernel for greedy per-query re-ranking.
  *
  * The dataframe form of MMR runs k GLOBAL rounds — each a window, a
  * join, and an eager checkpoint — to pick one item per query per
  * round. That shape is correct but upside-down at scale: a million
  * queries each hold a ≤pool-sized problem that fits in a register
  * file, and the k-round form pays k driver barriers and 3k shuffles
  * to avoid per-row state. This expression runs the WHOLE greedy loop
  * per row over the packed (pool, pairs) arrays: one groupBy to pack,
  * one projection, one explode — per-query work never leaves the
  * executor, rounds cost array scans instead of shuffles.
  *
  * The objective is evaluated in the identical IEEE order as the
  * dataframe form and the DuckDB oracle's unrolled replay
  * (`lambda·simq − (1−lambda)·maxPen`, penalty = max over SELECTED of
  * the measured pair sim, absent pairs contribute nothing, no measured
  * pair at all → penalty 0), ties break by id ascending — so the swap
  * changes nothing observable but time. */
object MmrUtil {

  /** pool: (id, simq) rows; pairs: (id_x, id_y, sim) rows; returns
    * (sel_rank, id, score) rows of the greedy MMR selection. */
  def select(pool: ArrayData, pairs: ArrayData, lambda: Double, k: Int)
      : ArrayData = {
    val n = pool.numElements()
    val ids = new Array[Long](n)
    val simq = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = pool.getStruct(i, 2)
      ids(i) = r.getLong(0); simq(i) = r.getDouble(1)
      i += 1
    }
    val pairSim = new java.util.HashMap[Long, java.util.HashMap[Long, Double]]()
    i = 0
    val np = if (pairs == null) 0 else pairs.numElements()
    while (i < np) {
      val r = pairs.getStruct(i, 3)
      pairSim.computeIfAbsent(r.getLong(0), _ => new java.util.HashMap())
        .put(r.getLong(1), r.getDouble(2)): Unit
      i += 1
    }
    val taken = new Array[Boolean](n)
    val selIds = new Array[Long](math.min(k, n))
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(k, n))
    var round = 1
    var done = false
    while (round <= k && !done) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          // penalty: max measured sim against the selected set; rows
          // absent from pairs contribute nothing; none measured -> 0
          var pen = Double.NegativeInfinity
          if (round > 1) {
            val row = pairSim.get(ids(i))
            if (row != null) {
              var s = 0
              while (s < round - 1) {
                val v = row.get(selIds(s))
                if (v != null && v.doubleValue() > pen) pen = v.doubleValue()
                s += 1
              }
            }
          }
          val score =
            if (round == 1) lambda * simq(i)
            else lambda * simq(i) -
              (1.0 - lambda) * (if (pen.isNegInfinity) 0.0 else pen)
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      if (best < 0) done = true
      else {
        taken(best) = true
        selIds(round - 1) = ids(best)
        out += new GenericInternalRow(
          Array[Any](round.toLong, ids(best), bestScore))
        round += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `mmr_select(pool, pairs)` with constant (lambda, k): the packed
  * greedy loop of [[MmrUtil.select]]. CodegenFallback — the per-row
  * work is the loop itself, not expression glue, so codegen would buy
  * branch elimination on code that runs once per QUERY, not per token.
  */
case class MmrSelectExpr(pool: Expression, pairs: Expression,
    lambda: Double, k: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = pool
  override def right: Expression = pairs

  private def isStructArray(dt: DataType, fields: Int): Boolean = dt match {
    case ArrayType(s: StructType, _) => s.fields.length == fields
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStructArray(pool.dataType, 2) && isStructArray(pairs.dataType, 3))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mmr_select expects array<struct2>, array<struct3>; got " +
        s"${pool.dataType.simpleString}, ${pairs.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sel_rank", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = pool.nullable

  /** Custom eval (not nullSafe): a query with NO pair rows arrives with
    * a null pairs array from the left join — that is the empty-penalty
    * case, not a null result. */
  override def eval(input: InternalRow): Any = {
    val p = pool.eval(input)
    if (p == null) null
    else MmrUtil.select(p.asInstanceOf[ArrayData],
      pairs.eval(input).asInstanceOf[ArrayData], lambda, k)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelectExpr =
    copy(pool = newLeft, pairs = newRight)
}

object RerankFunctions {
  def mmr_select(pool: Column, pairs: Column, lambda: Double, k: Int): Column =
    Bridge.column(MmrSelectExpr(
      Bridge.expression(pool), Bridge.expression(pairs), lambda, k))
}
