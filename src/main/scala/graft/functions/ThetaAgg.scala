package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Mergeable theta sketches — the SET-OPERATION sketch family
  * (Dasgupta et al., "Theta-Sketch Framework", EDBT'16; KMV lineage).
  * HLL answers |A| and |A∪B|; theta additionally answers |A∩B| and
  * |A∖B| with proven error bounds, which is exactly the "shared users
  * between surfaces" / "novel users this week" analytics class. q111
  * approximates intersections by HLL inclusion–exclusion with compounded
  * error; the theta intersection is the principled estimator (error
  * scales with the INTERSECTION's own theta, not three union-sized
  * terms).
  *
  * Surface (injected by [[graft.GraftExtensions]], q87/KLL discipline):
  *   - `theta_sketch_agg(x, lgK)` → binary  (build over long keys)
  *   - `theta_union_agg(bin, lgK)` → binary (merge serialized sketches)
  *   - `theta_intersect(a, b)`    → binary  (set intersection)
  *   - `theta_summary(bin)`       → array<double> [est, lb2, ub2, lb3, ub3]
  *
  * Shuffle shape: partials ship as compact sketches (≤ ~16 KB at
  * lgK=12 regardless of input size) — per-batch artifacts union with no
  * raw re-scan, and below the nominal capacity the sketch is EXACT.
  * Determinism: the retained set is the k smallest hashes of the input
  * SET — order- and partitioning-independent, so estimates are stable
  * across shuffles (the DualConf gate relies on this).
  */
object ThetaOps {

  def emptyUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def fromBytes(bytes: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))

  def toUnion(bytes: Array[Byte], lgK: Int): Union = {
    val u = emptyUnion(lgK)
    u.union(fromBytes(bytes))
    u
  }

  def intersectBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(fromBytes(a))
    it.intersect(fromBytes(b))
    it.getResult.toByteArray
  }

  /** [estimate, lowerBound(2σ), upperBound(2σ), lowerBound(3σ),
    * upperBound(3σ)] — one call so all five numbers always come from the
    * same sketch view. In exact mode (theta = 1, below nominal capacity)
    * every bound collapses to the estimate, so `lb3 ≤ truth ≤ ub3`
    * doubles as an exactness assertion there and a ≥99.7%-coverage
    * bracket in estimation mode — the contract the q161/q162 gates
    * certify, robust across scale factors. */
  def summary(bytes: Array[Byte]): Array[Double] = {
    val sk = fromBytes(bytes)
    Array(sk.getEstimate, sk.getLowerBound(2), sk.getUpperBound(2),
      sk.getLowerBound(3), sk.getUpperBound(3))
  }
}

/** `theta_sketch_agg(x, lgK)`: build a theta sketch over a long column;
  * returns the compact serialized sketch. Nulls skipped. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg: lgK must be in [4, 26], got $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects a long column, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaOps.emptyUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = ThetaOps.toUnion(bytes, lgK)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_sketch_agg"
}

/** `theta_union_agg(bin, lgK)`: union serialized theta sketches — the
  * per-batch artifact merge path. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_union_agg: lgK must be in [4, 26], got $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects serialized theta sketches (binary), got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaOps.emptyUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(ThetaOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = ThetaOps.toUnion(bytes, lgK)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_union_agg"
}

/** `theta_intersect(a, b)`: serialized intersection of two sketches —
  * runs on grid-sized frames (one row per group pair). */
case class ThetaIntersectExpr(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect expects (binary, binary), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersectBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaOps.intersectBytes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_intersect"
}

/** `theta_summary(bin)`:
  * `[estimate, lowerBound(2σ), upperBound(2σ), lowerBound(3σ), upperBound(3σ)]`. */
case class ThetaSummaryExpr(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_summary expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(bytes: Any): Any =
    new GenericArrayData(ThetaOps.summary(bytes.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ThetaOps.summary($b))")

  override protected def withNewChildInternal(newChild: Expression): ThetaSummaryExpr =
    copy(child = newChild)
  override def prettyName: String = "theta_summary"
}

/** DataFrame-facing helpers + the SQL builder table (injected by
  * [[graft.GraftExtensions]], same no-drift discipline as TextFunctions).
  */
object ThetaFunctions {

  def theta_sketch_agg(c: Column, lgK: Int = 12): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(c), lgK).toAggregateExpression())

  def theta_union_agg(c: Column, lgK: Int = 12): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expression(c), lgK).toAggregateExpression())

  def theta_intersect(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectExpr(Bridge.expression(a), Bridge.expression(b)))

  def theta_summary(c: Column): Column =
    Bridge.column(ThetaSummaryExpr(Bridge.expression(c)))

  private[graft] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    Seq(
      "theta_sketch_agg" -> (es => ThetaSketchAgg(es(0), intArg(es(1)))),
      "theta_union_agg" -> (es => ThetaUnionAgg(es(0), intArg(es(1)))),
      "theta_intersect" -> (es => ThetaIntersectExpr(es(0), es(1))),
      "theta_summary" -> (es => ThetaSummaryExpr(es(0))))
  }

  /** Register SQL-facing names on a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
