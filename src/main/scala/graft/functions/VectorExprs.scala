package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the similarity hot path.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) is
  * interpreted per element — fine for one-off scoring, ~50× too slow inside
  * an O(n²) near-dup join. This expression compiles to a tight `for` loop
  * over the Tungsten `ArrayData` inside whole-stage codegen.
  *
  * Accumulation is sequential in index order, in double — bit-identical to
  * the HOF form and to the DuckDB oracle, so swapping it in changes nothing
  * observable but time.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // null on length mismatch (not silent min-length truncation): matches
  // the HOF zip_with+aggregate reference form, and a malformed embedding
  // surfaces as NULL instead of flowing on as a plausible partial dot
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Static kernel behind [[LshSignaturesExpr]]: all `nTables` sign-random-
  * projection signatures of a vector in one pass. The ±1 hyperplanes are
  * md5-derived exactly like [[graft.ops.Similarity.planes]] (same strings,
  * same low-bit-of-first-nibble sign) and cached per configuration; each
  * signature bit is the sign of a sequential index-order double fold —
  * bit-identical to [[DotProductF]] over the same plane, which is what the
  * DuckDB oracles replay.
  *
  * Exists because the equivalent expression tree (nTables × bits CASE
  * WHENs over dot products) exceeds whole-stage-codegen limits and falls
  * back to interpreted eval — measured ~0.6 ms/row at 16×9×64 vs ~6 µs
  * here. */
object LshSigUtil {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Float]]]()

  private def planesFor(nTables: Int, bits: Int, dim: Int): Array[Array[Float]] =
    cache.computeIfAbsent((nTables, bits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nTables * bits) { tb =>
        val t = tb / bits
        val b = tb % bits
        Array.tabulate(dim) { d =>
          val dg = md.digest(s"hp:$t:$b:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if (((dg(0) >> 4) & 1) == 1) 1f else -1f
        }
      }
    })

  def compute(vec: ArrayData, nTables: Int, bits: Int, dim: Int): ArrayData = {
    val ps = planesFor(nTables, bits, dim)
    val n = math.min(dim, vec.numElements())
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var s = 0.0
        var i = 0
        while (i < n) {
          s += vec.getFloat(i).toDouble * plane(i).toDouble
          i += 1
        }
        if (s >= 0) sig |= 1L << b
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd all-tables LSH signature array (see [[LshSigUtil.compute]]). */
case class LshSignaturesExpr(child: Expression, nTables: Int, bits: Int,
    dim: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    LshSigUtil.compute(v.asInstanceOf[ArrayData], nTables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshSigUtil.compute($c, $nTables, $bits, $dim)")

  override protected def withNewChildInternal(newChild: Expression): LshSignaturesExpr =
    copy(child = newChild)
}

/** Static kernel behind [[NearestCentroidsExpr]]: cids of the `n` nearest
  * centroids (max dot; tie-break lower position, with positions sorted by
  * cid) from a row-constant centroid matrix. Selection order equals
  * ordering by (−dot, cid) ascending — exactly the struct-min /
  * row_number ordering the declarative form and the DuckDB oracle use. */
object CentroidUtil {

  def nearest(vec: ArrayData, cents: Array[Array[Float]], ids: Array[Long],
      n: Int): ArrayData = {
    val k = cents.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      val m = math.min(vec.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < m) {
        s += vec.getFloat(i).toDouble * cv(i).toDouble
        i += 1
      }
      d(c) = -s
      c += 1
    }
    val take = math.min(n, k)
    val out = new Array[Any](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      // NaN-aware selection matching the declarative struct-min's total
      // order, where NaN sorts LAST (greater than +Infinity): a finite
      // candidate always beats a NaN one — whichever position the NaN
      // sits at — and an all-NaN row (vector with NaN components) still
      // assigns to the lowest-cid centroid via the first-seen seed
      var best = -1
      var bestD = 0.0
      var j = 0
      while (j < k) {
        if (!used(j)) {
          val dj = d(j)
          if (best == -1 || (!dj.isNaN && (bestD.isNaN || dj < bestD))) {
            bestD = dj; best = j
          }
        }
        j += 1
      }
      used(best) = true
      out(r) = ids(best)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd top-n nearest-centroid cids (see [[CentroidUtil]]). The
  * centroid matrix is a plan-time constant (k rows, driver-bounded by
  * design) — this replaces a vectors×centroids cross join + min-struct
  * aggregation with a single projection: no row explosion, no shuffle. */
case class NearestCentroidsExpr(child: Expression, cents: Array[Array[Float]],
    ids: Array[Long], n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  def compute(v: ArrayData): ArrayData = CentroidUtil.nearest(v, cents, ids, n)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

/** Codegen'd integer-array dot product in long — the kernel of the
  * quantized similarity path. Integer sums are EXACT and order-free, so
  * results are trivially identical across engines (no float-fold-order
  * contract needed, unlike [[DotProductF]]). */
case class DotProductI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i expects (array<int>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  // null on length mismatch — see [[DotProductF]]
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd float-array dot product in double. */
  def dot_f(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd int-array dot product in long (exact, order-free). */
  def dot_i(a: Column, b: Column): Column =
    Bridge.column(DotProductI(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd all-tables LSH signature array. */
  def lsh_signatures(vec: Column, nTables: Int, bits: Int, dim: Int): Column =
    Bridge.column(LshSignaturesExpr(Bridge.expression(vec), nTables, bits, dim))

  /** Codegen'd top-n nearest-centroid cids over a constant matrix. */
  def nearest_centroids(vec: Column, cents: Array[Array[Float]],
      ids: Array[Long], n: Int): Column =
    Bridge.column(NearestCentroidsExpr(Bridge.expression(vec), cents, ids, n))

  /** Register SQL-facing names (`SELECT dot_f(a, b)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
}
