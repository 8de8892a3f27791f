package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator extension stack for the as-of join (SURVEY §2.3 note;
  * preference tier (c) of §7.3: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through [[graft.GraftExtensions]]). Spark has no
  * native as-of join; the compose-built-ins form ([[graft.ops.AsOf.joinPrior]],
  * tier (a)) unions both sides into ONE wide shuffle — every left row carries
  * null-padded right columns and vice versa — then window-sorts the union.
  * This operator keeps the two sides separate: each shuffles only its own
  * columns (same bytes as a sort-merge join), and a per-partition forward
  * merge attaches the latest eligible right row in one pass. Same semantics,
  * strictly less shuffle I/O, and the canonical demonstration that the
  * engine's API surface extends to whole operators when composition runs out.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Seq[Attribute], strict: Boolean,
    asofOut: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofOut

  // `asof` is produced here, not consumed from a child — without this it
  // counts as a reference and CheckAnalysis reports it missing from input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOut)

  // the output struct embeds the ENTIRE right row, so every right column
  // is consumed even though no expression names it — without this,
  // ColumnPruning's generic case (Project over any node prunes the node's
  // children to `child.references ++ p.references`) strips unreferenced
  // right columns and the struct layout no longer matches `asofOut`'s
  // type. Left columns stay prunable: `output` recomputes from the pruned
  // left child and unused left columns SHOULD be dropped before the
  // shuffle.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    super.references ++ right.outputSet

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (and idempotently through
  * `experimental.extraStrategies` for sessions built without extensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, strict, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, strict, out) :: Nil
    case _ => Nil
  }
}

/** Merge-based as-of join: requires both children clustered on the keys
  * (`EnsureRequirements` inserts/reuses the exchanges and checks
  * co-partitioning, exactly as for a sort-merge join) and sorted within
  * partitions by (keys, time[, tie-break]). Execution is then a single
  * forward pass per partition: advance the right iterator while its row is
  * still `<=` (or `<` when strict) the current left row's time within the
  * same key, holding the last advanced row — among equal right times the
  * sort puts the greatest tie-break last, matching the window form's
  * `last(...)` pick. Null ordering follows the sorts (nulls first): a
  * null-time right row is eligible for every left row of its key, and a
  * null-time left row matches only null-time right rows — identical to the
  * union/window formulation. Per-key state is ONE held row, so memory is
  * O(1) regardless of key cardinality or skew; each side shuffles once with
  * its own columns only.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Seq[Attribute], strict: Boolean,
    asofOut: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOut)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTieBreak.map(SortOrder(_, Ascending))))

  // left rows pass through in their clustered + sorted order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    // the right row is emitted verbatim as the `asof` struct value: its
    // layout must match the declared struct type exactly, or reads are
    // silently misaligned — fail loudly if any rule pruned/reordered it
    require(rOut.map(_.dataType) ==
        asofOut.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
          .fields.toSeq.map(_.dataType),
      s"as-of right child layout ${rOut.map(_.dataType)} diverged from " +
        s"declared struct ${asofOut.dataType.simpleString}")
    val lKeyExprs: Seq[Expression] = leftKeys
    val rKeyExprs: Seq[Expression] = rightKeys
    val lTimeExpr: Expression = leftTime
    val rTimeExpr: Expression = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val isStrict = strict
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeB = BindReferences.bindReference(lTimeExpr, lOut)
      val rTimeB = BindReferences.bindReference(rTimeExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val ta = new GenericInternalRow(1)
      val tb = new GenericInternalRow(1)
      def cmpTime(a: Any, b: Any): Int = {
        ta.update(0, a); tb.update(0, b); timeOrd.compare(ta, tb)
      }
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val wrap = new GenericInternalRow(1)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // sorted-iterator rows are reused buffers: anything retained across
        // next() calls (the lookahead and the held match) must be copied
        private var rHeadRow: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var held: InternalRow = _
        private var heldKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeB.eval(l)
          var done = false
          while (!done) {
            if (rHeadRow == null) {
              if (rIter.hasNext) {
                rHeadRow = rIter.next().copy()
                rHeadKey = rKeyProj(rHeadRow).copy()
              } else done = true
            }
            if (!done) {
              val c = keyOrd.compare(rHeadKey, lKey)
              if (c < 0) {
                // left is sorted too: this right key can never match again
                rHeadRow = null; rHeadKey = null
              } else if (c == 0) {
                val ct = cmpTime(rTimeB.eval(rHeadRow), lTime)
                if (if (isStrict) ct < 0 else ct <= 0) {
                  held = rHeadRow; heldKey = rHeadKey
                  rHeadRow = null; rHeadKey = null
                } else done = true
              } else done = true
            }
          }
          val asof =
            if (held != null && keyOrd.compare(heldKey, lKey) == 0) held else null
          wrap.update(0, asof)
          numOut += 1
          resultProj(joined(l, wrap))
        }
      }
    }
  }
}
