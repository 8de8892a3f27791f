package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (the generalization of the reference's latest-price lookup,
  * SURVEY §2.3 note): for each left row, attach the latest right row with
  * `rightTime <= leftTime` (or `<` when strict) within the same keys.
  *
  * Implemented as tag → union → one window pass (`last(..., ignoreNulls)`)
  * instead of a range join: a single shuffle on the keys, a single sort by
  * time — the plan scales like any windowed aggregation and never
  * materializes candidate pairs. (Preference order per SURVEY §7.3: this is
  * "compose existing ops"; no custom SparkPlan needed.)
  */
object AsOf {

  /** @param keys        equality keys present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightTieBreak extra right-side ordering columns to make the
    *                    chosen row deterministic under time ties
    * @param strict      false → `rightTime <= leftTime`; true → strict `<`
    * @return left rows + struct column `asof` with the matched right row
    *         (null when no prior right row exists)
    */
  def joinPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightTieBreak: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    val lSchema = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rSchema = org.apache.spark.sql.types.StructType(right.schema.fields)
    // side ordering at equal times decides <= vs < : right rows sort before
    // the left row → visible in the (-∞, -1] frame → inclusive
    val rOrd = if (strict) 2 else 0
    // tie-break keeps native column types (a string cast would order
    // numeric ids lexicographically); struct ordering is field-wise
    val tieSchema = org.apache.spark.sql.types.StructType(
      rightTieBreak.map(c => right.schema(c)))
    val rTie =
      if (rightTieBreak.isEmpty) lit(0) else struct(rightTieBreak.map(col): _*)
    val lTie =
      if (rightTieBreak.isEmpty) lit(0) else lit(null).cast(tieSchema)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(rOrd).as("__o"), rTie.as("__tie"),
        struct(right.columns.map(col): _*).as("__r"),
        lit(null).cast(lSchema).as("__l")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__o"), lTie.as("__tie"),
        lit(null).cast(rSchema).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__o"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rTagged.union(lTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*"), col("__asof").as("asof"))
  }

  /** SQL table-function surface for the native as-of join, registered as
    * `graft_asof` by [[graft.GraftExtensions]] (via
    * `SparkSessionExtensions.injectTableFunction`):
    *
    * {{{ SELECT * FROM graft_asof('left_view', 'right_view',
    *                              'k1,k2', 'left_ts', 'right_ts'
    *                              [, 'tie1,tie2' [, strict]]) }}}
    *
    * Arguments are string literals naming catalog/temp-view relations and
    * columns; the builder runs during analysis, resolves both relations
    * through the session catalog, and emits the same resolved
    * [[graft.plans.AsOfJoinPlan]] as [[joinPriorNative]] — pure-SQL users
    * get the whole-operator extension without touching the DataFrame API. */
  private[graft] val tableFunctionBuilder:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { es =>
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.graft.Bridge
    require(es.length >= 5 && es.length <= 7,
      "usage: graft_asof(left, right, keys_csv, left_time, right_time" +
        "[, tie_csv[, strict]])")
    def str(i: Int): String = es(i).eval() match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"graft_asof: argument ${i + 1} must be a string literal, got $other")
    }
    def csv(i: Int): Seq[String] =
      str(i).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.active
    val strict = es.length == 7 && (es(6).eval() match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"graft_asof: strict must be a boolean literal, got $other")
    })
    Bridge.analyzed(joinPriorNative(
      spark.table(str(0)), spark.table(str(1)), csv(2), str(3), str(4),
      if (es.length >= 6) csv(5) else Nil, strict))
  }

  /** [[joinPrior]] semantics through the whole-operator extension stack
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]], SURVEY
    * §7.3 tier (c)): each side shuffles once with only its own columns and
    * a per-partition forward merge attaches the match — no union padding,
    * no window buffer. Registered via [[graft.GraftExtensions]]; this entry
    * point also self-registers the strategy on the live session so any
    * session can call it. */
  def joinPriorNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightTieBreak: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.{StructField, StructType}
    require(keys.nonEmpty,
      "as-of join requires at least one equality key (a keyless as-of is " +
        "a global ordered merge — sort both sides and use joinPrior)")
    val spark = left.sparkSession
    Bridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = Bridge.analyzed(left)
    val rPlan0 = Bridge.analyzed(right)
    // self-join safety: when both frames derive from the same source their
    // attribute ids collide (the ambiguity the analyzer resolves for
    // built-in joins) — re-alias the right side with fresh ids first
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output.filter(_.name == name) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]")
      case _ => throw new IllegalArgumentException(
        s"column '$name' is ambiguous (appears more than once)")
    }
    // the exec compares rows with orderings built from the LEFT types — a
    // type mismatch would compare raw encodings (int vs long layouts,
    // date-days vs timestamp-micros) and silently mis-join
    keys.foreach { k =>
      val (l, r) = (attr(lPlan, k), attr(rPlan, k))
      require(l.dataType == r.dataType,
        s"as-of key '$k' type mismatch: ${l.dataType.simpleString} vs ${r.dataType.simpleString}")
    }
    require(attr(lPlan, leftTime).dataType == attr(rPlan, rightTime).dataType,
      s"as-of time type mismatch: ${attr(lPlan, leftTime).dataType.simpleString} " +
        s"vs ${attr(rPlan, rightTime).dataType.simpleString}")
    val asofOut = AttributeReference("asof",
      StructType(rPlan.output.map(a => StructField(a.name, a.dataType, a.nullable))),
      nullable = true)()
    Bridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightTieBreak.map(attr(rPlan, _)), strict, asofOut))
  }
}
