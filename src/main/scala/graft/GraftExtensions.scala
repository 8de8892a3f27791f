package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DistinctShinglesExpr, DotProductF, FingerprintMd5Expr, LangIdExpr, MinHashSlicesExpr, SimHashMd5Expr, TokenQualityExpr}
import graft.ops.TextOps

/** Session-extension entry point: makes the engine's native functions
  * available to pure-SQL users via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    inject("dot_f", es => DotProductF(es(0), es(1)))
    inject("dot_i", es => graft.functions.DotProductI(es(0), es(1)))
    // the Bloom runtime-filter primitives (ops.Bloom's SQL surface)
    graft.ops.Bloom.sqlBuilders.foreach {
      case (name, builder) => inject(name, builder)
    }
    // one builder table shared with TextFunctions.register — the live-
    // session and session-build registration paths cannot drift
    graft.functions.TextFunctions.sqlBuilders.foreach {
      case (name, builder) => inject(name, builder)
    }
    // mergeable KLL quantile sketches (build / union / query)
    graft.functions.KllFunctions.sqlBuilders.foreach {
      case (name, builder) => inject(name, builder)
    }
    // mergeable theta set-operation sketches (build / union / intersect)
    graft.functions.ThetaFunctions.sqlBuilders.foreach {
      case (name, builder) => inject(name, builder)
    }
    // whole-operator extension: the native as-of join's planner strategy
    // (logical node graft.plans.AsOfJoinPlan → merge-based AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // ... and its pure-SQL surface: FROM graft_asof('l','r','keys','lt','rt')
    ext.injectTableFunction((
      FunctionIdentifier("graft_asof"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_asof"),
      graft.ops.AsOf.tableFunctionBuilder))
  }
}
