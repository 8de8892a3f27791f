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

  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    inject("dot_f", classOf[DotProductF],
      es => DotProductF(es(0), es(1)))
    inject("min_hash_slices", classOf[MinHashSlicesExpr],
      es => MinHashSlicesExpr(es(0), intArg(es(1)), intArg(es(2))))
    inject("simhash_md5", classOf[SimHashMd5Expr],
      es => SimHashMd5Expr(es(0), intArg(es(1))))
    inject("token_quality", classOf[TokenQualityExpr],
      // SQL form uses the default English stopword profile
      es => TokenQualityExpr(es(0), TextOps.langProfiles.head._2))
    inject("lang_id", classOf[LangIdExpr],
      es => LangIdExpr(es(0), TextOps.langProfiles))
    inject("fingerprint_md5", classOf[FingerprintMd5Expr],
      es => FingerprintMd5Expr(es(0)))
    inject("distinct_shingles", classOf[DistinctShinglesExpr],
      es => DistinctShinglesExpr(es(0), intArg(es(1))))
  }
}
