package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tunedLocal("scratch", dir, 32)
    val span = graft.queries.DedupQueries.SpanWidth
    val docs = graft.core.Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), " "), t => t =!= "").as("toks"))
    val grams = toks.filter(size(col("toks")) >= span)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - lit(span - 1)),
        i => md5(concat_ws(" ", slice(col("toks"), i, lit(span)))))).as("g"))
    val counts = grams.groupBy("g").count()
    val total = grams.count()
    val distinctG = counts.count()
    val dupG = counts.filter(col("count") > 1).count()
    val dupOcc = counts.filter(col("count") > 1)
      .agg(sum(col("count"))).head.getLong(0)
    println(s"SCRATCH span=$span total=$total distinct=$distinctG dupGrams=$dupG dupOccurrences=$dupOcc singletonFrac=${(total - dupOcc).toDouble / total}")
    spark.stop()
  }
}
