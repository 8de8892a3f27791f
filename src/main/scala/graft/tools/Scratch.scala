package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here.
  *
  * Current contents: A/B of the q158 row-error fold forms — (A) fold
  * over an index sequence probing the PROJECTED qvec expression (does
  * CollapseProject inline the transform so it re-evaluates per probe?),
  * (B) zip_with over (vec, qvec) so qvec is evaluated once as the
  * zip's child, (C) form A over a spread scan.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tunedLocal("scratch", sfDir, 32)
    def base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    def agg(df: org.apache.spark.sql.DataFrame, err: org.apache.spark.sql.Column) =
      df.select(col("label"), size(col("vec")).cast("long").as("dims"),
          err.as("err_fp9"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("dims")).as("n_dims"),
          sum(col("err_fp9")).as("sum_err_fp9"))
    val v = col("vec")
    def formA(df: org.apache.spark.sql.DataFrame) = {
      val q = graft.ops.Quantize.quantize(df, "vec")
      agg(q, aggregate(
        sequence(lit(1), size(v)), lit(0L),
        (acc, i) => acc +
          round(abs(element_at(v, i).cast("double") -
            element_at(col("qvec"), i).cast("double") / col("qscale")) *
            lit(1e9)).cast("long")))
    }
    def formB(df: org.apache.spark.sql.DataFrame) = {
      val q = graft.ops.Quantize.quantize(df, "vec")
      agg(q, aggregate(
        zip_with(v, col("qvec"), (x, qq) =>
          round(abs(x.cast("double") - qq.cast("double") / col("qscale")) *
            lit(1e9)).cast("long")),
        lit(0L), (acc, e) => acc + e))
    }
    def time(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"AB $tag%-14s median=${ts(1)}%6.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // values must agree between forms
    val a = formA(base).collect().map(_.toSeq).sortBy(_.toString)
    val b = formB(base).collect().map(_.toSeq).sortBy(_.toString)
    println(s"AB values_equal=${a.toSeq == b.toSeq}")
    time("A_probe", () => formA(base))
    time("B_zipwith", () => formB(base))
    time("A_spread", () => formA(Tables.spread(base)))
    time("B_spread", () => formB(Tables.spread(base)))
    spark.stop()
  }
}
