package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here.
  *
  * Current contents: the q203 PPJoin candidate-count ladder — pairs
  * surviving (prefix), (prefix+length), (prefix+length+positional) —
  * the evidence line behind the positional-filter claim. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    for (dir <- args.toSeq match {
        case Nil => Seq("/root/testdata/sf0.1")
        case ds => ds
      }) {
      val toks = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), explode(array_distinct(
          graft.ops.TextOps.shingles(split(col("text"), " "), 3))).as("tok"))
        .localCheckpoint()
      val dfq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val pref = toks.join(dfq, Seq("tok")).join(sizes, Seq("doc_id"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
        .filter(col("rnk") <=
          col("sz") - ceil(lit(0.7) * col("sz")).cast("long") + 1)
        .select(col("tok"), col("doc_id"), col("sz"), col("rnk"))
      val a = pref.select(col("tok"), col("doc_id").as("id_a"),
        col("sz").as("sza"), col("rnk").as("pa"))
      val b = pref.select(col("tok"), col("doc_id").as("id_b"),
        col("sz").as("szb"), col("rnk").as("pb"))
      val base = a.join(b, Seq("tok")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("sza"), col("szb"))
        .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
        .localCheckpoint()
      val nPrefix = base.count()
      val lenF = base.filter(col("szb") * 10 >= col("sza") * 7 &&
        col("sza") * 10 >= col("szb") * 7)
      val nLen = lenF.count()
      val nPos = lenF.filter(lit(17) * (lit(1) + least(col("sza") - col("pa"),
        col("szb") - col("pb"))) >= lit(7) * (col("sza") + col("szb"))).count()
      println(s"SCRATCH $dir q203 candidates: prefix=$nPrefix " +
        s"prefix+length=$nLen prefix+length+positional=$nPos")
    }
    spark.stop()
  }
}
