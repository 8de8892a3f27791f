package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Ad-hoc plan dump (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 8)
    val df = graft.queries.Embeddings.q21EmbedNearDup(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    val plan = qe.executedPlan.toString
    println("EXCHANGES: " + "Exchange".r.findAllIn(plan).length)
    println("REUSED: " + "ReusedExchange|TableCacheQueryStage|reuse".r.findAllIn(plan).length)
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Generate") || l.contains("HashAggregate") || l.contains("Sort ") || l.contains("Scan ")).take(40).foreach(l => println("P: " + l.trim.take(150)))
    spark.stop()
  }
}
