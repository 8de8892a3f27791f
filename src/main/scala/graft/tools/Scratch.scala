package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.util.QueryExecutionListener
import graft.core.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 4)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case s: SparkListenerSQLExecutionStart =>
          println(s"SQLSTART execId=${s.executionId} tags=${s.jobTags}")
        case _ => ()
      }
    })
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        println(s"QEL onSuccess qe.id=${qe.id} func=$f")
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    spark.sparkContext.addJobTag("graft.metrics:mytag")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode("overwrite").format("noop").save()
    spark.sparkContext.removeJobTag("graft.metrics:mytag")
    Thread.sleep(3000)
    spark.stop()
  }
}
