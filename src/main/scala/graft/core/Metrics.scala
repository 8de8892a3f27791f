package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability (reference §2.11: row-count logs per load,
  * `DB_manager.py:125,136`): a `QueryExecutionListener` capturing per-action
  * execution metrics — rows output, files/bytes read, duration — keyed by
  * an action name the caller scopes with [[Metrics.named]]. Engine-native
  * replacement for the reference's print statements; in production these
  * feed structured logs/dashboards.
  */
final class Metrics extends QueryExecutionListener {

  final case class Snapshot(name: String, durationMs: Long, rowsOut: Long,
      filesRead: Long, bytesRead: Long)

  private val captured = TrieMap.empty[String, Snapshot]
  @volatile private var current = "unnamed"

  /** Scope the next action(s) under `name`. Listener delivery is async, so
    * the scope stays active until its snapshot lands (bounded wait) —
    * without this, fast actions would be attributed to the default scope. */
  def named[T](name: String)(f: => T): T = {
    current = name
    try f
    finally {
      val deadline = System.currentTimeMillis() + 5000
      while (!captured.contains(name) && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      current = "unnamed"
    }
  }

  def apply(name: String): Option[Snapshot] = captured.get(name)
  def all: Map[String, Snapshot] = captured.toMap

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    val m = qe.executedPlan.collectLeaves()
      .flatMap(_.metrics.toSeq)
    def sumOf(key: String) = m.collect {
      case (k, v) if k == key => v.value
    }.sum
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
      .getOrElse(sumOf("numOutputRows"))
    captured.put(current, Snapshot(current, durationNs / 1000000L, rows,
      sumOf("numFiles"), sumOf("filesSize"))): Unit
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()
}

object Metrics {
  /** Install a listener on the session; returns the handle to query. */
  def install(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.listenerManager.register(m)
    m
  }
}
