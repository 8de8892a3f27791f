package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Observability (reference §2.11: row-count logs per load,
  * `DB_manager.py:125,136`): a listener capturing per-action execution
  * metrics — rows output, files/bytes read, duration — keyed by an action
  * name the caller scopes with [[Metrics#named]]. Engine-native replacement
  * for the reference's print statements; in production these feed
  * structured logs/dashboards.
  *
  * Attribution rides on job tags, not shared mutable state: [[named]] tags
  * the calling thread, the tag is captured into every
  * `SparkListenerSQLExecutionStart` submitted from that thread, and the
  * matching `SparkListenerSQLExecutionEnd` (same executionId, carries the
  * `QueryExecution` and duration) resolves the scope. Concurrent named
  * scopes on different threads therefore cannot cross-attribute — the
  * weakness of the previous single `@volatile var` scheme, which pinned one
  * global "current" name.
  */
final class Metrics(spark: SparkSession) extends SparkListener {

  final case class Snapshot(name: String, durationMs: Long, rowsOut: Long,
      filesRead: Long, bytesRead: Long)

  private val captured = TrieMap.empty[String, Snapshot]
  private val seq = TrieMap.empty[String, Long] // bumps on every execution end
  private val startSeq = TrieMap.empty[String, Long] // bumps on every start
  private val scopeByExec = TrieMap.empty[Long, String]
  private val TagPrefix = "graft.metrics:"

  override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
    case s: SparkListenerSQLExecutionStart =>
      s.jobTags.find(_.startsWith(TagPrefix)).foreach { t =>
        val name = t.stripPrefix(TagPrefix)
        scopeByExec.put(s.executionId, name): Unit
        startSeq.updateWith(name)(v => Some(v.getOrElse(0L) + 1L)): Unit
      }
    case e: SparkListenerSQLExecutionEnd =>
      // the bus is ordered, so the Start mapping exists by now
      import org.apache.spark.sql.graft.Bridge
      val name = scopeByExec.remove(e.executionId).getOrElse("unnamed")
      val qe = Bridge.endQe(e)
      if (!Bridge.endFailed(e) && qe != null) {
        val m = qe.executedPlan.collectLeaves().flatMap(_.metrics.toSeq)
        def sumOf(key: String) = m.collect {
          case (k, v) if k == key => v.value
        }.sum
        val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
          .getOrElse(sumOf("numOutputRows"))
        captured.put(name, Snapshot(name, Bridge.endDurationNs(e) / 1000000L, rows,
          sumOf("numFiles"), sumOf("filesSize")))
      }
      // bump even on failure: [[named]]'s bounded wait must exit promptly
      // when the scoped action errors, not burn the full deadline
      seq.updateWith(name)(v => Some(v.getOrElse(0L) + 1L)): Unit
    case _ => ()
  }

  /** Scope the action(s) in `f` under `name`. Listener delivery is async,
    * so a bounded wait keeps the contract that the snapshot is queryable
    * on return; the wait watches a per-name capture COUNTER, not mere
    * presence — a reused scope name must not satisfy the wait with the
    * previous run's stale snapshot. Attribution itself never depends on
    * the wait. The wait is skipped when `f` throws (the caller is on the
    * error path; a failed execution end still bumps the counter), and
    * capped at a short grace window when no SQL execution was submitted
    * at all — a driver-only action must not burn the full deadline. */
  def named[T](name: String)(f: => T): T = {
    val tag = TagPrefix + name
    val before = seq.getOrElse(name, 0L)
    val beforeStart = startSeq.getOrElse(name, 0L)
    spark.sparkContext.addJobTag(tag)
    var ok = false
    try { val r = f; ok = true; r }
    finally {
      spark.sparkContext.removeJobTag(tag)
      if (ok) {
        val now = System.currentTimeMillis()
        val hard = now + 5000 // execution seen: wait for its End
        // none seen: grace for an in-flight Start only. Sized to survive a
        // busy listener bus (the deadline re-checks every tick, so a Start
        // that lands inside the grace window upgrades the wait to `hard`);
        // a bus lagging beyond this loses the snapshot — the bounded-wait
        // contract, traded against stalling every driver-only scope
        val soft = now + 1000
        def deadline = if (startSeq.getOrElse(name, 0L) != beforeStart) hard else soft
        // wait until every execution STARTED in this scope has ENDED, not
        // merely the first — f has returned, so all its Start/End events
        // are already posted to the (FIFO) bus; a scope wrapping k actions
        // must not return with action 1's snapshot while action k's End
        // overwrites it asynchronously. A multi-action scope's snapshot is
        // the LAST action's (each End overwrites the name's slot).
        def caughtUp = {
          val starts = startSeq.getOrElse(name, 0L)
          starts != beforeStart &&
            (seq.getOrElse(name, 0L) - before) >= (starts - beforeStart)
        }
        while (!caughtUp && System.currentTimeMillis() < deadline)
          Thread.sleep(10)
      }
    }
  }

  def apply(name: String): Option[Snapshot] = captured.get(name)
  def all: Map[String, Snapshot] = captured.toMap
}

object Metrics {
  /** Install a listener on the session; returns the handle to query. */
  def install(spark: SparkSession): Metrics = {
    val m = new Metrics(spark)
    spark.sparkContext.addSparkListener(m)
    m
  }
}
