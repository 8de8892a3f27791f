package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class RangeJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sides() = {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
    (p, v)
  }

  test("bucketed interval join equals the naive range join") {
    val (p, v) = sides()
    val bucketed = RangeJoin.intervalJoin(p, v, "user_id", "p_ts", "v_ts", 3600)
      .select("p_id", "v_id")
    val naive = p.join(v, Seq("user_id"))
      .filter(col("v_ts") >= col("p_ts") - expr("INTERVAL 3600 SECONDS") &&
        col("v_ts") <= col("p_ts"))
      .select("p_id", "v_id")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() > 0)
  }

  test("plans as an equi-join, not a nested-loop join") {
    val (p, v) = sides()
    val df = RangeJoin.intervalJoin(p, v, "user_id", "p_ts", "v_ts", 3600)
    df.count()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
