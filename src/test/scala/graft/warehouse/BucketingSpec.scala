package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
  }

  test("co-bucketed join plans with zero exchanges on either side") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.saveBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey")
    Bucketing.saveBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey")
    // forbid broadcast so the test exercises the SMJ path a big-big join takes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.cojoin(spark, "b_lineitem", "b_orders", "o_orderkey")
        .groupBy("o_orderstatus").count()
      val p = planOf(bucketed)
      val joinSection = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")

      // control: the same join on raw parquet must shuffle both sides
      val raw = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      assert(planOf(raw).contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem"): Unit
    }
  }
}
