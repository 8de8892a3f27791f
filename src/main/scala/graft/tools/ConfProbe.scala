package graft.tools
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("probe", 4)
    println("nanosAsLong=" + spark.conf.get("spark.sql.legacy.parquet.nanosAsLong"))
    val e = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    println("events.ts type = " + e.schema("ts").dataType)
    val df = graft.queries.AsOfQueries.q40RangeJoin(spark, "/root/testdata/sf0.001")
    println("q40 rows=" + df.count())
    spark.stop()
  }
}
