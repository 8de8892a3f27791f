package graft.tools
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val spark = graft.core.GraftSession.local("probe", 4)
    println("nanosAsLong=" + spark.conf.get("spark.sql.legacy.parquet.nanosAsLong"))
    val e = graft.core.Tables.events(spark, dir)
    println("events.ts type = " + e.schema("ts").dataType)
    val df = graft.queries.AsOfQueries.q40RangeJoin(spark, dir)
    println("q40 rows=" + df.count())
    spark.stop()
  }
}
