package graft.tools

object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.tunedLocal("floor", sfDir, 32)
    import org.apache.spark.sql.functions._
    def t(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f)
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"FLOOR $label%-34s median=${xs(2)}%8.1fms min=${xs.head}%8.1fms")
    }
    t("range(1).noop (1 task)") {
      spark.range(1).write.mode("overwrite").format("noop").save() }
    t("range(1e6,32part).noop") {
      spark.range(1000000).repartition(32).write.mode("overwrite").format("noop").save() }
    t("lineitem scan count") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count() }
    t("lineitem full scan noop") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").write.mode("overwrite").format("noop").save() }
    t("documents scan noop") {
      spark.read.parquet(s"$sfDir/documents.parquet").write.mode("overwrite").format("noop").save() }
    t("lineitem groupBy 1-shuffle noop") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity"))).write.mode("overwrite").format("noop").save() }
    t("Tables.documents via graft") {
      graft.core.Tables.documents(spark, sfDir).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
