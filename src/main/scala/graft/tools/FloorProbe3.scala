package graft.tools

object FloorProbe3 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    def bench(spark: SparkSession, tag: String): Unit = {
      def t(label: String)(f: => Unit): Unit = {
        (1 to 3).foreach(_ => f)
        val xs = (1 to 9).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
        }.sorted
        println(f"FLOOR3 [$tag] $label%-22s median=${xs(4)}%8.1fms min=${xs.head}%8.1fms")
      }
      t("range(1).noop") {
        spark.range(1).write.mode("overwrite").format("noop").save() }
      t("2-stage shuffle.noop") {
        spark.range(100).repartition(8).write.mode("overwrite").format("noop").save() }
    }
    val plain = SparkSession.builder().master("local[32]").appName("plain")
      .config("spark.ui.enabled", "false").getOrCreate()
    bench(plain, "stock-first")
    plain.stop()
    val noExt = SparkSession.builder().master("local[32]").appName("noext")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "30")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    bench(noExt, "tunedconf-noext")
    noExt.stop()
    val tuned = graft.core.GraftSession.tunedLocal("floor3", "/root/testdata/sf0.1", 32)
    bench(tuned, "tuned+ext")
    tuned.stop()
    val plain2 = SparkSession.builder().master("local[32]").appName("plain2")
      .config("spark.ui.enabled", "false").getOrCreate()
    bench(plain2, "stock-last")
    plain2.stop()
  }
}
