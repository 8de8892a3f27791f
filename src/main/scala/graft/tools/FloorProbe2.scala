package graft.tools

object FloorProbe2 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    def bench(spark: SparkSession, tag: String): Unit = {
      def t(label: String)(f: => Unit): Unit = {
        (1 to 3).foreach(_ => f)
        val xs = (1 to 7).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
        }.sorted
        println(f"FLOOR2 [$tag] $label%-26s median=${xs(3)}%8.1fms min=${xs.head}%8.1fms")
      }
      t("range(1).noop") {
        spark.range(1).write.mode("overwrite").format("noop").save() }
      t("range(1).count") { spark.range(1).count() }
      t("range(1).collect") { spark.range(1).collect() }
      val cached = spark.range(1)
      t("same-DF re-noop") { cached.write.mode("overwrite").format("noop").save() }
    }
    val tuned = graft.core.GraftSession.tunedLocal("floor2", "/root/testdata/sf0.1", 32)
    bench(tuned, "tuned+ext")
    tuned.stop()
    val plain = SparkSession.builder().master("local[32]").appName("plain")
      .config("spark.ui.enabled", "false").getOrCreate()
    bench(plain, "stock")
    plain.stop()
  }
}
