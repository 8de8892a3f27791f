package graft.etl

import graft.SparkSpec

class LakeCompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact collapses accreted small files to one per partition dir") {
    val root = tmpDir("lake")
    val dir = s"$root/stocks"
    def batch(day: Int, n: Int) =
      (0 until n).map(i => (2024, 6, day, s"T$i", 1.0 * i))
        .toDF("y", "m", "d", "ticker", "close")
    // three incremental appends → ≥3 files in repeated partitions
    (1 to 3).foreach { _ =>
      batch(3, 4).write.mode("append").partitionBy("y", "m", "d", "ticker").parquet(dir)
    }
    def filesPerDir: Map[String, Int] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getPath).map { case (k, v) => k -> v.size }
    }
    assert(filesPerDir.values.max >= 3)
    val before = spark.read.parquet(dir).collect().toSet

    Lake.compact(spark, dir, Seq("y", "m", "d", "ticker"))

    assert(filesPerDir.values.max === 1)
    assert(spark.read.parquet(dir).collect().toSet === before) // lossless
    assert(!new java.io.File(dir + ".compacting").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("compact heals a crash that left data parked at .old") {
    val root = tmpDir("lakecrash")
    val dir = s"$root/stocks"
    val df = Seq((2024, 6, 1, "T0", 1.0)).toDF("y", "m", "d", "ticker", "close")
    df.write.partitionBy("y", "m").parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet
    // simulate dying between compact's two renames: dir moved to .old,
    // replacement never landed
    graft.core.Fs.renameOverwrite(spark, dir, dir + ".old")
    assert(!new java.io.File(dir).exists())
    Lake.compact(spark, dir, Seq("y", "m"))
    assert(spark.read.parquet(dir).collect().toSet === before)
    assert(!new java.io.File(dir + ".old").exists())
  }
}
