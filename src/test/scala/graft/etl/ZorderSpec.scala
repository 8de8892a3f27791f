package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering ([[Lake.zorderWrite]]): the multi-dimensional
  * file-skipping property, measured on the files actually written.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def overlapping(env: Array[Row], c: String, lo: Long, hi: Long): Int =
    env.count { r =>
      val mn = r.getAs[Number](s"min_$c").longValue()
      val mx = r.getAs[Number](s"max_$c").longValue()
      mx >= lo && mn <= hi
    }

  test("zvalue interleaves bits: locality in either dimension clusters keys") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("x", "y")
    val z = df.select(Lake.zvalue(Seq(col("x"), col("y")),
      Seq((0L, 65535L), (0L, 65535L))).as("z")).as[Long].collect()
    assert(z(0) === 0L)
    assert(z(1) === 1L)           // x occupies even bit positions
    assert(z(2) === 2L)           // y occupies odd bit positions
    assert(z(3) === (1L << 32) - 1) // all 32 interleaved bits set
  }

  test("z-order clustering: a slice in EITHER dimension skips most files") {
    // 64k points uniform on a 256×256 grid, 16 files
    val n = 65536
    val grid = spark.range(n).select(
      (col("id") % 256).as("x"), floor(col("id") / 256).cast("long").as("y"))
    val zPath = tmpDir("zorder") + "/z"
    val linPath = tmpDir("zorder") + "/lin"
    Lake.zorderWrite(grid, Seq("x", "y"), zPath, nFiles = 16)
    // contrast: plain single-column sort clustering
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linPath)

    val zEnv = Lake.fileEnvelopes(spark, zPath, Seq("x", "y")).collect()
    val lEnv = Lake.fileEnvelopes(spark, linPath, Seq("x", "y")).collect()
    assert(zEnv.length === 16 && lEnv.length === 16)

    // a 1/16-wide slice: z-order touches ~√16 = 4 files in EACH dimension
    // (allow slack for range-partition boundaries); the linear layout is
    // perfect on x but reads EVERY file for a y-slice
    val zx = overlapping(zEnv, "x", 0, 15)
    val zy = overlapping(zEnv, "y", 0, 15)
    val lx = overlapping(lEnv, "x", 0, 15)
    val ly = overlapping(lEnv, "y", 0, 15)
    assert(zx <= 8, s"z-order x-slice touches $zx/16 files")
    assert(zy <= 8, s"z-order y-slice touches $zy/16 files")
    assert(lx <= 2, s"linear x-slice touches $lx/16 files")
    assert(ly === 16, s"linear layout cannot skip on y ($ly/16)")

    // clustering must not lose or duplicate rows
    assert(spark.read.parquet(zPath).count() === n)
    assert(spark.read.parquet(zPath).select(sum(col("x") + col("y") * 256)).head.getLong(0)
      === grid.select(sum(col("x") + col("y") * 256)).head.getLong(0))
  }

  test("zorderWrite fails descriptively on empty input and all-null cluster columns") {
    val dir = tmpDir("zorder-guard")
    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    val e1 = intercept[IllegalArgumentException](
      Lake.zorderWrite(empty, Seq("x", "y"), s"$dir/empty", 4))
    assert(e1.getMessage.contains("no min/max bounds"))
    val nulls = spark.range(10)
      .select(col("id").as("x"), lit(null).cast("long").as("y"))
    val e2 = intercept[IllegalArgumentException](
      Lake.zorderWrite(nulls, Seq("x", "y"), s"$dir/nulls", 4))
    assert(e2.getMessage.contains("'y'"))
  }
}
