package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key with 10k rows + 50 cold keys
  private def skewed() = {
    val hot = (0 until 10000).map(i => ("hot", i % 97, 1.0))
    val cold = (0 until 50).flatMap(k => (0 until 10).map(i => (s"k$k", i, 2.0)))
    (hot ++ cold).toDF("k", "v", "x")
  }

  test("saltedSum equals plain groupBy sum") {
    val plain = skewed().groupBy("k")
      .agg(sum($"x").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val salted = Skew.saltedSum(skewed(), Seq("k"), "x")
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted === plain)
  }

  test("saltedCountDistinct equals exact countDistinct") {
    val plain = skewed().groupBy("k").agg(countDistinct($"v").as("d"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCountDistinct(skewed(), Seq("k"), "v")
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain join") {
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed().join(small, "k").groupBy("label").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(skewed(), small, "k").groupBy("label").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }
}
