package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def media() = Seq(
    MediaRow(1L, "video", "fake", Array[Byte](1, 2, 3, 4), 1920, 1080, 3000),
    MediaRow(2L, "image", "fake", Array[Byte](9, 8, 7), 640, 480, 0),
    MediaRow(3L, "audio", "fake", Array[Byte](5, 5, 5, 5, 5), 0, 0, 5000)
  ).toDS()

  test("decode: one frame per second, ≥1 for stills; binary schema intact") {
    val frames = decodeFrames(media(), new StubDecoder)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId(1L).length === 3)
    assert(byId(2L).length === 1)
    assert(byId(3L).length === 5)
    assert(frames.schema("pixels").dataType ===
      org.apache.spark.sql.types.BinaryType)
  }

  test("decode is deterministic across runs") {
    val a = decodeFrames(media(), new StubDecoder).collect()
      .map(f => (f.media_id, f.frame_no, f.pixels.toSeq)).sortBy(x => (x._1, x._2))
    val b = decodeFrames(media(), new StubDecoder).collect()
      .map(f => (f.media_id, f.frame_no, f.pixels.toSeq)).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling keeps every stride-th frame") {
    val frames = decodeFrames(media(), new StubDecoder)
    val sampled = sampleFrames(frames, 2).collect().filter(_.media_id == 3L)
    assert(sampled.map(_.frame_no).sorted.toSeq === Seq(0, 2, 4))
  }

  test("features flow into similarity search") {
    val feats = extractFeatures(decodeFrames(media(), new StubDecoder))
      .toDF().select(
        concat(col("media_id"), lit(1000).cast("long") * col("frame_no")).cast("long").as("id"),
        col("feature").as("vec"))
    val q = feats.limit(1).select(col("id").as("qid"), col("vec").as("qvec"))
    val topk = Similarity.bruteForceTopK(feats, q, 3)
    assert(topk.count() === 3)
  }

  test("resizeMeta: downscale only, aspect preserved") {
    val out = resizeMeta(media().toDF(), 960).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("out_width"), r.getAs[Int]("out_height")))).toMap
    assert(out(1L) === ((960, 540)))
    assert(out(2L) === ((640, 480))) // already smaller: untouched
  }
}
