package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star extension): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The container has no codec libraries, so the actual decode is a
  * DETERMINISTIC STUB ([[StubDecoder]]) — a real deployment swaps in a
  * JNI/ffmpeg-backed [[MediaDecoder]] without touching the Spark plumbing,
  * which is the real thing being engineered here:
  *  - binary payloads stay in `binary` columns (Tungsten off-heap, never
  *    interpreted by Catalyst);
  *  - decode runs in `mapPartitions` so the decoder is initialized once per
  *    partition (codec contexts are expensive), and the iterator shape
  *    keeps memory at O(one media item), not O(partition);
  *  - partition sizing: media rows are large — repartition so
  *    rows_per_partition × avg_media_bytes stays under executor memory;
  *  - extracted features are `Array[Float]` columns that flow directly
  *    into [[Similarity]] (ANN / near-dup over frames).
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, format: String,
      bytes: Array[Byte], width: Int, height: Int, duration_ms: Long)

  case class Frame(media_id: Long, frame_no: Int, width: Int, height: Int,
      pixels: Array[Byte])

  case class MediaFeature(media_id: Long, frame_no: Int, feature: Array[Float])

  /** Codec abstraction. Implementations must be serializable and cheap to
    * construct on executors (heavy init goes in `open()`). */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def frames(row: MediaRow): Iterator[Frame]
  }

  /** STUB: stands in for a real codec. Emits one deterministic pseudo-frame
    * per second of duration, whose "pixels" are a keyed hash expansion of
    * the payload — stable across runs/executors, so tests can assert exact
    * results. Swap for an ffmpeg-backed decoder in production. */
  final class StubDecoder extends MediaDecoder {
    override def frames(row: MediaRow): Iterator[Frame] = {
      val n = math.max(1, (row.duration_ms / 1000).toInt)
      val seed = java.util.Arrays.hashCode(row.bytes)
      (0 until n).iterator.map { i =>
        val rng = new scala.util.Random(seed.toLong * 31 + i)
        val px = Array.fill(64)(rng.nextInt(256).toByte)
        Frame(row.media_id, i, row.width, row.height, px)
      }
    }
  }

  /** Decode → frames, one decoder per partition. */
  def decodeFrames(media: Dataset[MediaRow], decoder: MediaDecoder)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      rows.flatMap(decoder.frames)
    }
  }

  /** Frame sampling: keep every `stride`-th frame (cheap, pre-feature). */
  def sampleFrames(frames: Dataset[Frame], stride: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    frames.filter(f => f.frame_no % stride == 0)
  }

  /** Feature extraction stub: 16-dim float vector per frame from a rolling
    * byte statistic — deterministic; a real system plugs a vision encoder
    * here. Output feeds [[Similarity]] directly. */
  def extractFeatures(frames: Dataset[Frame])(
      implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    frames.map { f =>
      val feat = Array.tabulate(16) { d =>
        val slice = f.pixels.drop(d * 4).take(4)
        slice.map(_.toInt & 0xff).sum / 1024.0f
      }
      MediaFeature(f.media_id, f.frame_no, feat)
    }
  }

  /** Metadata-level resize: plan-only transform of the typed metadata
    * (physical pixel resize happens inside the decoder in a real system). */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    // greatest(..., 1): dimensionless media (audio) keeps scale 1 instead
    // of dividing by zero (ANSI mode throws)
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height"), lit(1)).cast("double"))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Partition media so each task holds ≈`targetBytes` of payload —
    * the knob that keeps decode tasks memory-bounded at 100 TB. */
  def repartitionBySize(media: DataFrame, avgMediaBytes: Long,
      targetBytes: Long = 256L << 20): DataFrame = {
    val rowsPerPartition = math.max(1L, targetBytes / math.max(1L, avgMediaBytes))
    val n = math.max(1, (media.count() / rowsPerPartition).toInt)
    media.repartitionByRange(n, col("media_id"))
  }
}
