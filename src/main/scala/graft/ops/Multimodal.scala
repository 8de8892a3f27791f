package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star extension): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * Two REAL pure-JVM decoders ship here — [[BmpDecoder]] (24-bit BMP byte
  * parsing) and [[WavDecoder]] (PCM16 RIFF chunk walk); formats needing
  * native codec libraries (JPEG/H.264/...) plug in as further
  * [[MediaDecoder]] implementations without touching the Spark plumbing,
  * which is engineered for scale:
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

  /** Uncompressed 24-bit BMP codec — pure JVM byte parsing, no codec
    * libraries. Pixel payloads are top-down RGB triplets at the API
    * boundary; the file format's bottom-up, BGR, 4-byte-row-padded layout
    * is handled inside encode/decode, so `decode(encode(px)) == px`
    * exactly (spec-asserted, including non-aligned widths). */
  object Bmp {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rdLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def rdLe16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    /** Encode top-down RGB triplets (3 bytes/pixel) as a 24-bit BMP. */
    def encode(width: Int, height: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
      require(rgbTopDown.length == width * height * 3, "pixel buffer size")
      val rowBytes = width * 3
      val stride = (rowBytes + 3) & ~3 // rows padded to 4-byte boundaries
      val dataSize = stride * height
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      le32(54 + dataSize).copyToArray(out, 2)
      le32(54).copyToArray(out, 10) // pixel data offset
      le32(40).copyToArray(out, 14) // BITMAPINFOHEADER size
      le32(width).copyToArray(out, 18)
      le32(height).copyToArray(out, 22) // positive = bottom-up storage
      out(26) = 1 // planes
      out(28) = 24 // bits per pixel
      le32(dataSize).copyToArray(out, 34)
      var y = 0
      while (y < height) {
        val src = y * rowBytes
        val dst = 54 + (height - 1 - y) * stride // flip to bottom-up
        var x = 0
        while (x < width) {
          // RGB → BGR
          out(dst + x * 3) = rgbTopDown(src + x * 3 + 2)
          out(dst + x * 3 + 1) = rgbTopDown(src + x * 3 + 1)
          out(dst + x * 3 + 2) = rgbTopDown(src + x * 3)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Parse a 24-bit uncompressed BMP into (width, height, top-down RGB).
      * Handles bottom-up (positive height) and top-down (negative height)
      * files and row padding; rejects other depths/compressions. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP payload")
      val dataOff = rdLe32(bytes, 10)
      val width = rdLe32(bytes, 18)
      val rawHeight = rdLe32(bytes, 22)
      val bpp = rdLe16(bytes, 28)
      val compression = rdLe32(bytes, 30)
      require(bpp == 24, s"unsupported bit depth $bpp (24-bit only)")
      require(compression == 0, s"unsupported compression $compression")
      val bottomUp = rawHeight > 0
      val height = math.abs(rawHeight)
      // bounds-check the header against the payload BEFORE any allocation:
      // corrupt/truncated files must reject cleanly, not OOM or crash a
      // task mid-corpus
      require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
        s"implausible dimensions ${width}x$rawHeight")
      val rowBytes = width * 3
      val stride = (rowBytes + 3) & ~3
      require(dataOff >= 54 && dataOff.toLong + stride.toLong * height <= bytes.length,
        s"pixel data (offset $dataOff, ${stride}x$height) exceeds payload ${bytes.length}")
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        val src = dataOff + srcRow * stride
        val dst = y * rowBytes
        var x = 0
        while (x < width) {
          // BGR → RGB
          out(dst + x * 3) = bytes(src + x * 3 + 2)
          out(dst + x * 3 + 1) = bytes(src + x * 3 + 1)
          out(dst + x * 3 + 2) = bytes(src + x * 3)
          x += 1
        }
        y += 1
      }
      (width, height, out)
    }
  }

  /** Real image decoder: parses the BMP payload bytes (ignoring the row's
    * claimed metadata — the file is the truth) and emits one frame of
    * top-down RGB pixels. */
  final class BmpDecoder extends MediaDecoder {
    override def frames(row: MediaRow): Iterator[Frame] = {
      val (w, h, px) = Bmp.decode(row.bytes)
      Iterator.single(Frame(row.media_id, 0, w, h, px))
    }
  }

  /** Minimal multi-frame video container ("vbmp"): `[u32 LE frame count]`
    * then per frame `[u32 LE length][BMP bytes]` — a length-prefixed
    * chunk walk in the WAV codec's spirit, carrying real decodable frames
    * (no codec library in this environment can decode H.264; the
    * CONTAINER walk, frame iteration, sampling, and per-frame feature
    * plumbing are the Spark-side surface a real codec would plug into,
    * exactly as [[MediaDecoder]]'s scaladoc contracts). */
  object Vbmp {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rdLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        4 + frames.map(_.length + 4).sum)
      out.write(le32(frames.length))
      frames.foreach { f => out.write(le32(f.length)); out.write(f) }
      out.toByteArray
    }

    /** Walk the container; malformed lengths fail fast (the codec
      * discipline every parser here follows — garbage in, exception out,
      * never a silently-truncated frame list). */
    def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
      require(bytes.length >= 4, "vbmp: truncated header")
      val n = rdLe32(bytes, 0)
      require(n >= 0, s"vbmp: negative frame count $n")
      var off = 4
      (0 until n).map { k =>
        require(off + 4 <= bytes.length, s"vbmp: truncated at frame $k")
        val len = rdLe32(bytes, off)
        require(len >= 0 && off + 4 + len <= bytes.length,
          s"vbmp: bad frame length $len at frame $k")
        val f = java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)
        off += 4 + len
        f
      }
    }
  }

  /** Video decoder: container walk + per-frame BMP decode, one [[Frame]]
    * per contained frame with its ordinal `frame_no` — the input
    * [[sampleFrames]] strides over. */
  final class VbmpDecoder extends MediaDecoder {
    override def frames(row: MediaRow): Iterator[Frame] =
      Vbmp.decode(row.bytes).iterator.zipWithIndex.map { case (b, k) =>
        val (w, h, px) = Bmp.decode(b)
        Frame(row.media_id, k, w, h, px)
      }
  }

  /** PCM16 WAV codec — RIFF/fmt/data chunk walk, pure JVM. */
  object Wav {
    /** Encode interleaved 16-bit samples as a canonical PCM WAV. */
    def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(s => bb.putShort(s): Unit)
      bb.array()
    }

    /** Parse a PCM16 WAV into (sampleRate, channels, samples). Walks the
      * chunk list (fmt may be followed by LIST/fact chunks before data). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 44, "truncated WAV")
      val riff = new Array[Byte](4); bb.get(riff)
      require(new String(riff, "US-ASCII") == "RIFF", "not a RIFF payload")
      bb.getInt() // riff size
      val wave = new Array[Byte](4); bb.get(wave)
      require(new String(wave, "US-ASCII") == "WAVE", "not a WAVE payload")
      var sampleRate = -1; var channels = -1
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && samples == null) {
        val tag = new Array[Byte](4); bb.get(tag)
        val size = bb.getInt()
        // chunk sizes are untrusted input: reject before allocating or
        // repositioning (a signed-overflowed or oversized size must fail
        // as "corrupt payload", not NegativeArraySize/OOM) — same
        // reject-before-allocate rule as Bmp.decode
        require(size >= 0 && size <= bb.remaining(),
          s"corrupt WAV chunk: size $size exceeds ${bb.remaining()} remaining bytes")
        new String(tag, "US-ASCII") match {
          case "fmt " =>
            require(size >= 16, s"corrupt WAV fmt chunk: size $size < 16")
            val fmt = bb.getShort(); channels = bb.getShort()
            sampleRate = bb.getInt()
            bb.getInt() // byte rate
            bb.getShort() // block align
            val bits = bb.getShort()
            require(fmt == 1, s"unsupported WAV format code $fmt (PCM only)")
            require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
            bb.position(bb.position() + size - 16) // skip any fmt extension
          case "data" =>
            require(channels > 0, "data chunk before fmt")
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
          case _ =>
            val skip = size + (size & 1) // chunks pad to even
            bb.position(math.min(bb.position() + skip, bb.limit()))
        }
      }
      require(samples != null, "no data chunk")
      (sampleRate, channels, samples)
    }
  }

  /** Real audio decoder: parses PCM16 WAV bytes and emits one frame per
    * `windowMs` of audio — Frame.width carries channels, Frame.height the
    * sample rate, pixels the window's little-endian PCM bytes. */
  final class WavDecoder(windowMs: Int = 1000) extends MediaDecoder {
    override def frames(row: MediaRow): Iterator[Frame] = {
      val (rate, channels, samples) = Wav.decode(row.bytes)
      // multiple of channels: a window boundary must never split one
      // multi-channel sample frame (would misalign L/R forever after)
      val raw = math.max(channels, rate * channels * windowMs / 1000)
      val perWindow = raw - raw % channels
      samples.grouped(perWindow).zipWithIndex.map { case (win, i) =>
        val bytes = new Array[Byte](win.length * 2)
        var j = 0
        while (j < win.length) {
          bytes(2 * j) = (win(j) & 0xff).toByte
          bytes(2 * j + 1) = ((win(j) >> 8) & 0xff).toByte
          j += 1
        }
        Frame(row.media_id, i, channels, rate, bytes)
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

  /** 8×8 integer block pooling of a frame: per grid cell, the SUM of
    * per-pixel integer mean luma ((r+g+b)/3, floor) and the pixel count —
    * all integer arithmetic, so every downstream value derived by exact
    * formulas is engine-portable (the q50/q65 oracles rebuild them in
    * SQL). RGB frames (pixels = w·h·3 bytes) pool spatially: pixel (x, y)
    * lands in cell (x·8/w, y·8/h). Non-image payloads (audio PCM windows,
    * stub codecs) pool the raw byte stream into 64 index ranges — same
    * shape, so every media kind feeds the same similarity stack. */
  private[graft] def pool8x8(f: Frame): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    val px = f.pixels
    if (f.width > 0 && f.height > 0 && px.length == f.width * f.height * 3) {
      val w = f.width; val h = f.height
      var y = 0
      while (y < h) {
        val rowCell = (y * 8 / h) * 8
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          val luma = ((px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)) / 3
          val cell = rowCell + x * 8 / w
          sums(cell) += luma
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
    } else {
      var i = 0
      while (i < px.length) {
        val cell = (i.toLong * 64 / px.length).toInt
        sums(cell) += px(i) & 0xff
        counts(cell) += 1
        i += 1
      }
    }
    (sums, counts)
  }

  /** REAL feature extraction (replaces the round-1..6 byte-stat stub):
    * 64-dim average-pooled luma, centered at mid-gray — feature d =
    * mean_luma(cell d) − 127.5, via the exact integer form
    * (2·sum − 255·count) / (2·count). Centering matters: raw luma vectors
    * are all-positive, so any two frames cosine at ~0.98 regardless of
    * content (measured); centered vectors make cosine measure STRUCTURE,
    * which is what [[Similarity]]'s LSH planes need to discriminate.
    * Empty cells (h or w < 8) contribute a neutral 0. One pass per frame,
    * no shuffle; output feeds [[Similarity]] directly. */
  def extractFeatures(frames: Dataset[Frame])(
      implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    frames.map { f =>
      val (sums, counts) = pool8x8(f)
      val feat = Array.tabulate(64) { d =>
        if (counts(d) == 0L) 0.0f
        else ((2L * sums(d) - 255L * counts(d)) / (2.0 * counts(d))).toFloat
      }
      MediaFeature(f.media_id, f.frame_no, feat)
    }
  }

  case class AudioFeature(media_id: Long, window: Int, n_samples: Long,
      peak: Long, zero_crossings: Long, sum_sq: Long)

  /** Per-window audio features over [[WavDecoder]] frames (whose pixel
    * payload is the window's little-endian PCM16 bytes): sample count,
    * peak |amplitude|, zero-crossing count (sign flips between adjacent
    * samples, negative vs non-negative), and the exact integer energy
    * Σ s² — RMS = sqrt(sum_sq/n) is then ONE divide + ONE sqrt in
    * double, the engine-portable finish ([[graft.core.Det]]'s exact-sum-
    * then-float discipline applied to audio). One pass per window, no
    * shuffle; the training-data use is silence/clipping gates and
    * energy-profile dedup over audio corpora. */
  def audioFeatures(frames: Dataset[Frame])(
      implicit spark: SparkSession): Dataset[AudioFeature] = {
    import spark.implicits._
    frames.map { f =>
      val px = f.pixels
      val n = px.length / 2
      var i = 0; var peak = 0L; var zc = 0L; var ss = 0L; var prevNeg = false
      while (i < n) {
        val s = (((px(2 * i + 1).toInt << 8) | (px(2 * i) & 0xff)).toShort).toLong
        val a = math.abs(s)
        if (a > peak) peak = a
        ss += s * s
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      AudioFeature(f.media_id, f.frame_no, n.toLong, peak, zc, ss)
    }
  }

  /** 64-bit average-hash ("aHash", the classic perceptual-hash family) of
    * a decoded frame: bit d = 1 iff cell d's mean luma strictly exceeds
    * the whole-frame mean. The comparison is integer cross-multiplied
    * (sum_d · N > total · n_d) — no division anywhere, so the hash is
    * exact integer arithmetic end-to-end and any engine reproduces it
    * bit-for-bit. Returned as (hi, lo) 32-bit halves: a single BIGINT
    * with bit 63 set reads negative in both Spark and SQL engines, a
    * sign trap the split avoids. Near-duplicate frames differ in a few
    * bits (hamming); exact-equal hashes give a free exact-dedup key. */
  def phash(f: Frame): (Long, Long) = {
    val (sums, counts) = pool8x8(f)
    var total = 0L; var n = 0L
    var d = 0
    while (d < 64) { total += sums(d); n += counts(d); d += 1 }
    var hi = 0L; var lo = 0L
    d = 0
    while (d < 64) {
      if (sums(d) * n > total * counts(d)) {
        if (d < 32) lo |= 1L << d else hi |= 1L << (d - 32)
      }
      d += 1
    }
    (hi, lo)
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
    // ceil, not floor: flooring the partition count packs up to ~2x
    // targetBytes into each task, defeating the memory bound this knob
    // exists to enforce
    val count = media.count()
    val n = math.max(1L, (count + rowsPerPartition - 1) / rowsPerPartition).toInt
    media.repartitionByRange(n, col("media_id"))
  }
}
