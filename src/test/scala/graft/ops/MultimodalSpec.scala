package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Multimodal._

/** Test-only stand-in codec: emits one deterministic pseudo-frame per
  * second of claimed duration — lets the sampling/feature plumbing be
  * exercised on fake payloads of any "kind". Real byte parsing is covered
  * by [[Multimodal.BmpDecoder]]/[[Multimodal.WavDecoder]] below. */
final class StubDecoder extends Multimodal.MediaDecoder {
  override def frames(row: Multimodal.MediaRow): Iterator[Multimodal.Frame] = {
    val n = math.max(1, (row.duration_ms / 1000).toInt)
    val seed = java.util.Arrays.hashCode(row.bytes)
    (0 until n).iterator.map { i =>
      val rng = new scala.util.Random(seed.toLong * 31 + i)
      val px = Array.fill(64)(rng.nextInt(256).toByte)
      Multimodal.Frame(row.media_id, i, row.width, row.height, px)
    }
  }
}

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

  test("vbmp container: round-trip, ordinals, malformed fails fast") {
    val f0 = Multimodal.Bmp.encode(2, 1, Array[Byte](10, 10, 10, 20, 20, 20))
    val f1 = Multimodal.Bmp.encode(1, 1, Array[Byte](30, 30, 30))
    val enc = Multimodal.Vbmp.encode(Seq(f0, f1))
    val back = Multimodal.Vbmp.decode(enc)
    assert(back.length === 2)
    assert(back(0).toSeq === f0.toSeq && back(1).toSeq === f1.toSeq)
    // decoder emits per-frame ordinals in container order
    val row = Multimodal.MediaRow(7L, "video", "vbmp", enc, 2, 1, 80L)
    val frames = new Multimodal.VbmpDecoder().frames(row).toSeq
    assert(frames.map(_.frame_no) === Seq(0, 1))
    assert(frames(0).width === 2 && frames(1).width === 1)
    // truncated payload and lying length both fail fast
    intercept[IllegalArgumentException] {
      Multimodal.Vbmp.decode(enc.take(enc.length - 3))
    }
    val lying = enc.clone(); lying(4) = 0x7f.toByte; lying(7) = 0x7f.toByte
    intercept[IllegalArgumentException] { Multimodal.Vbmp.decode(lying) }
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

  test("BMP: encode/decode round-trips exactly, including padded rows") {
    val rng = new scala.util.Random(5)
    for ((w, h) <- Seq((8, 8), (3, 2), (5, 4), (1, 1))) { // 3,5: stride padding
      val px = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val (dw, dh, out) = Bmp.decode(Bmp.encode(w, h, px))
      assert((dw, dh) === ((w, h)))
      assert(out.toSeq === px.toSeq, s"pixels differ at ${w}x$h")
    }
  }

  test("BMP decoder rejects non-BMP and unsupported depths") {
    intercept[IllegalArgumentException](Bmp.decode(Array[Byte](1, 2, 3)))
    val bad = Bmp.encode(2, 2, new Array[Byte](12)); bad(28) = 8 // claim 8bpp
    intercept[IllegalArgumentException](Bmp.decode(bad))
  }

  test("BMP decoder rejects corrupt headers cleanly (no crash, no huge alloc)") {
    val ok = Bmp.encode(4, 4, new Array[Byte](48))
    val truncated = ok.take(ok.length - 8) // data shorter than header claims
    intercept[IllegalArgumentException](Bmp.decode(truncated))
    val hugeWidth = ok.clone()
    hugeWidth(18) = -1; hugeWidth(19) = -1; hugeWidth(20) = -1; hugeWidth(21) = 0x7f
    intercept[IllegalArgumentException](Bmp.decode(hugeWidth))
  }

  test("WAV decoder rejects non-16-bit PCM instead of mis-decoding") {
    val bytes = Wav.encode(8000, 1, Array.fill(100)(1.toShort))
    bytes(34) = 8 // claim 8 bits per sample
    intercept[IllegalArgumentException](Wav.decode(bytes))
  }

  test("WAV decoder rejects corrupt chunk sizes (no crash, no huge alloc)") {
    // data-chunk size field at offset 40 for a minimal fmt+data layout
    val ok = Wav.encode(8000, 1, Array.fill(100)(1.toShort))
    val negSize = ok.clone() // size >= 2^31 reads back as negative int
    negSize(40) = -1; negSize(41) = -1; negSize(42) = -1; negSize(43) = -1
    intercept[IllegalArgumentException](Wav.decode(negSize))
    val oversize = ok.clone() // claims more data than the payload carries
    oversize(40) = 0; oversize(41) = 0; oversize(42) = 1; oversize(43) = 0
    intercept[IllegalArgumentException](Wav.decode(oversize))
  }

  test("audio features: known signals give exact peak/zc/energy, windows split") {
    // 2 seconds at 4 Hz mono: window 0 = constant +100 (zc 0), window 1 =
    // alternating ±200 (zc 3, every adjacent pair flips)
    val samples = Array[Short](100, 100, 100, 100, 200, -200, 200, -200)
    val rows = Seq(MediaRow(7L, "audio", "wav",
      Wav.encode(4, 1, samples), 1, 4, 2000)).toDS()
    val frames = Multimodal.decodeFrames(rows, new WavDecoder(1000))
    val feats = Multimodal.audioFeatures(frames).collect()
      .map(f => f.window -> f).toMap
    assert(feats.keySet === Set(0, 1))
    val w0 = feats(0)
    assert(w0.n_samples === 4L && w0.peak === 100L && w0.zero_crossings === 0L)
    assert(w0.sum_sq === 4L * 100 * 100)
    val w1 = feats(1)
    assert(w1.n_samples === 4L && w1.peak === 200L && w1.zero_crossings === 3L)
    assert(w1.sum_sq === 4L * 200 * 200)
    // silence: peak 0, rms 0, zc 0
    val silent = Seq(MediaRow(8L, "audio", "wav",
      Wav.encode(4, 1, Array[Short](0, 0, 0, 0)), 1, 4, 1000)).toDS()
    val sf = Multimodal.audioFeatures(
      Multimodal.decodeFrames(silent, new WavDecoder(1000))).collect().head
    assert(sf.peak === 0L && sf.zero_crossings === 0L && sf.sum_sq === 0L)
  }

  test("WAV windows never split a stereo sample frame") {
    // 22050 Hz stereo, 750ms window -> raw 33075 samples, odd: must round
    // down to a multiple of 2
    val samples = Array.tabulate(22050 * 2)(i => (if (i % 2 == 0) 1 else -1).toShort)
    val rows = Seq(MediaRow(9L, "audio", "wav",
      Wav.encode(22050, 2, samples), 0, 0, 1000)).toDS()
    val frames = decodeFrames(rows, new WavDecoder(750)).collect()
    frames.foreach { f =>
      assert(f.pixels.length % 4 === 0) // whole stereo frames (2ch x 2B)
      // every L sample is +1: first short of each pair
      val first = (f.pixels(0) & 0xff) | (f.pixels(1) << 8)
      assert(first === 1, "channel alignment lost")
    }
  }

  test("WAV: encode/decode round-trips; decoder windows real PCM audio") {
    val rng = new scala.util.Random(6)
    val samples = Array.fill(44100 * 2 + 5000)(rng.nextInt(65536).toShort) // ~2.1s mono
    val bytes = Wav.encode(44100, 1, samples)
    val (rate, ch, back) = Wav.decode(bytes)
    assert(rate === 44100 && ch === 1)
    assert(back.toSeq === samples.toSeq)
    val rows = Seq(MediaRow(7L, "audio", "wav", bytes, 0, 0, 2113)).toDS()
    val frames = decodeFrames(rows, new WavDecoder(1000)).collect().sortBy(_.frame_no)
    assert(frames.length === 3) // 1s + 1s + tail
    assert(frames.map(_.pixels.length).sum === samples.length * 2)
    assert(frames.forall(f => f.width === 1 && f.height === 44100))
  }

  test("BMP decoder through the Spark plumbing: parsed pixels, real sizes") {
    val img = Array.tabulate(8 * 8 * 3)(i => (i % 251).toByte)
    val rows = Seq(
      MediaRow(1L, "image", "bmp", Bmp.encode(8, 8, img), 0, 0, 0),
      MediaRow(2L, "image", "bmp", Bmp.encode(3, 2, img.take(18)), 0, 0, 0)
    ).toDS()
    val frames = decodeFrames(rows, new BmpDecoder).collect()
      .map(f => f.media_id -> f).toMap
    assert(frames(1L).width === 8 && frames(1L).height === 8)
    assert(frames(1L).pixels.toSeq === img.toSeq)
    assert(frames(2L).width === 3 && frames(2L).pixels.toSeq === img.take(18).toSeq)
  }

  test("pHash: uniform frame hashes to zero; structure sets bits; deterministic") {
    val flat = Frame(1L, 0, 8, 8, Array.fill(8 * 8 * 3)(100.toByte))
    // no cell STRICTLY exceeds the global mean on a uniform image
    assert(Multimodal.phash(flat) === ((0L, 0L)))
    val px = Array.fill(8 * 8 * 3)(10.toByte)
    // brighten pixel (0,0) → cell 0 exceeds the mean → exactly bit 0 of lo
    px(0) = 200.toByte; px(1) = 200.toByte; px(2) = 200.toByte
    val bright = Frame(2L, 0, 8, 8, px)
    assert(Multimodal.phash(bright) === ((0L, 1L)))
    assert(Multimodal.phash(bright) === Multimodal.phash(bright.copy(media_id = 9L)))
  }

  test("pHash + pooled features: planted near-identical images collide via LSH") {
    val rng = new scala.util.Random(11)
    // 10 random 16x16 images; id+100 = the same image with one pixel nudged
    val base = (0 until 10).map { i =>
      i.toLong -> Array.fill(16 * 16 * 3)(rng.nextInt(256).toByte)
    }
    val rows = base.flatMap { case (id, px) =>
      val nudged = px.clone(); nudged(0) = ((nudged(0) + 4) & 0xff).toByte
      Seq(MediaRow(id, "image", "bmp", Bmp.encode(16, 16, px), 16, 16, 0L),
        MediaRow(id + 100, "image", "bmp", Bmp.encode(16, 16, nudged), 16, 16, 0L))
    }.toDS()
    val frames = decodeFrames(rows, new BmpDecoder)
    val feats = extractFeatures(frames).toDF()
      .select(col("media_id").as("id"), col("feature").as("vec"))
    val pairs = Similarity
      .lshNearDupCandidates(feats, nTables = 16, bitsPerTable = 6, dim = 64,
        threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every planted (i, i+100) pair must survive blocking AND verify —
    // a one-pixel nudge barely moves one pooled cell
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, i + 100L)), s"planted pair $i missing")
    }
    // ...and the pHashes of a planted pair differ in at most one bit half
    val ph = frames.collect().map(f => f.media_id -> Multimodal.phash(f)).toMap
    (0 until 10).foreach { i =>
      val (ah, al) = ph(i.toLong); val (bh, bl) = ph(i + 100L)
      val hamming = java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl)
      assert(hamming <= 1, s"pair $i hamming $hamming")
    }
  }

  test("pHash is invariant under uniform brightness shift") {
    // bit d compares sums(d)·N > total·n(d); adding c to every pixel adds
    // c·n(d) to sums(d) and c·N to total, and the inequality cancels
    // exactly — the property that makes aHash a PERCEPTUAL hash (same
    // scene, different exposure → same hash). Integer proof, so it must
    // hold bit-for-bit, not approximately.
    val rng = new scala.util.Random(17)
    (0 until 5).foreach { _ =>
      val px = Array.fill(16 * 16 * 3)((rng.nextInt(200)).toByte) // ≤ 199
      val shifted = px.map(b => ((b & 0xff) + 40).toByte) // stays ≤ 239
      val a = Multimodal.phash(Frame(1L, 0, 16, 16, px))
      val b = Multimodal.phash(Frame(1L, 0, 16, 16, shifted))
      assert(a === b)
    }
  }

  test("q214's 4x16-bit banding finds EVERY Hamming<=3 pair (pigeonhole)") {
    // the image side of the cross-modal audit claims exactness for its
    // radius: 3 differing bits cannot touch all 4 disjoint 16-bit bands,
    // so every radius-3 pair shares a band and survives the equi-join.
    // Brute-force all pairs of a synthetic hash set (planted near-dups:
    // base hashes plus 1-3 flipped bits) and compare against the banded
    // candidate set + popcount verify.
    val rng = new scala.util.Random(41)
    val hashes = (0 until 40).flatMap { i =>
      val base = rng.nextLong()
      val flips = (1 to 3).map { k =>
        (0 until k).foldLeft(base)((h, _) => h ^ (1L << rng.nextInt(64)))
      }
      (base +: flips)
    }.zipWithIndex.map { case (h, id) => (id.toLong, h >>> 32, h & 0xFFFFFFFFL) }
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    val want = (for {
      a <- hashes; b <- hashes if a._1 < b._1 && ham(a, b) <= 3
    } yield (a._1, b._1)).toSet
    def bandsOf(hi: Long, lo: Long): Seq[(Int, Long)] = Seq(
      0 -> ((hi >>> 16) & 0xFFFFL), 1 -> (hi & 0xFFFFL),
      2 -> ((lo >>> 16) & 0xFFFFL), 3 -> (lo & 0xFFFFL))
    val byBand = hashes.flatMap { case (id, hi, lo) =>
      bandsOf(hi, lo).map { case (b, v) => (b, v) -> id }
    }.groupBy(_._1)
    val cand: Set[(Long, Long)] = byBand.values.flatMap { grp =>
      val ids = grp.map(_._2).sorted
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    val got = cand.filter(p => ham(hashes(p._1.toInt), hashes(p._2.toInt)) <= 3)
    assert(got === want, "banding missed a radius-3 pair (or invented one)")
    assert(want.nonEmpty, "test corpus planted no near pairs")
  }

  test("resizeMeta: downscale only, aspect preserved") {
    val out = resizeMeta(media().toDF(), 960).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("out_width"), r.getAs[Int]("out_height")))).toMap
    assert(out(1L) === ((960, 540)))
    assert(out(2L) === ((640, 480))) // already smaller: untouched
  }
}
