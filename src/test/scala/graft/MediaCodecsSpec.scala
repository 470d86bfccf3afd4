package graft

import org.apache.spark.sql.functions._
import graft.functions.MediaCodecs
import graft.functions.MediaCodecs.{GrayImage, PcmAudio}
import graft.operators.Multimodal

/** Pure-JVM media codec correctness: PNG (zlib + all five scanline
  * filters), BMP 24bpp, PCM-16 WAV — exact round trips, corrupt-input
  * quarantine, and the decoder seam end-to-end through the Spark plan.
  * These are the REAL-decode counterparts of the q100/q101 oracle
  * round trips (which prove value-exactness cross-engine). */
class MediaCodecsSpec extends SparkSuite {
  import spark.implicits._

  private def pattern(w: Int, h: Int, seed: Int): GrayImage =
    GrayImage(w, h, Array.tabulate(w * h)(i =>
      (seed + 7 * (i % w) + 13 * (i / w)) % 256))

  test("PNG round trip is pixel-exact and exercises every filter type " +
    "(encoder cycles None/Sub/Up/Average/Paeth by row)") {
    // h >= 5 so each of the five filters appears at least once
    val img = pattern(w = 11, h = 9, seed = 5)
    val bytes = MediaCodecs.encodePng(img)
    // real container: signature + IHDR present
    assert(bytes.take(8).map(_ & 0xff).sameElements(
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)))
    val back = MediaCodecs.decodePng(bytes)
    assert(back.isDefined)
    assert(back.get.width == 11 && back.get.height == 9)
    assert(back.get.pixels.sameElements(img.pixels))
  }

  test("PNG decode quarantines corrupt input: bad magic, truncation, " +
    "flipped CRC — None, never a throw") {
    val bytes = MediaCodecs.encodePng(pattern(8, 6, 42))
    assert(MediaCodecs.decodePng("not a png".getBytes).isEmpty)
    assert(MediaCodecs.decodePng(bytes.take(bytes.length / 2)).isEmpty)
    val flipped = bytes.clone()
    flipped(20) = (flipped(20) ^ 0x7f).toByte // inside IHDR data → CRC fails
    assert(MediaCodecs.decodePng(flipped).isEmpty)
    assert(MediaCodecs.decodePng(Array.emptyByteArray).isEmpty)
  }

  test("BMP round trip is pixel-exact including row padding " +
    "(w=5 rows pad 15→16 bytes); truncation quarantines") {
    for (w <- Seq(4, 5, 7); h <- Seq(3, 6)) {
      val img = pattern(w, h, seed = w * 31 + h)
      val bytes = MediaCodecs.encodeBmp(img)
      val back = MediaCodecs.decodeBmp(bytes)
      assert(back.isDefined, s"w=$w h=$h")
      assert(back.get.width == w && back.get.height == h)
      // gray written to all three channels → integer-mean luma is exact
      assert(back.get.pixels.sameElements(img.pixels), s"w=$w h=$h")
    }
    val bytes = MediaCodecs.encodeBmp(pattern(6, 4, 9))
    assert(MediaCodecs.decodeBmp(bytes.take(bytes.length - 3)).isEmpty)
    assert(MediaCodecs.decodeBmp("BMnope".getBytes).isEmpty)
  }

  test("WAV round trip is sample-exact; the RIFF walk skips unknown " +
    "chunks (odd sizes pad to even) instead of assuming fixed offsets") {
    val clip = PcmAudio(16000,
      Array.tabulate(300)(i => ((i * 31) % 4096) - 2048))
    val bytes = MediaCodecs.encodeWav(clip)
    val back = MediaCodecs.decodeWav(bytes)
    assert(back.isDefined)
    assert(back.get.sampleRate == 16000)
    assert(back.get.samples.sameElements(clip.samples))

    // splice an odd-sized LIST chunk between fmt and data: a fixed-
    // offset reader breaks, a real chunk walk does not
    val listData = "INFOx".getBytes("US-ASCII") // 5 bytes → 1 pad byte
    val chunk = java.nio.ByteBuffer.allocate(8 + listData.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(listData.length)
      .put(listData).put(0.toByte)
    val spliced = bytes.take(36) ++ chunk.array() ++ bytes.drop(36)
    // RIFF size field must cover the splice
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val walked = MediaCodecs.decodeWav(spliced)
    assert(walked.isDefined)
    assert(walked.get.samples.sameElements(clip.samples))
  }

  test("WAV decode quarantines out-of-scope formats: stereo, 8-bit, " +
    "non-PCM, truncated data") {
    val bytes = MediaCodecs.encodeWav(
      PcmAudio(8000, Array.tabulate(50)(_ * 10)))
    def patched(pos: Int, v: Short): Array[Byte] = {
      val c = bytes.clone()
      java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(pos, v)
      c
    }
    assert(MediaCodecs.decodeWav(patched(22, 2)).isEmpty)  // stereo
    assert(MediaCodecs.decodeWav(patched(34, 8)).isEmpty)  // 8-bit
    assert(MediaCodecs.decodeWav(patched(20, 3)).isEmpty)  // IEEE float
    assert(MediaCodecs.decodeWav(bytes.take(50)).isEmpty)  // truncated
  }

  test("PixelDecoder through the extractFeatures plan: real PNG and BMP " +
    "payloads decode (luma sum from DECODED pixels), junk quarantines " +
    "as valid=false — one frame, one partition-local pass") {
    val png = pattern(6, 5, 11)
    val bmp = pattern(4, 4, 23)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", MediaCodecs.encodePng(png)),
      Multimodal.MediaRow(2L, "image", MediaCodecs.encodeBmp(bmp)),
      Multimodal.MediaRow(3L, "image", "jpeg-or-garbage".getBytes),
      Multimodal.MediaRow(4L, "image", null)
    ).toDF()
    val feats = Multimodal.extractFeatures(media, Multimodal.PixelDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).valid && feats(1L).width == 6 && feats(1L).height == 5)
    assert(feats(1L).checksum == png.pixels.map(_.toLong).sum)
    assert(feats(2L).valid && feats(2L).width == 4 && feats(2L).height == 4)
    assert(feats(2L).checksum == bmp.pixels.map(_.toLong).sum)
    assert(!feats(3L).valid && !feats(4L).valid)
  }

  test("audioStats through the plan: exact integer amplitude stats from " +
    "DECODED samples; corrupt rows quarantine with zeroed stats") {
    val samples = Array.tabulate(128)(i => ((i * 97) % 4096) - 2048)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio",
        MediaCodecs.encodeWav(PcmAudio(16000, samples))),
      Multimodal.MediaRow(2L, "audio", "RIFFjunk".getBytes)
    ).toDF()
    val rows = Multimodal.audioStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(6))
    assert(rows(1L).getInt(2) == 16000)
    assert(rows(1L).getLong(3) == 128L)
    assert(rows(1L).getLong(4) == samples.map(s => math.abs(s.toLong)).sum)
    assert(rows(1L).getLong(5) == samples.map(s => s.toLong * s).sum)
    assert(!rows(2L).getBoolean(6))
    assert(rows(2L).getLong(3) == 0L)
  }
}
