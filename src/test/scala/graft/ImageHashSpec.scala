package graft

import org.apache.spark.sql.functions._
import graft.functions.ImageHash

class ImageHashSpec extends SparkSuite {
  import spark.implicits._

  private def textured(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i =>
      (seed + 7 * (i % w) + 13 * (i / w) +
        (if ((i % w) / 8 % 2 == (i / w) / 8 % 2) 40 else 0)) % 256)

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("identical rasters hash identically; pooling is total") {
    val px = textured(64, 48, 11)
    assert(ImageHash.phash64(px, 64, 48) ==
      ImageHash.phash64(px.clone(), 64, 48))
    val pool = ImageHash.pool(px, 64, 48)
    // every cell of a >=32x32 image is covered (no zero-count cells)
    assert(pool.length == 1024)
    assert(pool.count(_ == 0.0) == 0)
  }

  test("one perturbed pixel stays within Hamming 3; a structurally " +
    "different image is far") {
    val base = textured(64, 64, 5)
    val tweaked = base.clone(); tweaked(0) = (tweaked(0) + 8) % 256
    val h1 = ImageHash.phash64(base, 64, 64)
    val h2 = ImageHash.phash64(tweaked, 64, 64)
    assert(hamming(h1, h2) <= 3, s"hamming ${hamming(h1, h2)}")
    // checkerboard with inverted phase + different gradient: far away
    val other = Array.tabulate(64 * 64)(i =>
      (200 - 5 * (i % 64) + (if ((i % 64 + i / 64) % 2 == 0) 90 else 0))
        .max(0) % 256)
    val h3 = ImageHash.phash64(other, 64, 64)
    assert(hamming(h1, h3) > 10, s"hamming ${hamming(h1, h3)}")
  }

  test("global brightness shift leaves the hash nearly unchanged " +
    "(DC excluded from the median)") {
    val base = textured(64, 64, 5)
    // pure (unclamped) shift: brightness lands entirely in the DC
    // term, every AC coefficient is bit-identical — with DC excluded
    // from the threshold the hash cannot move at all (real images add
    // a little saturation clipping on top; that is genuine signal)
    val brighter = base.map(_ + 30)
    val h1 = ImageHash.phash64(base, 64, 64)
    val h2 = ImageHash.phash64(brighter, 64, 64)
    assert(hamming(h1, h2) == 0, s"hamming ${hamming(h1, h2)}")
  }

  test("hash survives a 2x downscale of the same scene") {
    val big = textured(64, 64, 21)
    // box-downscale by 2 (exact means of 2x2 blocks)
    val small = Array.tabulate(32 * 32) { i =>
      val (x, y) = (i % 32 * 2, i / 32 * 2)
      (big(y * 64 + x) + big(y * 64 + x + 1) +
        big((y + 1) * 64 + x) + big((y + 1) * 64 + x + 1)) / 4
    }
    val h1 = ImageHash.phash64(big, 64, 64)
    val h2 = ImageHash.phash64(small, 32, 32)
    assert(hamming(h1, h2) <= 6, s"hamming ${hamming(h1, h2)}")
  }

  test("banded-Hamming pair join finds planted image siblings") {
    import graft.operators.{Dedup, Multimodal}
    import graft.functions.MediaCodecs
    val media = (0L until 8L).map { id =>
      val base = (id / 2).toInt
      val px = textured(40, 40, base * 31)
      if (id % 2 == 1) px(0) = (px(0) + 8) % 256
      Multimodal.MediaRow(id, "image",
        MediaCodecs.encodePng(MediaCodecs.GrayImage(40, 40, px)))
    }.toDF()
    val hashed = Multimodal.imagePhash(media).filter(col("valid"))
    assert(hashed.count() == 8)
    val pairs = Dedup.hammingBandPairs(hashed, "phash", "doc_id", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (b <- 0L until 4L)
      assert(pairs.contains((2 * b, 2 * b + 1)), s"sibling pair $b")
    // groups: each odd id labels with its even sibling's canonical
    val groups = Dedup.hammingDedupGroups(hashed, "phash", "doc_id", 3)
      .select("doc_id", "canonical").as[(Long, Long)].collect().toMap
    assert(groups.size == 8)
    for (b <- 0L until 4L)
      assert(groups(2 * b + 1) == groups(2 * b),
        s"siblings of base $b in different groups")
  }
}
