package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("tape coordinates are gapless per shard: each doc starts where " +
    "the previous one ended, and offsets/sequences are consistent") {
    val packed = Packing.packCoordinates(docs, seqLen = 256)
      .as[(Long, String, Long, Long, Long, Long, Long)]
      .collect()
      .groupBy(_._2)
    assert(packed.nonEmpty)
    packed.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var expectedStart = 0L
      sorted.foreach {
        case (_, _, n, tapeStart, seqStart, seqEnd, off) =>
          assert(tapeStart == expectedStart)
          assert(seqStart == tapeStart / 256)
          assert(off == tapeStart % 256)
          if (n > 0) assert(seqEnd == (tapeStart + n - 1) / 256)
          assert(seqEnd >= seqStart)
          expectedStart += n
      }
    }
  }

  test("packing is one shuffle: the plan has a single Exchange (the " +
    "shard-key repartition for the window)") {
    val packed = Packing.packCoordinates(docs, seqLen = 256)
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one Exchange, plan:\n$plan")
  }

  test("total sequences per shard equal ceil(shard tokens / seqLen)") {
    val packed = Packing.packCoordinates(docs, seqLen = 256)
    val bySeqs = packed.groupBy("lang")
      .agg(max(col("seq_end")).as("last_seq"),
        sum(col("n_tokens")).as("tokens"))
      .as[(String, Long, Long)].collect()
    bySeqs.foreach { case (_, lastSeq, tokens) =>
      assert(lastSeq == (tokens - 1) / 256)
    }
  }

  test("chunk: windows tile with the configured overlap and " +
    "reconstruct the document; the plan has no shuffle") {
    val one = Seq((7L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.chunk(one, size = 32, stride = 24)
      .orderBy("chunk_id")
      .as[(Long, Long, String, Long)].collect()
    // starts 0,24,48,72,96 → 5 chunks; tail windows clip at n=100
    assert(out.length == 5)
    assert(out.map(_._2).toSeq == (0L until 5L))
    assert(out.map(_._4).toSeq == Seq(32L, 32L, 32L, 28L, 4L))
    // consecutive chunks share exactly the tokens past the stride
    out.sliding(2).foreach { case Array(a, b) =>
      val at = a._3.split(" "); val bt = b._3.split(" ")
      assert(at.drop(24).sameElements(bt.take(at.length - 24)))
    }
    // stride-prefix concatenation reconstructs the document
    val rebuilt = (out.init.map(_._3.split(" ").take(24).mkString(" "))
      :+ out.last._3).mkString(" ")
    assert(rebuilt == one.head().getString(1))
    val plan = Packing.chunk(docs, 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("paddingWaste: ledger matches a driver replay of the md5 batch " +
    "order; single-doc batches and batchSize=1 waste nothing") {
    import org.apache.spark.sql.functions.col
    val lens = Map(0L -> 1, 1L -> 2, 2L -> 3, 3L -> 10)
    val docs = lens.toSeq.map { case (id, n) =>
      (id, ("w " * n).trim)
    }.toDF("doc_id", "text")
    // driver replay: same md5-hex ordering inside bin 0 (ids 0,1,2)
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val order = Seq(0L, 1L, 2L).sortBy(i => (md5hex(i.toString), i))
    val batches = order.map(lens).grouped(2).toSeq
    val expPad = batches.map(b => b.size * b.max - b.sum).sum
    val out = Packing.paddingWaste(docs, binSize = 4, batchSize = 2)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 2L))
    val bin0 = out.head
    assert(bin0._2 == 3L && bin0._3 == 2L && bin0._4 == 6L)
    assert(bin0._5 == expPad.toLong)
    // bin 2: the 10-token doc alone — one batch, zero padding
    assert(out.last == ((2L, 1L, 1L, 10L, 0L, 0.0)))
    // batchSize=1 → pad-to-longest is the doc itself everywhere
    val solo = Packing.paddingWaste(docs, binSize = 4, batchSize = 1)
      .agg(org.apache.spark.sql.functions.sum(col("padding_tokens")))
      .as[Long].head()
    assert(solo == 0L)
  }
}
