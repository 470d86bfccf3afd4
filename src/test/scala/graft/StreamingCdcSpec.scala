package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.operators.Writes
import graft.streaming.StreamingCdc

/** Streamed CDC fold ≡ the batch fold over the whole feed, for ANY
  * micro-batch split — including the adversarial case: a stale update
  * arriving in a later batch than the delete it lost to. */
class StreamingCdcSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "k BIGINT, v STRING, seq BIGINT, op STRING")

  private def drop(dir: java.nio.file.Path, name: String,
                   df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft_scdc_half").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, dir.resolve(name))
  }

  test("streamed compaction equals the batch fold; tombstones beat " +
    "stale cross-batch updates; replays are no-ops") {
    // batch 1: inserts for k=1..3, then DELETE k=2 at seq 10
    val b1 = Seq((1L, "a", 1L, "U"), (2L, "b", 2L, "U"),
      (3L, "c", 3L, "U"), (2L, null.asInstanceOf[String], 10L, "D"))
      .toDF("k", "v", "seq", "op")
    // batch 2: STALE update for the deleted k=2 (seq 5 < 10) — must
    // lose to the stored tombstone — plus a fresh update for k=3
    val b2 = Seq((2L, "zombie", 5L, "U"), (3L, "c2", 11L, "U"))
      .toDF("k", "v", "seq", "op")

    val src = Files.createTempDirectory("graft_scdc_src")
    drop(src, "batch_0.parquet", b1)
    drop(src, "batch_1.parquet", b2)
    val target = Files.createTempDirectory("graft_scdc_t").toString + "/t"
    val cp = Files.createTempDirectory("graft_scdc_cp").toString

    val q = StreamingCdc.applyStream(spark, src.toString, target, cp,
      Seq("k"), schema, maxFilesPerTrigger = Some(1))
    q.awaitTermination()

    val streamed = StreamingCdc.readTable(spark, target)
      .select("k", "v").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(streamed == Seq((1L, "a"), (3L, "c2"))) // k=2 stays dead

    // equivalence with the one-shot batch fold over the full feed
    val all = b1.unionByName(b2)
    val batchFold = Writes.cdcLiveView(
        Writes.cdcCompact(b1.limit(0), all, Seq("k")))
      .select("k", "v").orderBy("k").as[(Long, String)].collect().toSeq
    assert(streamed == batchFold)

    // replay: re-folding batch 2 against the final state is a no-op
    val state = spark.read.parquet(target)
    val replayed = Writes.cdcCompact(state, b2, Seq("k"))
    assert(replayed.orderBy("k", "seq").collect().toSeq ==
      state.orderBy("k", "seq").collect().toSeq)
  }
}
