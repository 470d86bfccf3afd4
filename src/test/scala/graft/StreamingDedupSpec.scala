package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StreamingDedup, StreamingIngest}

class StreamingDedupSpec extends SparkSuite {

  /** Two-file drop dir: the full fixture, then a duplicate slice —
    * micro-batch 2 replays rows batch 1 already saw. */
  private def dupSource(): (String, org.apache.spark.sql.DataFrame) = {
    val raw = Tables.events(spark, "/root/testdata/sf0.001")
    val srcDir = Files.createTempDirectory("graft_sdedup_src")
    def writeAs(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_sdedup_half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, srcDir.resolve(name))
    }
    writeAs(raw, "full.parquet")
    writeAs(raw.orderBy("event_id").limit(200), "dupes.parquet")
    (srcDir.toString, raw)
  }

  test("dropDuplicatesWithinWatermark suppresses replayed keys across " +
    "micro-batches; result matches batch dropDuplicates") {
    val (src, raw) = dupSource()
    val cp = Files.createTempDirectory("graft_sdedup_cp").toString
    val deduped = StreamingDedup.dedupByKey(
      StreamingIngest.readEvents(spark, src,
        maxFilesPerTrigger = Some(1)),
      tsCol = "ts", delay = "36500 days", "event_id")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("sdedup_out")
    assert(out.count() == raw.count())
    assert(out.select("event_id").distinct().count() == raw.count())
  }

  test("firstSeenPerKey emits the batch min(ts) per (key, day) for " +
    "every window the watermark closed, and nothing else") {
    val (src, raw) = dupSource()
    val cp = Files.createTempDirectory("graft_sdedup_cp2").toString
    val firsts = StreamingDedup.firstSeenPerKey(
      StreamingIngest.readEvents(spark, src,
        maxFilesPerTrigger = Some(1)),
      tsCol = "ts", delay = "0 seconds", horizon = "1 day",
      keyCol = "user_id")
    val q = firsts.writeStream.format("memory").queryName("sfirst_out")
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val batch = raw
      .groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(min(col("ts")).as("first_seen"))
      .select(col("user_id"), col("window.start").as("window_start"),
        col("first_seen"))
    val streamed = spark.table("sfirst_out")

    // every emitted row is exactly the batch answer (duplicates in
    // batch 2 never shift a first-seen), and the stream closed all but
    // the final (still-open) day
    assert(streamed.except(batch).count() == 0)
    assert(streamed.count() >=
      batch.count() - batch.select("user_id").distinct().count())
    assert(streamed.count() > 0)
  }
}
