package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StreamJoin, StreamingIngest}

/** Stream-stream interval join ≡ the same join run as a batch, when no
  * row is later than the watermark — the equivalence contract every
  * streaming operator in the engine is held to. */
class StreamJoinSpec extends SparkSuite {

  /** Write df as N single-file parquet drops so maxFilesPerTrigger=1
    * forces multi-micro-batch processing (join state must carry rows
    * across batches). */
  private def dropDir(df: DataFrame, parts: Int): String = {
    val srcDir = Files.createTempDirectory("graft_sjoin_src")
    (0 until parts).foreach { i =>
      val tmp = Files.createTempDirectory("graft_sjoin_half").toString
      df.filter(pmod(col("event_id"), lit(parts)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, srcDir.resolve(s"drop_$i.parquet"))
    }
    srcDir.toString
  }

  test("watermarked interval join across micro-batches matches the " +
    "batch join exactly when nothing is late") {
    val raw = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts", "value")
    // enrichment feed: one row per 20th event, landing 1 minute later
    val enrBatch = raw.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("e_ref"),
        col("user_id").as("e_user_id"),
        (col("ts") + expr("interval 1 minute")).as("e_ts"))

    val evDir = dropDir(raw, 2)
    val enrDir = Files.createTempDirectory("graft_sjoin_enr").toString
    enrBatch.coalesce(1).write.mode("overwrite").parquet(enrDir)

    val evStream = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(evDir)
    val enrStream = spark.readStream
      .schema("e_ref BIGINT, e_user_id BIGINT, e_ts TIMESTAMP")
      .parquet(enrDir)

    val cp = Files.createTempDirectory("graft_sjoin_cp").toString
    val q = StreamJoin
      .intervalJoin(evStream, enrStream, delay = "30 minutes",
        watermark = "36500 days") // nothing is ever late → exact
      .writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("sjoin_out")
      .select("event_id", "e_ref").orderBy("event_id", "e_ref")
    val batch = StreamJoin.intervalJoinBatch(raw, enrBatch, "30 minutes")
      .select("event_id", "e_ref").orderBy("event_id", "e_ref")
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    assert(streamed.count() == batch.count())
  }
}
