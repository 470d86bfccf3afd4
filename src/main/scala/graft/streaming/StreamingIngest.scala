package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.operators.{EventSeries, Writes}

/** Structured Streaming framing of the daily ingest (SURVEY §2.9/§7.4):
  * the reference's cron-driven batch append is re-expressed as an
  * `availableNow` file stream over a drop directory, with the S3
  * insert-ignore key semantics applied per micro-batch via foreachBatch.
  *
  * Why foreachBatch instead of a stateful windowed aggregation: the sink
  * contract is "append rows whose (user_id, date) key is new" — exactly
  * the reference's ON CONFLICT DO NOTHING — which is a set operation
  * against the sink, not an event-time window. Watermarked windowed
  * variants are provided for pure-stream aggregation consumers. */
object StreamingIngest {

  /** events schema as the streaming reader needs it declared (ts arrives
    * as epoch-nanos INT64 under the nanosAsLong reading of the fixture's
    * TIMESTAMP(NANOS) parquet). */
  val eventsSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  def readEvents(spark: SparkSession, source: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream sources require a directory; a single-file source
    // becomes its parent dir + a glob filter on the file name
    val (dir, glob) =
      if (source.endsWith(".parquet")) {
        val p = java.nio.file.Paths.get(source)
        (p.getParent.toString, p.getFileName.toString)
      } else (source, "*")
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Incremental daily-bars ingest: each micro-batch is folded into the
    * parquet target with insert-ignore key semantics — re-delivery or
    * re-run appends nothing new (idempotent, checkpointed). */
  def ingestDailyBars(spark: SparkSession, sourceDir: String,
                      targetDir: String,
                      checkpointDir: String): StreamingQuery =
    readEvents(spark, sourceDir).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bars = EventSeries.dailyBars(batch)
        val existing =
          try spark.read.parquet(targetDir)
          catch { case _: Throwable => bars.limit(0) }
        // append-only delta: new keys only, never rewriting history
        val delta = Writes.unenriched(bars, existing, Seq("user_id", "date"))
        delta.write.mode("append").parquet(targetDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked sliding-window event counts — the pure-stream
    * aggregation shape (event-time window + late-data bound). */
  def windowedCounts(events: DataFrame, window: String = "1 day",
                     watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
}
