package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming windowed heavy hitters — the streaming twin of the batch
  * top-k (q21/q77 shapes): watermarked event-time windows accumulate
  * per-key counts (the ONLY stateful stage — state is distinct keys ×
  * open windows, not events), and a bounded finisher ranks each closed
  * window's counts into its top k.
  *
  * Scale shape: the stateful aggregate is the standard partial-agg
  * shuffle on (window, key); the rank pass runs over the already-
  * aggregated counts table. When the key domain itself explodes
  * (urls, ids), swap the exact count stage for the CMS sketch
  * (operators/Sketches — q108) and keep the same finisher. */
object StreamingTopK {

  /** Watermarked per-(window, key) counts. */
  def windowedKeyCounts(stream: DataFrame,
                        keyCol: String = "event_type",
                        tsCol: String = "ts",
                        windowDur: String = "1 day",
                        watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("win"),
        col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))

  /** Per-window top-k over the bounded counts table (count desc, key
    * asc — deterministic ties). */
  def topKPerWindow(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("win.start"))
      .orderBy(col("n").desc, col("key").asc)
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("win.start").as("window_start"),
        col("rank").cast("long").as("rank"), col("key"),
        col("n").cast("long").as("n"))
  }

  /** Catalyst-NATIVE session windows (`session_window` — dynamic
    * event-time gap sessions maintained by the engine's own state
    * store), the declarative twin of the custom
    * `flatMapGroupsWithState` sessionizer in [[Sessionize]]: same gap
    * rule, but merging/expiry is the engine's responsibility, which
    * at cluster scale means state-store compaction/RocksDB spilling
    * come for free. */
  def sessionWindowCounts(stream: DataFrame,
                          gap: String = "30 minutes",
                          tsCol: String = "ts",
                          keyCol: String = "user_id",
                          watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("win"),
        col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))
}
