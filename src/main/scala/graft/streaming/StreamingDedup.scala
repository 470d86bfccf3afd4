package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication with bounded state (SURVEY §2.9 extension;
  * the streaming twin of `Dedup.exact`).
  *
  * An unbounded `dropDuplicates` would grow its key store forever — at
  * pipeline scale the store IS the bottleneck. Both variants here bound
  * state with an event-time watermark, trading a window of exactness
  * for O(active-window) state:
  *
  * - [[dedupByKey]]: `dropDuplicatesWithinWatermark` — keeps a key only
  *   until the watermark passes its event time, so duplicates arriving
  *   within the watermark delay are suppressed and state is evicted
  *   after. The right tool when duplicates cluster in time (retries,
  *   replayed micro-batches, at-least-once upstreams).
  * - [[firstSeenPerKey]]: watermarked `min(ts)` per key over a window —
  *   the streaming "first occurrence wins" used to assign canonical ids
  *   incrementally.
  *
  * Exactly-once global dedup over all history needs a sink-side set
  * (the batch `Writes.insertIgnore` path); these operators are the
  * in-flight filter that keeps the sink's anti-join small.
  */
object StreamingDedup {

  /** Drop rows whose `keyCols` repeat within the watermark delay.
    * `events` must be a streaming frame with event-time column `tsCol`. */
  def dedupByKey(events: DataFrame, tsCol: String, delay: String,
                 keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** First event time seen per (key, event-time window). The window is
    * what lets the watermark evict state — a plain per-key aggregation
    * would grow forever (Spark only ages out event-time-scoped state).
    * Emits in append mode once the watermark passes a window's end. */
  def firstSeenPerKey(events: DataFrame, tsCol: String, delay: String,
                      horizon: String, keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), window(col(tsCol), horizon))
      .agg(min(col(tsCol)).as("first_seen"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("first_seen"))
}
