package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins (SURVEY §2.9 extension — the
  * reference has no streams; this is the standard Spark shape for
  * joining two live feeds, e.g. raw events against asynchronously
  * arriving LLM enrichments, without landing either first).
  */
object StreamJoin {

  /** Interval join: pair each event with same-key enrichment rows that
    * land within `[ts, ts + delay]`.
    *
    * Both inputs are watermarked and the join condition bounds event
    * time on BOTH sides — the two requirements that let the state store
    * evict: once the enrichment watermark passes `ts + delay`, an event
    * row can never match again and its state is dropped. Without the
    * range condition a stream-stream join keys state forever (the
    * unbounded-state hazard); with it, state size is O(rows per delay
    * window), independent of stream length — the property that holds at
    * any scale.
    *
    * The enrichment side arrives pre-renamed (`e_user_id`, `e_ts`,
    * payload…) so the equi+range condition is unambiguous.
    */
  def intervalJoin(events: DataFrame, enrichments: DataFrame,
                   delay: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(enrichments.withWatermark("e_ts", watermark),
        expr(s"user_id = e_user_id AND e_ts >= ts AND " +
          s"e_ts <= ts + interval $delay"),
        "inner")

  /** The batch twin of [[intervalJoin]] — same algebra on static frames;
    * the equivalence (stream result == batch result when nothing is
    * late) is the correctness contract, pinned in StreamJoinSpec. */
  def intervalJoinBatch(events: DataFrame, enrichments: DataFrame,
                        delay: String = "30 minutes"): DataFrame =
    events.join(enrichments,
      expr(s"user_id = e_user_id AND e_ts >= ts AND " +
        s"e_ts <= ts + interval $delay"),
      "inner")
}
