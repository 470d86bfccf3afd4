package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor — the streaming twin of
  * [[graft.operators.Drift.psi]]: a score stream is binned against a
  * STATIC reference histogram (fitted once from a batch frame, bin
  * edges shipped as plan literals), watermarked event-time windows
  * accumulate per-bin counts, and each closed window scores a PSI
  * against the reference with the SAME smoothing + exact-bridge
  * arithmetic as the batch operator.
  *
  * Scale shape: the streaming aggregation state is (windows × bins)
  * rows — constant per window regardless of stream volume; the PSI
  * pass runs over that bounded table. Stream values outside the
  * reference range clamp into the edge bins (drift INTO the tails is
  * exactly what the monitor must see). */
object DriftMonitor {

  /** Fitted reference: equal-width bin edges over the batch extent and
    * the per-bin counts (bounded — safe to hold on the driver and ship
    * as literals). */
  case class Reference(vmin: Double, vmax: Double, bins: Int,
                       counts: Map[Long, Long])

  def fitReference(df: DataFrame, valueCol: String = "score",
                   bins: Int = 10): Reference = {
    require(bins > 0, "bins must be positive")
    val ext = df.agg(min(col(valueCol)).cast("double"),
      max(col(valueCol)).cast("double")).head()
    val (vmin, vmax) = (ext.getDouble(0), ext.getDouble(1))
    val counts = df
      .select(binCol(col(valueCol), vmin, vmax, bins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Reference(vmin, vmax, bins, counts)
  }

  /** Clamped equal-width bin (identical arithmetic to Drift.psi's,
    * plus a low-side clamp for out-of-reference stream values). */
  private def binCol(v: Column, vmin: Double, vmax: Double,
                     bins: Int): Column =
    if (vmax == vmin) lit(0L)
    else least(greatest(floor(((v - vmin) * bins) / (vmax - vmin)),
      lit(0.0)), lit(bins - 1.0)).cast("long")

  /** Watermarked per-window bin counts for the stream — the ONLY
    * stateful stage; state is bins rows per open window. */
  def windowedBinCounts(stream: DataFrame, ref: Reference,
                        valueCol: String = "score",
                        tsCol: String = "ts",
                        windowDur: String = "1 day",
                        watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("win"),
        binCol(col(valueCol), ref.vmin, ref.vmax, ref.bins).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"), col("bin"), col("n"))

  /** PSI per window from the materialized windowed counts (a batch
    * read of the sink): reference counts broadcast, +1 smoothing on
    * both sides, the Drift.psi scaled-8dp/6dp-micro-nat bridges —
    * a window whose counts EQUAL the reference reads exactly 0. */
  def psiPerWindow(winCounts: DataFrame, ref: Reference): DataFrame = {
    val spark = winCounts.sparkSession
    import spark.implicits._
    val refDf = broadcast((0L until ref.bins.toLong).map(b =>
      (b, ref.counts.getOrElse(b, 0L) + 1L)).toDF("bin", "ce"))
    val grid = winCounts.select(col("window_start")).distinct()
      .crossJoin(refDf)
    // rename the probe side: grid descends from winCounts, so a plain
    // column join would self-reference
    val probe = winCounts.select(col("window_start").as("_ws"),
      col("bin").as("_bin"), col("n"))
    val joined = grid
      .join(probe, col("window_start") === col("_ws")
        && col("bin") === col("_bin"), "left")
      .select(col("window_start"), col("bin"), col("ce"),
        (coalesce(col("n"), lit(0L)) + 1).as("ca"))
    val w = Window.partitionBy(col("window_start"))
    val tot = joined
      .withColumn("ne", sum(col("ce")).over(w))
      .withColumn("na", sum(col("ca")).over(w))
    val pe8 = graft.functions.ExactRound.scaled(col("ce"), col("ne"), 8)
    val pa8 = graft.functions.ExactRound.scaled(col("ca"), col("na"), 8)
    val ln6 = round(log((col("ca") * col("ne")).cast("double")
      / (col("ce") * col("na"))), 6).cast("decimal(10,6)")
    val term = ((pa8 - pe8).cast("decimal(12,0)") * ln6)
      .cast("decimal(28,6)")
    val agg = tot.withColumn("_t", term)
      .groupBy(col("window_start"))
      .agg((max(col("na")) - ref.bins).as("n_scored"),
        sum(col("_t")).as("_s"))
    val su = (col("_s") * 1000000).cast("long")
    val mag = call_function("div", abs(su) * 2 + lit(10000000000L),
      lit(20000000000L))
    agg.select(col("window_start"), col("n_scored"),
      ((when(su < 0, -mag).otherwise(mag)).cast("double") / 10000)
        .as("psi"))
  }
}
