package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Indicators, WindowFns}
import graft.operators.EventSeries

/** Scratch A/B for the round-12 rewrites (guide §1: measure before and
  * after on the same fixtures, fresh plans per run):
  *
  *   - q15 RSI: pure-Column formula (6 sliding window aggregates + 4
  *     lags after per-occurrence extraction) vs the staged form (2
  *     sliding aggregates + row_number gate + 1 lag).
  *   - q17 Bollinger: embedded count gates (4 aggregates) vs staged
  *     shared count (3).
  *   - q18 enrichment side: row_number top-1 (sort + WindowGroupLimit
  *     ×2 + window + filter) vs single-hash-agg min_by top-1.
  *
  * Old formulations are inlined here verbatim so the comparison
  * survives the source change. SPARK_GRAFT_SCALE picks the fixture
  * (default 128× under /tmp/graft_sf128).
  */
object AbR12 {
  def main(args: Array[String]): Unit = {
    val spark = AbBench.session()
    val dir = AbBench.scaleDir()
    val events = () => Tables.events(spark, dir)
    val seriesW = WindowFns.series(col("user_id"), col("date"))
    def bars() = EventSeries.dailyBars(events())

    // --- old q15 (pure-Column rsi) ---
    def q15Old() = bars().select(col("user_id"), col("date"),
        Indicators.rsi(col("close"), seriesW, 14).as("rsi_14"))
      .withColumn("date", graft.queries.iso(col("date")))
      .orderBy(col("user_id"), col("date"))
    def q15New() = SparkEntry.queries("q15_rsi")(spark, dir)

    // --- old q17 ---
    def q17Old() = bars().select(col("user_id"), col("date"),
        Indicators.bollingerWidth(col("close"), seriesW, 20, 2.0)
          .as("bb_width_20"))
      .withColumn("date", graft.queries.iso(col("date")))
      .orderBy(col("user_id"), col("date"))
    def q17New() = SparkEntry.queries("q17_bollinger")(spark, dir)

    // --- min_by single-agg dailySentiment: A/B'd and REJECTED (two
    // 128× samples read it +5-16% slower than the WindowGroupLimit
    // row_number form the operator keeps — the struct-valued min_by
    // buffer falls off the hash-agg primitive fast path). Inlined so
    // the rejection stays reproducible. ---
    def sentimentMinBy(): DataFrame = {
      val counted = events()
        .groupBy(col("user_id"), to_date(col("ts")).as("date"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      counted
        .groupBy(col("user_id"), col("date"))
        .agg(min_by(struct(col("event_type"), col("n")),
          struct((-col("n")).as("_negn"), col("event_type").as("_t")))
          .as("_top"))
        .select(col("user_id"), col("date"),
          lower(col("_top.event_type")).as("sentiment"),
          col("_top.n").as("n_events"))
    }
    def q18MinBy() = {
      val p = EventSeries.stgDailyPrices(EventSeries.dailyBars(events()))
      p.join(broadcast(sentimentMinBy()), Seq("user_id", "date"), "left")
        .withColumn("move_category",
          Indicators.moveCategory(col("pct_change")))
        .select(col("user_id"), col("date"), col("close"),
          col("prev_close"), col("pct_change"), col("sentiment"),
          col("n_events"), col("move_category"))
        .withColumn("date", graft.queries.iso(col("date")))
        .orderBy(col("user_id"), col("date"))
    }
    def q18Kept() = SparkEntry.queries("q18_fact_sentiment")(spark, dir)

    // --- q33: the sf0.1 documents fixture is ONE single-row-group file,
    // so the MinHash kernel runs on ONE task regardless of cores (guide
    // §2.5 "input skew: one huge unsplittable file → repartition
    // immediately after the read"). A/B: kernel on the raw scan vs
    // after a round-robin repartition to session parallelism. ---
    def q33Flat() = SparkEntry.queries("q33_minhash_sigs")(spark, dir)
    def q33Repart() = {
      import graft.operators.Dedup
      val docs = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
      Dedup.minhashSignatures(docs, k = 4, n = 2)
        .orderBy(col("doc_id"))
    }

    AbBench.time("q33 flat scan", q33Flat)
    AbBench.time("q33 repartitioned", q33Repart)
    AbBench.time("q15_rsi OLD (column)", q15Old)
    AbBench.time("q15_rsi NEW (staged)", q15New)
    AbBench.time("q17_bollinger OLD", q17Old)
    AbBench.time("q17_bollinger NEW", q17New)
    AbBench.time("sentiment KEPT (row_number)",
      () => EventSeries.dailySentiment(events()))
    AbBench.time("sentiment REJECTED (min_by)", sentimentMinBy)
    AbBench.time("q18 KEPT (rn sentiment)", q18Kept)
    AbBench.time("q18 REJECTED (min_by)", q18MinBy)
    spark.stop()
  }
}
