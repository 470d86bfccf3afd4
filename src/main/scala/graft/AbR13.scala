package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Indicators, WindowFns}
import graft.operators.EventSeries

/** Scratch A/B for the round-13 rewrites (guide §1: measure before and
  * after on the same fixtures, fresh plans per run):
  *
  *   - q18 fact model: the current two-scan shape (dailyBars branch +
  *     dailySentiment branch + broadcast join) vs a FUSED single-scan
  *     shape — one per-(user, day, type) aggregate carrying both the
  *     bar partials and the type count, bars merged by same-partition
  *     window aggregates, sentiment top-1 by row_number in the same
  *     partitioning, no join at all (guide §2.4: two operations keyed
  *     the same way share one pass/exchange).
  *   - q22 insert-ignore: dedupeByKey's min(struct(values)) — a
  *     SortAggregate pair (struct buffers are not hash-aggregable) —
  *     vs a row_number()-top-1 per key over the same (values ASC)
  *     order, whose WindowGroupLimit partial prunes below the
  *     exchange (the shape that beat min_by in the r12 q18 A/B).
  *
  * SPARK_GRAFT_SCALE picks the fixture (default 128× under
  * /tmp/graft_sf128).
  */
object AbR13 {

  /** The PRE-r13 two-scan q18 formulation (dailyBars branch +
    * dailySentiment branch + broadcast join), inlined verbatim so the
    * A/B and the R13FusedSpec equivalence pin survive the operator's
    * adoption of the fused form. */
  def twoScanFct(events: DataFrame): DataFrame = {
    val p = EventSeries.stgDailyPrices(EventSeries.dailyBars(events))
    val g = EventSeries.dailySentiment(events)
    p.join(broadcast(g), Seq("user_id", "date"), "left")
      .withColumn("move_category",
        Indicators.moveCategory(col("pct_change")))
  }

  /** The fused q18 form as adopted into
    * [[EventSeries.fctPricesWithSentiment]] (kept callable here so
    * the A/B below times exactly what shipped). */
  def fusedFct(events: DataFrame): DataFrame = {
    val perUdt = events
      .groupBy(col("user_id"), to_date(col("ts")).as("date"),
        col("event_type"))
      .agg(
        min(col("event_id")).as("open_eid"),
        round(min_by(col("value"), col("event_id")), 4).as("open_t"),
        round(max(col("value")), 4).as("high_t"),
        round(min(col("value")), 4).as("low_t"),
        max(col("event_id")).as("close_eid"),
        round(max_by(col("value"), col("event_id")), 4).as("close_t"),
        count(lit(1)).as("n"))
    val wd = Window.partitionBy(col("user_id"), col("date"))
    val wTop = Window.partitionBy(col("user_id"), col("date"))
      .orderBy(col("n").desc, col("event_type").asc)
    val merged = perUdt
      .withColumn("open", min(struct(col("open_eid"), col("open_t")))
        .over(wd).getField("open_t"))
      .withColumn("high", max(col("high_t")).over(wd))
      .withColumn("low", min(col("low_t")).over(wd))
      .withColumn("close", max(struct(col("close_eid"), col("close_t")))
        .over(wd).getField("close_t"))
      .withColumn("volume", sum(col("n")).over(wd))
      .withColumn("_rn", row_number().over(wTop))
      .where(col("_rn") === 1)
      .select(col("user_id"), col("date"), col("open"), col("high"),
        col("low"), col("close"), col("volume"),
        lower(col("event_type")).as("sentiment"),
        col("n").as("n_events"))
    val w = WindowFns.series(col("user_id"), col("date"))
    merged
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("price_change",
        round(col("close") - col("prev_close"), 4))
      .withColumn("pct_change",
        round((col("close") - col("prev_close")) /
          nullif(col("prev_close"), lit(0)) * 100, 4))
      .withColumn("move_category",
        Indicators.moveCategory(col("pct_change")))
      .select(col("user_id"), col("date"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("prev_close"),
        col("price_change"), col("pct_change"), col("sentiment"),
        col("n_events"), col("move_category"))
  }

  /** The PRE-r13 min(struct)-based in-batch dedup (SortAggregate
    * pair), inlined verbatim so the A/B and the WritesSpec
    * equivalence pin survive Writes.dedupeByKey's adoption of the
    * row_number top-1 form. */
  def dedupeMinStruct(incoming: DataFrame, keys: Seq[String],
                      targetCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val valueCols = incoming.columns.filterNot(keys.contains)
    incoming
      .groupBy(keyCols: _*)
      .agg(min(struct(valueCols.map(col).toIndexedSeq: _*)).as("_v"))
      .select(keyCols ++ valueCols.map(c => col(s"_v.$c").as(c)): _*)
      .select(targetCols.map(col).toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val spark = AbBench.session()
    val dir = AbBench.scaleDir()
    val events = () => Tables.events(spark, dir)

    def q18TwoScan() = twoScanFct(events())
      .select(col("user_id"), col("date"), col("close"),
        col("prev_close"), col("pct_change"), col("sentiment"),
        col("n_events"), col("move_category"))
      .withColumn("date", graft.queries.iso(col("date")))
      .orderBy(col("user_id"), col("date"))
    def q18Fused() = fusedFct(events())
      .select(col("user_id"), col("date"), col("close"),
        col("prev_close"), col("pct_change"), col("sentiment"),
        col("n_events"), col("move_category"))
      .withColumn("date", graft.queries.iso(col("date")))
      .orderBy(col("user_id"), col("date"))

    def q22TopRow() = SparkEntry.queries("q22_insert_ignore")(spark, dir)
    def q22MinStruct() = {
      val b = EventSeries.dailyBars(events())
      val existing = b.filter(col("date") <= lit("2024-01-15").cast("date"))
      val incoming = b.filter(col("date").between(
          lit("2024-01-10").cast("date"), lit("2024-01-20").cast("date")))
        .withColumn("volume", col("volume") + 1000L)
      val deduped = dedupeMinStruct(incoming, Seq("user_id", "date"),
        existing.columns.toIndexedSeq)
      existing.unionByName(
          deduped.join(existing.select(col("user_id"), col("date"))
            .distinct(), Seq("user_id", "date"), "left_anti"))
        .withColumn("date", graft.queries.iso(col("date")))
        .orderBy(col("user_id"), col("date"))
    }

    AbBench.time("q18 OLD (2-scan join)", q18TwoScan)
    AbBench.time("q18 FUSED (1-scan windows)", q18Fused)
    AbBench.time("q22 OLD (min struct)", q22MinStruct)
    AbBench.time("q22 TOP-ROW (row_number)", q22TopRow)
    spark.stop()
  }
}
