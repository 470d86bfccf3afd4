package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsViews, EventSeries}

/** Scratch A/B (round-9 verdict item 3): q41/q44's upstream bar
  * aggregation has a combine factor of ~1 (the 128× inflation grows
  * keys ×128 at ~5 events/(user,day)), so the map-side partial
  * aggregate emits ~input-cardinality WIDER rows and the following
  * Window partitionBy(user_id) pays a SECOND exchange. Variant B
  * pre-partitions the raw events by user_id: one raw-row shuffle,
  * aggregate and window both run in that stage with no further
  * exchange and no wasted partial hash map. Times both compositions
  * (warm best-of-3) at the given inflation. Measured a WASH at 128×
  * — adjudication at AnalyticsQueries.base() and BASELINE.md round 9.
  */
object AbPartial {
  def main(args: Array[String]): Unit = {
    val spark = AbBench.session()
    val dir = AbBench.scaleDir()

    def baseA(): DataFrame = AnalyticsViews.predictionBase(
      EventSeries.dailyBars(Tables.events(spark, dir)))
    def baseB(): DataFrame = AnalyticsViews.predictionBase(
      EventSeries.dailyBars(
        Tables.events(spark, dir).repartition(col("user_id"))))

    Tables.events(spark, dir).limit(1).write.format("noop")
      .mode("overwrite").save()
    AbBench.time("q41A_current", () =>
      AnalyticsViews.accuracyByKey(baseA()).orderBy(col("user_id")))
    AbBench.time("q41B_prepart", () =>
      AnalyticsViews.accuracyByKey(baseB()).orderBy(col("user_id")))
    AbBench.time("q44A_current", () =>
      AnalyticsViews.classMetrics(baseA()).orderBy(col("class")))
    AbBench.time("q44B_prepart", () =>
      AnalyticsViews.classMetrics(baseB()).orderBy(col("class")))
    // second pass to cancel order effects
    AbBench.time("q41A_current2", () =>
      AnalyticsViews.accuracyByKey(baseA()).orderBy(col("user_id")))
    AbBench.time("q41B_prepart2", () =>
      AnalyticsViews.accuracyByKey(baseB()).orderBy(col("user_id")))
    // plan shapes: count the exchanges in each
    Seq("A" -> baseA _, "B" -> baseB _).foreach { case (l, b) =>
      val p = AnalyticsViews.accuracyByKey(b())
        .queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).size
      println(s"[ab] plan$l exchanges=$ex")
    }
    spark.stop()
  }
}
